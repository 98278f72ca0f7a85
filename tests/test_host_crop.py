"""Host-side pre-crop (`infinite_batches(host_crop=...)`): ships crop-sized
samples instead of full tiles (4× less host→device traffic at the LoveDA
1024²-tile geometry, 16× for stage-3 fp16 prob labels). The jitted step is
untouched because the device random crop degenerates to the identity on an
already-crop-sized batch — asserted here."""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.datasets.augment import _rand_crop_single
from uemda_tpu.datasets.base import SegDataset, infinite_batches
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset

HW, CROP = 48, 32


def _ds(tmp_path):
    root = str(tmp_path)
    make_synthetic_dataset(f"{root}/d", IsprsDA, n_train=3, n_val=1, hw=HW, seed=0)
    return SegDataset(
        IsprsDA, f"{root}/d/img_dir/train", f"{root}/d/ann_dir/train"
    )


def _take(it, n):
    return list(itertools.islice(it, n))


def test_host_crop_shapes_and_content(tmp_path):
    ds = _ds(tmp_path)
    batches = _take(
        infinite_batches(ds, 2, seed=5, host_crop=(CROP, CROP)), 3
    )
    for b in batches:
        assert b["image"].shape == (2, CROP, CROP, 3)
        assert b["label"].shape == (2, CROP, CROP)
    # every cropped sample is a contiguous window of SOME dataset item, with
    # image and label cut at the SAME offset (joint crop)
    full = [ds.item(i) for i in range(len(ds))]
    for b in batches:
        for j in range(2):
            found = False
            for it in full:
                for top in range(HW - CROP + 1):
                    for left in range(HW - CROP + 1):
                        if np.array_equal(
                            it["image"][top:top + CROP, left:left + CROP],
                            b["image"][j],
                        ):
                            assert np.array_equal(
                                it["label"][top:top + CROP, left:left + CROP],
                                b["label"][j],
                            )
                            found = True
            assert found


def test_host_crop_resume_replay(tmp_path):
    ds = _ds(tmp_path)
    ref = _take(infinite_batches(ds, 2, seed=7, host_crop=(CROP, CROP)), 6)
    resumed = _take(
        infinite_batches(ds, 2, seed=7, host_crop=(CROP, CROP), skip_batches=4),
        2,
    )
    for a, b in zip(ref[4:], resumed):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_host_crop_process_shard_rows_match_global(tmp_path):
    ds = _ds(tmp_path)
    glob = _take(infinite_batches(ds, 2, seed=3, host_crop=(CROP, CROP)), 4)
    row0 = _take(
        infinite_batches(ds, 2, seed=3, host_crop=(CROP, CROP),
                         process_shard=(0, 1)), 4
    )
    row1 = _take(
        infinite_batches(ds, 2, seed=3, host_crop=(CROP, CROP),
                         process_shard=(1, 1)), 4
    )
    for g, a, b in zip(glob, row0, row1):
        for k in g:
            np.testing.assert_array_equal(g[k][:1], a[k])
            np.testing.assert_array_equal(g[k][1:], b[k])


def test_device_crop_is_identity_on_cropped_batch():
    rng = np.random.default_rng(0)
    arrs = {
        "image": jnp.asarray(rng.integers(0, 255, (CROP, CROP, 3)), jnp.uint8),
        "label": jnp.asarray(rng.integers(-1, 5, (CROP, CROP)), jnp.int32),
    }
    for s in range(4):
        out = _rand_crop_single(jax.random.key(s), arrs, (CROP, CROP))
        for k in arrs:
            np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(arrs[k]))


def test_host_crop_rejects_samples_smaller_than_crop(tmp_path):
    """A tile smaller than the crop must fail loudly with the file named
    (ADVICE r3: the old silent pass-through produced a ragged np.stack or a
    later device dynamic_slice error)."""
    import pytest

    ds = _ds(tmp_path)
    it = infinite_batches(ds, 2, seed=1, host_crop=(HW + 16, HW + 16))
    with pytest.raises(ValueError, match="smaller than the crop"):
        next(it)
