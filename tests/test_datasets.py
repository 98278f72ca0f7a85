"""Data layer: synthetic dataset round-trip, batch iterators, on-device
augmentation semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uemda_tpu.datasets.augment import augment_batch, normalize
from uemda_tpu.datasets.base import SegDataset, infinite_batches, sequential_batches
from uemda_tpu.datasets.io import save_prob
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    img_dir, ann_dir = make_synthetic_dataset(str(root), IsprsDA, n_train=6, n_val=2, hw=64)
    return str(root), img_dir, ann_dir


def test_dataset_id_labels_and_sup(synth):
    root, img_dir, ann_dir = synth
    ds = SegDataset(IsprsDA, img_dir, ann_dir, label_type="id", read_sup=True)
    assert len(ds) == 6
    item = ds.item(0)
    assert item["image"].shape == (64, 64, 3)
    assert item["label"].shape == (64, 64)
    assert item["label"].min() >= 0 and item["label"].max() < 6
    assert item["sup"].max() == 16  # boundary id for 64² / cell 16

    batch = ds.batch([0, 1])
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["sup"].shape == (2, 64, 64)


def test_infinite_batches_cycles_and_drops(synth):
    _, img_dir, ann_dir = synth
    ds = SegDataset(IsprsDA, img_dir, ann_dir)
    it = infinite_batches(ds, batch_size=4, seed=1)
    b1 = next(it)
    b2 = next(it)
    assert b1["image"].shape[0] == 4 and b2["image"].shape[0] == 4
    names = [idx for idx, _ in sequential_batches(ds, 2)]
    assert names == [[0, 1], [2, 3], [4, 5]]


def test_prob_label_roundtrip(synth, tmp_path):
    _, img_dir, _ = synth
    prob_dir = tmp_path / "probs"
    prob_dir.mkdir()
    ds0 = SegDataset(IsprsDA, img_dir, None, label_type="none")
    rng = np.random.default_rng(0)
    for i in range(len(ds0)):
        p = rng.random((64, 64, 6)).astype(np.float32)
        save_prob(str(prob_dir / ds0.filename(i)), p)
    ds = SegDataset(IsprsDA, img_dir, str(prob_dir), label_type="prob")
    item = ds.item(0)
    assert item["prob"].shape == (64, 64, 6)
    # .pt cross-compat
    torch.save(torch.zeros(6, 64, 64), str(prob_dir / "x.pt"))
    from uemda_tpu.datasets.io import read_prob

    assert read_prob(str(prob_dir / "x")).shape == (64, 64, 6)


def test_normalize_matches_reference_semantics():
    img = np.full((2, 4, 4, 3), 128.0, np.float32)
    out = np.asarray(normalize(jnp.asarray(img), (120.0, 80.0, 80.0), (50.0, 40.0, 40.0)))
    np.testing.assert_allclose(out[0, 0, 0], [(128 - 120) / 50, 48 / 40, 48 / 40], rtol=1e-6)
    out_c = np.asarray(
        normalize(jnp.asarray(img), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0), clamp=True)
    )
    assert out_c.max() == 1.0


def test_augment_batch_joint_and_shapes():
    rng = np.random.default_rng(0)
    b = {
        "image": rng.random((4, 64, 64, 3)).astype(np.float32) * 255,
        "label": rng.integers(0, 6, size=(4, 64, 64)).astype(np.int32),
        "sup": rng.integers(0, 16, size=(4, 64, 64)).astype(np.int32),
    }
    out = augment_batch(
        jax.random.key(0),
        {k: jnp.asarray(v) for k, v in b.items()},
        (32, 32),
        mean=(0, 0, 0),
        std=(255, 255, 255),
        mode="oneof",
    )
    assert out["image"].shape == (4, 32, 32, 3)
    assert out["label"].shape == (4, 32, 32)
    assert float(out["image"].max()) <= 1.0 + 1e-6


def test_augment_is_joint_image_label():
    """Label must undergo the same geometric transform as the image."""
    # encode position in both image and label, many keys -> all transforms hit
    hw = 8
    ramp = np.arange(hw * hw, dtype=np.float32).reshape(hw, hw)
    img = np.stack([ramp] * 3, -1)[None].repeat(16, 0)
    lbl = ramp[None].astype(np.int32).repeat(16, 0)
    out = augment_batch(
        jax.random.key(3),
        {"image": jnp.asarray(img), "label": jnp.asarray(lbl)},
        (hw, hw),
        mean=(0, 0, 0),
        std=(1, 1, 1),
        mode="compose",
    )
    np.testing.assert_allclose(
        np.asarray(out["image"][..., 0]), np.asarray(out["label"]).astype(np.float32)
    )


def test_kfold_indices_partition():
    from uemda_tpu.datasets.base import kfold_indices

    train, val = kfold_indices(20, k=5, fold=2)
    assert len(train) == 16 and len(val) == 4
    assert set(train) | set(val) == set(range(20))
    assert set(train) & set(val) == set()
    # fold=-1 disables CV (all train), like the reference configs
    train, val = kfold_indices(10, fold=-1)
    assert len(train) == 10 and len(val) == 0


def test_prefetch_iterator_order_and_termination():
    from uemda_tpu.datasets.prefetch import prefetch

    out = list(prefetch(iter(range(10)), depth=3))
    assert out == list(range(10))
    # infinite source: pulls keep working
    import itertools

    it = prefetch(itertools.count(), depth=2)
    assert [next(it) for _ in range(5)] == [0, 1, 2, 3, 4]


def test_infinite_batches_skip_fast_forward(synth):
    """skip_batches=k replays exactly the stream an uninterrupted run saw
    from batch k (resume data-stream parity; code-review finding)."""
    import itertools

    _, img_dir, ann_dir = synth
    ds = SegDataset(IsprsDA, img_dir, ann_dir)
    full = list(itertools.islice(infinite_batches(ds, 2, seed=5), 9))
    skipped = list(
        itertools.islice(infinite_batches(ds, 2, seed=5, skip_batches=4), 5)
    )
    for a, b in zip(full[4:], skipped):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_sequential_batches_decode_pool_matches_serial(synth):
    """--decode-workers path (VERDICT r2 item 7): the thread-pool decode
    yields byte-identical batches in the same order as the serial path."""
    root, img_dir, ann_dir = synth
    ds = SegDataset(IsprsDA, img_dir, ann_dir)
    serial = list(sequential_batches(ds, 4))
    pooled = list(sequential_batches(ds, 4, decode_workers=3))
    assert len(serial) == len(pooled)
    for (i1, b1), (i2, b2) in zip(serial, pooled):
        assert i1 == i2 and set(b1) == set(b2)
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])


def test_synthetic_hard_shift_knobs(tmp_path):
    """noise / palette_mix / pad_border generator knobs (ablation + LoveDA
    semantics): padding reads back as ignore, harder target renders differ."""
    from uemda_tpu.datasets.meta import LoveDA

    make_synthetic_dataset(str(tmp_path / "a"), LoveDA, n_train=2, n_val=1,
                           hw=64, seed=3, pad_border=8)
    ds = SegDataset(LoveDA, str(tmp_path / "a" / "img_dir" / "train"),
                    str(tmp_path / "a" / "ann_dir" / "train"))
    item = ds.item(0)  # even index -> carries the padding border
    assert (item["label"][:8, :] == -1).all()
    assert (item["image"][:8, :] == 0).all()
    assert item["label"].max() <= 6 and item["label"].min() >= -1

    make_synthetic_dataset(str(tmp_path / "b"), IsprsDA, n_train=1, n_val=1,
                           hw=64, seed=3)
    make_synthetic_dataset(str(tmp_path / "c"), IsprsDA, n_train=1, n_val=1,
                           hw=64, seed=3, noise=45.0, palette_mix=0.25)
    clean = SegDataset(IsprsDA, str(tmp_path / "b" / "img_dir" / "train"),
                       str(tmp_path / "b" / "ann_dir" / "train")).item(0)
    hard = SegDataset(IsprsDA, str(tmp_path / "c" / "img_dir" / "train"),
                      str(tmp_path / "c" / "ann_dir" / "train")).item(0)
    np.testing.assert_array_equal(clean["label"], hard["label"])  # same layout
    # the harder render is a genuinely different image with more variance
    assert float(np.abs(clean["image"].astype(np.int32)
                        - hard["image"].astype(np.int32)).mean()) > 5.0
