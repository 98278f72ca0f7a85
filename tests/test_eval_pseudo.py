"""evaluate_dataset + generate_pseudo_labels end-to-end on the synthetic
dataset with a tiny real model; checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset
from uemda_tpu.infer.evaluate import evaluate_dataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
from uemda_tpu.models.config import PPMConfig
from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint

C = 6
MEAN = (128.0, 128.0, 128.0)
STD = (64.0, 64.0, 64.0)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    img_dir, ann_dir = make_synthetic_dataset(str(root), IsprsDA, n_train=5, n_val=3, hw=64)
    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet18", output_stride=16),
        multi_layer=True,
        use_ppm=False,
        ppm=PPMConfig(num_classes=C, fc_dim=512),
        inchannels=512,
        num_classes=C,
        is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.ones((1, 32, 32, 3)), train=False
    )
    return str(root), model, variables


def test_evaluate_dataset(setup, tmp_path):
    root, model, variables = setup
    import os

    ds = SegDataset(
        IsprsDA, os.path.join(root, "img_dir", "val"),
        os.path.join(root, "ann_dir", "val"),
    )
    summary, miou = evaluate_dataset(
        model, variables, ds, MEAN, STD, tile=(32, 32), batch_size=2,
        vis_dir=str(tmp_path / "vis"), compute_dtype="float32",
    )
    assert 0.0 <= miou <= 1.0
    assert len(summary["iou"]) == C - 1  # BgClutter dropped
    assert (tmp_path / "vis" / "tile_000.png").exists()


def test_generate_pseudo_labels_and_ssl_dataset(setup, tmp_path):
    root, model, variables = setup
    import os

    img_dir = os.path.join(root, "img_dir", "train")
    ds = SegDataset(IsprsDA, img_dir, None, label_type="none")
    out_dir = str(tmp_path / "pseudo")
    probs = generate_pseudo_labels(
        model, variables, ds, MEAN, STD, out_dir=out_dir, tile=(32, 32),
        tta=True, batch_size=2, color_dir=str(tmp_path / "color"),
        compute_dtype="float32",
    )
    assert len(probs) == 5
    p = next(iter(probs.values()))
    assert p.shape == (64, 64, C)
    np.testing.assert_allclose(p.sum(-1), np.ones((64, 64)), atol=2e-2)
    # stage-3 dataset reads the saved probs + superpixels
    ds3 = SegDataset(IsprsDA, img_dir, out_dir, label_type="prob", read_sup=True)
    item = ds3.item(0)
    assert item["prob"].shape == (64, 64, C)
    assert item["sup"].shape == (64, 64)


def test_checkpoint_roundtrip(setup, tmp_path):
    _, model, variables = setup
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, variables)
    zeros = jax.tree.map(jnp.zeros_like, variables)
    restored = load_checkpoint(path, zeros)
    l0 = jax.tree.leaves(variables)[0]
    r0 = jax.tree.leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))


def test_evaluate_on_mesh_matches_single_device(setup):
    root, model, variables = setup
    import os

    from uemda_tpu.parallel import make_mesh

    ds = SegDataset(
        IsprsDA, os.path.join(root, "img_dir", "val"),
        os.path.join(root, "ann_dir", "val"),
    )
    _, miou1 = evaluate_dataset(
        model, variables, ds, MEAN, STD, tile=(32, 32), batch_size=8,
        compute_dtype="float32",
    )
    mesh = make_mesh(8)
    _, miou8 = evaluate_dataset(
        model, variables, ds, MEAN, STD, tile=(32, 32), batch_size=8,
        compute_dtype="float32", mesh=mesh,
    )
    assert abs(miou1 - miou8) < 1e-6, (miou1, miou8)


def test_pseudo_gen_on_mesh(setup, tmp_path):
    root, model, variables = setup
    import os

    from uemda_tpu.parallel import make_mesh

    ds = SegDataset(
        IsprsDA, os.path.join(root, "img_dir", "train"), None, label_type="none"
    )
    probs = generate_pseudo_labels(
        model, variables, ds, MEAN, STD, tile=(32, 32), tta=False,
        batch_size=8, compute_dtype="float32", mesh=make_mesh(8),
    )
    assert len(probs) == 5
    p = next(iter(probs.values()))
    np.testing.assert_allclose(p.sum(-1), np.ones(p.shape[:2]), atol=2e-2)


def test_pseudo_gen_fastpath_matches_standard(setup):
    """--gen-fastpath: the folded sweep must reproduce the standard pass
    (f32 exact up to reassociation), including through a mesh."""
    root, model, variables = setup
    import os

    from uemda_tpu.parallel import make_mesh

    ds = SegDataset(
        IsprsDA, os.path.join(root, "img_dir", "train"), None, label_type="none"
    )
    kw = dict(tile=(32, 32), tta=False, batch_size=8, compute_dtype="float32")
    ref = generate_pseudo_labels(model, variables, ds, MEAN, STD, **kw)
    fast = generate_pseudo_labels(
        model, variables, ds, MEAN, STD, fastpath=True, **kw
    )
    fast_mesh = generate_pseudo_labels(
        model, variables, ds, MEAN, STD, fastpath=True, mesh=make_mesh(8), **kw
    )
    for k in ref:
        np.testing.assert_allclose(fast[k], ref[k], atol=2e-3)
        np.testing.assert_allclose(fast_mesh[k], ref[k], atol=2e-3)


def test_analyze_pseudo_labels(setup, tmp_path):
    """Perfect pseudo labels -> accuracy 1.0; coverage reflects mining."""
    import os

    from uemda_tpu.datasets.io import save_prob
    from uemda_tpu.infer.analysis import analyze_pseudo_labels

    root, _, _ = setup
    label_dir = os.path.join(root, "ann_dir", "val")
    img_dir = os.path.join(root, "img_dir", "val")
    ds = SegDataset(IsprsDA, img_dir, label_dir)
    pseudo_dir = tmp_path / "probs"
    pseudo_dir.mkdir()
    for i in range(len(ds)):
        gt = ds.item(i)["label"]
        onehot = np.eye(6, dtype=np.float32)[gt]  # confident & correct
        probs = onehot * 0.94 + 0.01
        save_prob(str(pseudo_dir / ds.filename(i)), probs)
    report = analyze_pseudo_labels(label_dir, str(pseudo_dir), IsprsDA)
    assert report["accuracy"] > 0.99
    assert report["coverage"] > 0.99
    assert len(report["bin_count"]) == 10
