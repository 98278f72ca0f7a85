"""End-to-end 3-stage pipeline on a tiny synthetic pair (CPU, tiny model):
train_src -> init_prototypes -> train_align_uem -> train_ssl_uem via the
library API, asserting state hand-off, checkpoint files, pseudo-label
artifacts and finite losses across stages."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uemda_tpu.alignment.prototypes import init_avg
from uemda_tpu.config import PairConfig, SplitConfig
from uemda_tpu.datasets.base import SegDataset, infinite_batches
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from uemda_tpu.train.loop import (
    build_model,
    build_state,
    default_hparams,
    init_variables,
    variables_of,
)
from uemda_tpu.train.steps import (
    make_align_step,
    make_init_proto_step,
    make_src_step,
    make_ssl_step,
)

HW = 32


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe"))
    make_synthetic_dataset(f"{root}/src", IsprsDA, n_train=4, n_val=1, hw=HW, seed=0)
    make_synthetic_dataset(
        f"{root}/tgt", IsprsDA, n_train=4, n_val=1, hw=HW, seed=1, domain_shift=10.0
    )
    m, s = (128.0,) * 3, (64.0,) * 3
    return PairConfig(
        name="pipe",
        datasets="IsprsDA",
        target_set="T",
        source=SplitConfig((f"{root}/src/img_dir/train",), (f"{root}/src/ann_dir/train",), m, s, 2),
        target=SplitConfig((f"{root}/tgt/img_dir/train",), (f"{root}/tgt/ann_dir/train",), m, s, 2),
        val=SplitConfig((f"{root}/tgt/img_dir/val",), (f"{root}/tgt/ann_dir/val",), m, s, 1),
        test=SplitConfig((f"{root}/tgt/img_dir/val",), (f"{root}/tgt/ann_dir/val",), m, s, 1),
        snapshot_dir=f"{root}/log",
        model="resnet18",
        crop=(HW, HW),
    )


def test_loveda_geometry_pipeline(tmp_path):
    """The 2urban/2rural semantics at a scaled-down LoveDA geometry
    (VERDICT r2 item 1's CPU proxy; the real-chip record is
    runs/loveda_synth.sh): 7 classes, label offset -1 with raw-0 padding
    borders (loveda.py:17-46), images LARGER than the crop (128^2 -> 64
    random crops, like 1024^2 -> 512), superpixel ids numbered over the
    FULL image (> the crop-sized id bound — regression for the
    _max_segments_for fix), and 3x3-window slide + TTA pseudo-generation
    (tools.py:61-97), then a UVEM+refine SSL step on the prob labels."""
    from uemda_tpu.datasets.meta import LoveDA
    from uemda_tpu.infer.evaluate import evaluate_dataset
    from uemda_tpu.ops.labels import downscale_label

    HW2, CROP = 128, 64
    root = str(tmp_path)
    make_synthetic_dataset(f"{root}/tgt", LoveDA, n_train=2, n_val=2, hw=HW2,
                           seed=1, pad_border=16)
    m, s = (128.0,) * 3, (64.0,) * 3
    cfg = PairConfig(
        name="loveda_geom", datasets="LoveDA", target_set="T",
        source=SplitConfig((f"{root}/tgt/img_dir/train",),
                           (f"{root}/tgt/ann_dir/train",), m, s, 2),
        target=SplitConfig((f"{root}/tgt/img_dir/train",),
                           (f"{root}/tgt/ann_dir/train",), m, s, 2),
        val=SplitConfig((f"{root}/tgt/img_dir/val",),
                        (f"{root}/tgt/ann_dir/val",), m, s, 2),
        test=SplitConfig((f"{root}/tgt/img_dir/val",),
                         (f"{root}/tgt/ann_dir/val",), m, s, 2),
        snapshot_dir=f"{root}/log", model="resnet18", crop=(CROP, CROP),
    )
    assert cfg.class_num == 7 and cfg.meta.offset == -1

    # raw-0 padding border reads back as ignore (-1); sup ids exceed the
    # crop-sized bound ((128/16)^2 = 64 > (64/16)^2 + shrink id)
    ds = SegDataset(cfg.meta, list(cfg.source.image_dir),
                    list(cfg.source.mask_dir)[0], read_sup=True)
    item = ds.item(0)
    assert item["label"].min() == -1 and item["label"].max() <= 6
    assert int(item["sup"].max()) >= (HW2 // 16) ** 2
    hp = default_hparams(cfg, refine=True, refine_mode="all",
                         target_loss="uvem", compute_dtype="float32")
    assert hp.max_segments >= (HW2 // 16) ** 2 + 1  # meta.size-based bound

    model = build_model(cfg)
    variables = init_variables(model, cfg)
    fc = model.config.inchannels

    # pseudo-gen: 128^2 images, 64 tile -> 3x3 slide grid, 8-view TTA
    pseudo_dir = str(tmp_path / "pseudo")
    gen_ds = SegDataset(cfg.meta, list(cfg.target.image_dir), None,
                        label_type="none")
    generate_pseudo_labels(
        model, variables, gen_ds, cfg.target.mean, cfg.target.std,
        out_dir=pseudo_dir, tile=cfg.crop, tta=True, batch_size=2,
        compute_dtype="float32",
    )
    probs = np.load(os.path.join(pseudo_dir, sorted(os.listdir(pseudo_dir))[0]))
    assert probs.shape == (HW2, HW2, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)

    # one SSL step at the full semantics: prob labels + sup + 64 crops out
    # of the 128^2 arrays, UVEM target loss, label refinement
    protos = np.random.default_rng(0).normal(size=(7, fc)).astype(np.float32)
    state = build_state(variables, cfg, 2, prototypes=jnp.asarray(protos),
                        feat_channels=fc)
    step3 = make_ssl_step(model, hp)
    src_it = infinite_batches(
        SegDataset(cfg.meta, list(cfg.source.image_dir),
                   list(cfg.source.mask_dir)[0]), 2)
    tgt_it = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), pseudo_dir,
                   label_type="prob", read_sup=True), 2)
    bs = next(src_it)
    assert bs["image"].shape[1:3] == (HW2, HW2)  # crop happens in-step
    state, metrics = step3(state, bs, next(tgt_it), jax.random.key(0))
    assert np.isfinite(float(metrics["loss_source"]))
    assert np.isfinite(float(metrics["loss_target"]))

    # eval: 3x3-window slide over the padded val tiles, ignore=-1 dropped
    summary, miou = evaluate_dataset(
        model, variables_of(state), SegDataset(cfg.meta,
                                               list(cfg.val.image_dir),
                                               list(cfg.val.mask_dir)[0]),
        cfg.val.mean, cfg.val.std, tile=cfg.crop, batch_size=2,
        compute_dtype="float32",
    )
    assert 0.0 <= miou <= 1.0 and len(summary["iou"]) == 7

    # DownscaleLabel at offset -1 keeps ignore out of the 7-class one-hots
    lab = jnp.asarray(item["label"])[None]
    small = downscale_label(lab, scale_factor=8, num_classes=7,
                            ignore_label=-1)
    assert int(small.min()) >= -1 and int(small.max()) <= 6


def test_three_stage_pipeline(cfg, tmp_path):
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    fc = model.config.inchannels
    hp = default_hparams(cfg, align_domain=True, compute_dtype="float32",
                         max_segments=(HW // 16) ** 2 + 8)

    # ---- stage 1 ----
    step1 = make_src_step(model, hp)
    state = build_state(variables, cfg, 4, feat_channels=fc)
    src_it = infinite_batches(
        SegDataset(cfg.meta, list(cfg.source.image_dir), list(cfg.source.mask_dir)[0]),
        2,
    )
    tgt_plain = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), None, label_type="none"), 2
    )
    for i in range(3):
        state, m = step1(state, next(src_it), {"image": jnp.asarray(next(tgt_plain)["image"])}, jax.random.key(i))
        assert np.isfinite(float(m["loss"]))
    ckpt1 = str(tmp_path / "stage1.msgpack")
    save_checkpoint(ckpt1, variables_of(state))

    # ---- init prototypes ----
    stepP = make_init_proto_step(model, hp)
    state = stepP(state, next(src_it), jax.random.key(10))
    protos = np.asarray(init_avg(state.aligner).prototypes)
    assert np.isfinite(protos).all() and (np.abs(protos).sum() > 0)

    # ---- stage 2 ----
    variables2 = load_checkpoint(ckpt1, variables_of(state))
    state2 = build_state(variables2, cfg, 4, prototypes=jnp.asarray(protos),
                         feat_channels=fc)
    step2 = make_align_step(model, hp)
    tgt_sup = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), None,
                   label_type="none", read_sup=True), 2,
    )
    for i in range(2):
        state2, m = step2(state2, next(src_it), next(tgt_sup), jax.random.key(20 + i))
        assert np.isfinite(float(m["loss_align"]))

    # ---- pseudo gen + stage 3 ----
    pseudo_dir = str(tmp_path / "pseudo")
    gen_ds = SegDataset(cfg.meta, list(cfg.target.image_dir), None, label_type="none")
    generate_pseudo_labels(
        model, variables_of(state2), gen_ds, cfg.target.mean, cfg.target.std,
        out_dir=pseudo_dir, tile=cfg.crop, tta=True, batch_size=2,
        compute_dtype="float32",
    )
    assert len(os.listdir(pseudo_dir)) == 4
    step3 = make_ssl_step(model, hp)
    tgt_prob = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), pseudo_dir,
                   label_type="prob", read_sup=True), 2,
    )
    step_before = int(state2.step)  # read before donation invalidates state2
    state3 = state2
    for i in range(2):
        state3, m = step3(state3, next(src_it), next(tgt_prob), jax.random.key(30 + i))
        assert np.isfinite(float(m["loss_source"]))
        assert np.isfinite(float(m["loss_target"]))
    assert int(state3.step) == step_before + 2
