"""Stage-3 quality-regression gate (VERDICT r3 item 2).

Round 3's only real-chip LoveDA-geometry run collapsed 0.445 -> 0.108 mIoU
within 200 steps while every pipeline test stayed green, because the tests
asserted only finite losses and 0 <= mIoU <= 1. Root cause: the stage-3
target pipeline hardcoded the ISPRS-only Normalize clamp(max=1.0)
(configs/st/uemda/2vaihingen.py:38) for every dataset; at LoveDA stats
(std ~35) that saturates ~45% of target pixels, the BN running statistics
drift to the clamped distribution (stem |mean| moved 42% in the r3 run),
and eval — running stats, unclamped inputs — collapses.

Two gates:
  * config fidelity — clamp is per-dataset exactly as in the reference
    (ISPRS on, LoveDA off: configs/st/*/2urban.py has no clamp), and the
    flag actually reaches the jitted step;
  * behavior — a short stage-3 loop from a trained-ish stage-1 proxy at
    LoveDA stats must NOT end below its starting eval. This test is RED on
    the round-3 code (unconditional clamp) and GREEN with the per-dataset
    flag.
"""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.config import PRESETS, PairConfig, SplitConfig
from uemda_tpu.datasets.base import SegDataset, infinite_batches
from uemda_tpu.datasets.meta import NORM_STATS, IsprsDA, LoveDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset
from uemda_tpu.infer.evaluate import evaluate_dataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.train.loop import (
    build_model,
    build_state,
    default_hparams,
    init_variables,
    variables_of,
)
from uemda_tpu.alignment.prototypes import init_avg
from uemda_tpu.train.steps import (
    make_init_proto_step,
    make_src_step,
    make_ssl_step,
)


def test_clamp_target_follows_reference_configs():
    """clamp=True only in the ISPRS reference configs; every LoveDA config
    normalizes without clamp (grep 'clamp' over configs/st/*/*.py)."""
    for name in ("2vaihingen", "2potsdam", "pRgb2vaihingen", "pRgb2potsdam"):
        assert PRESETS[name].clamp_target is True, name
    for name in ("2urban", "2rural"):
        assert PRESETS[name].clamp_target is False, name
    # and the flag reaches the step hparams
    assert default_hparams(PRESETS["2vaihingen"]).clamp_target is True
    assert default_hparams(PRESETS["2urban"]).clamp_target is False


def test_run_pipeline_warns_on_stage_regression(tmp_path, capsys):
    """run_pipeline's post-chain check flags a stage ending below its init
    stage (the r3 collapse signature) and stays quiet on a healthy chain."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location(
        "run_pipeline", "tools/run_pipeline.py")
    rp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rp)

    def write(miou_by_stage):
        for stage, miou in miou_by_stage.items():
            d = tmp_path / stage
            d.mkdir(exist_ok=True)
            (d / "best.json").write_text(
                _json.dumps({"miou": miou, "step": 100}))

    write({"src": 0.28, "align": 0.44, "ssl": 0.52})  # the healthy r4 chain
    rp._warn_on_stage_regression(str(tmp_path))
    assert "WARNING" not in capsys.readouterr().out

    write({"src": 0.28, "align": 0.44, "ssl": 0.10})  # the r3 collapse
    rp._warn_on_stage_regression(str(tmp_path))
    out = capsys.readouterr().out
    assert "WARNING" in out and "ssl" in out and "quality regression" in out


HW, CROP = 64, 32


def _proxy_cfg(root, meta=LoveDA, datasets="LoveDA", stats="LoveDA",
               clamp_target=False):
    m, s = NORM_STATS[stats]["mean"], NORM_STATS[stats]["std"]
    # source == target (no shift): pseudo labels are accurate, so any
    # eval regression in stage 3 is the trainer's fault, not the data's
    make_synthetic_dataset(root, meta, n_train=4, n_val=4, hw=HW, seed=3)
    return PairConfig(
        name="gate", datasets=datasets, target_set="T",
        clamp_target=clamp_target,
        source=SplitConfig((f"{root}/img_dir/train",),
                           (f"{root}/ann_dir/train",), m, s, 4),
        target=SplitConfig((f"{root}/img_dir/train",),
                           (f"{root}/ann_dir/train",), m, s, 4),
        val=SplitConfig((f"{root}/img_dir/val",),
                        (f"{root}/ann_dir/val",), m, s, 4),
        test=SplitConfig((f"{root}/img_dir/val",),
                         (f"{root}/ann_dir/val",), m, s, 4),
        snapshot_dir=f"{root}/log", model="resnet18", crop=(CROP, CROP),
    )


def _eval(model, variables, cfg):
    _, miou = evaluate_dataset(
        model, variables, SegDataset(cfg.meta, list(cfg.val.image_dir),
                                     list(cfg.val.mask_dir)[0]),
        cfg.val.mean, cfg.val.std, tile=cfg.crop, batch_size=2,
        compute_dtype="float32",
    )
    return miou


def _run_gate(root, clamp_override=None, meta=LoveDA, datasets="LoveDA",
              stats="LoveDA", clamp_target=False):
    """Train the proxy, run the stage-3 loop, return (miou_init, miou_final).

    ``clamp_override`` forces the target clamp (True at LoveDA stats
    reproduces the r3 collapse mechanism — used by the one-off
    discrimination check in runs/tpu_results and available for debugging).
    ``meta``/``datasets``/``stats``/``clamp_target`` select the proxy's
    dataset family: LoveDA stats + no clamp (the r3 collapse arm) or ISPRS
    Vaihingen stats + clamp (the reference's healthy ISPRS configuration)."""
    cfg = _proxy_cfg(str(root), meta=meta, datasets=datasets, stats=stats,
                     clamp_target=clamp_target)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    fc = model.config.inchannels
    hp = default_hparams(cfg, compute_dtype="float32",
                         refine=True, refine_mode="all", target_loss="uvem")
    if clamp_override is not None:
        import dataclasses

        hp = dataclasses.replace(hp, clamp_target=clamp_override)
    else:
        assert hp.clamp_target is clamp_target

    # --- stage-1 proxy: supervised on source until eval is meaningful ---
    step1 = make_src_step(model, hp)
    state = build_state(variables, cfg, 200, feat_channels=fc)
    src_it = infinite_batches(
        SegDataset(cfg.meta, list(cfg.source.image_dir),
                   list(cfg.source.mask_dir)[0]), 4)
    tgt_it = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), None,
                   label_type="none"), 4, seed=1)
    for i in range(200):
        state, _ = step1(state, next(src_it),
                         {"image": jnp.asarray(next(tgt_it)["image"])},
                         jax.random.key(i))
    variables = variables_of(state)
    miou_init = _eval(model, variables, cfg)
    # the proxy must be non-trivially trained or the gate is vacuous
    assert miou_init > 0.22, f"proxy undertrained: {miou_init}"

    # --- pseudo labels from the proxy (accurate: same domain) ---
    pseudo_dir = str(root) + "/pseudo"
    generate_pseudo_labels(
        model, variables, SegDataset(cfg.meta, list(cfg.target.image_dir),
                                     None, label_type="none"),
        cfg.target.mean, cfg.target.std, out_dir=pseudo_dir, tile=cfg.crop,
        tta=True, batch_size=2, compute_dtype="float32",
    )

    # --- prototypes from the trained proxy (the real chain runs
    # tools/init_prototypes.py here; zero prototypes would corrupt the
    # refine 'p' view, whose weight is 1/pearson_dist(feat, prototypes)) ---
    pstate = build_state(jax.tree.map(jnp.array, variables), cfg, 1,
                         feat_channels=fc)
    proto_step = make_init_proto_step(model, hp)
    for i in range(8):
        pstate = proto_step(pstate, next(src_it), jax.random.key(500 + i))
    protos = init_avg(pstate.aligner).prototypes
    assert np.isfinite(np.asarray(protos)).all()

    # --- stage-3 loop ---
    state3 = build_state(variables, cfg, 40, prototypes=protos,
                         feat_channels=fc)
    step3 = make_ssl_step(model, hp)
    tgt_prob = infinite_batches(
        SegDataset(cfg.meta, list(cfg.target.image_dir), pseudo_dir,
                   label_type="prob", read_sup=True), 4, seed=2)
    for i in range(40):
        state3, m = step3(state3, next(src_it), next(tgt_prob),
                          jax.random.key(100 + i))
        assert np.isfinite(float(m["loss_target"]))
    miou_final = _eval(model, variables_of(state3), cfg)
    return miou_init, miou_final


def test_stage3_does_not_regress_from_its_init(tmp_path):
    """Short UVEM+refine stage-3 loop from a trained-ish proxy at LoveDA
    stats: final eval must stay >= 0.72x its init eval. Both arms were
    measured on this deterministic proxy (fixed PRNG keys, fixed synthetic
    data, 8-virtual-device CPU mesh — independent processes reproduce the
    shared stage-1 init 0.29087 to 1e-5): the fixed code holds 0.814x init (0.2909 ->
    0.2369; tiny-proxy jitter, the real-geometry rerun RISES 1.18x), the
    r3 unconditional-clamp code falls to 0.668x (0.2909 -> 0.1943) on its
    way to the 0.24x real-geometry collapse — the BN running stats drift
    to the clamped target distribution while eval feeds unclamped inputs.
    0.72 is the midpoint; discrimination runs recorded in
    runs/tpu_results/loveda_stage3_fix.md."""
    miou_init, miou_final = _run_gate(tmp_path)
    assert miou_final >= miou_init * 0.72, (
        f"stage-3 regressed the model: init {miou_init:.4f} -> "
        f"final {miou_final:.4f} (the r3 LoveDA collapse signature; "
        "see runs/tpu_results/loveda_stage3_fix.md)"
    )


def test_stage3_isprs_clamp_arm_holds_golden_floor(tmp_path):
    """Complementary arm (VERDICT r4 item 7): the reference's ISPRS
    configuration — Vaihingen stats, Normalize clamp(max=1.0) on the
    stage-3 TARGET pipeline only, exactly configs/st/uemda/2vaihingen.py:38
    (eval/pseudo/source normalize without clamp, configs/ToVaihingen.py:
    84-110 — the train/eval clamp mismatch is the reference's own
    semantics, just mild at Vaihingen stats).

    Measured on the fixed code (8-virtual-device CPU mesh, deterministic
    keys + seed-3 synthetic data): init 0.26161 -> final 0.19444. The
    40-step tiny proxy loses ground under BOTH healthy arms (LoveDA arm
    0.814x, this arm 0.743x; the real-geometry runs RISE — runs/
    tpu_results/loveda_stage3_fix.md), so the r4-VERDICT-suggested
    ``final >= init`` is empirically unattainable here and a ratio gate
    below 0.743 could never catch a 25%-of-init regression. Instead this
    arm exploits the proxy's determinism (independent processes reproduce
    stage-1 evals to 1e-5): a one-sided GOLDEN floor at measured-final
    minus 0.01 mIoU absolute — red if any silent change to the stage-3
    math/clamp semantics costs more than ~4% of the deterministic final,
    ~7x tighter than the LoveDA arm's discriminated 0.72x collapse bound.
    A legitimate math change that moves the deterministic value requires
    re-measuring this floor (update both numbers below)."""
    miou_init, miou_final = _run_gate(
        tmp_path, meta=IsprsDA, datasets="IsprsDA", stats="Vaihingen",
        clamp_target=True,
    )
    assert abs(miou_init - 0.26161) < 0.01, (
        f"ISPRS proxy init drifted from its golden 0.26161: {miou_init:.5f}"
        " (stage-1/eval path changed — re-measure this arm)"
    )
    assert miou_final >= 0.19444 - 0.01, (
        f"ISPRS clamp arm fell below its golden floor: init "
        f"{miou_init:.5f} -> final {miou_final:.5f} (golden 0.19444; "
        "stage-3 math or clamp semantics regressed)"
    )
