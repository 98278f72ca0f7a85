"""End-to-end run of tools/refine_quality.py on a tiny synthetic pair.

The tool measures whether multi-view label refinement improves pseudo-label
accuracy at matched coverage (VERDICT r2 item 2b; reference scoring:
``pseudo_generation.py:158-235``). This exercises the WHOLE tool path the
ablation chain (runs/ablation_uvem.sh) depends on: prob-label + superpixel
dataset reads, checkpoint loads, the jitted multi-mode refine forward, the
confidence histograms and the final JSON report.
"""

import json
import sys

import numpy as np

import jax.numpy as jnp

from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.datasets.meta import IsprsDA
from uemda_tpu.datasets.synthetic import make_synthetic_dataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.train.checkpoints import save_checkpoint
from uemda_tpu.train.loop import build_model, init_variables

HW = 64


def test_refine_quality_tool(tmp_path, monkeypatch, capsys):
    root = str(tmp_path)
    make_synthetic_dataset(
        f"{root}/tgt", IsprsDA, n_train=2, n_val=1, hw=HW, seed=3,
        domain_shift=6.0, noise=30.0,
    )
    cfg_py = tmp_path / "cfg.py"
    cfg_py.write_text(
        "from uemda_tpu.config import PairConfig, SplitConfig\n"
        "m, s = (128.0,) * 3, (64.0,) * 3\n"
        "CONFIG = PairConfig(\n"
        "    name='rq', datasets='IsprsDA', target_set='T',\n"
        f"    source=SplitConfig(('{root}/tgt/img_dir/train',),"
        f" ('{root}/tgt/ann_dir/train',), m, s, 2),\n"
        f"    target=SplitConfig(('{root}/tgt/img_dir/train',),"
        f" ('{root}/tgt/ann_dir/train',), m, s, 2),\n"
        f"    val=SplitConfig(('{root}/tgt/img_dir/val',),"
        f" ('{root}/tgt/ann_dir/val',), m, s, 1),\n"
        f"    test=SplitConfig(('{root}/tgt/img_dir/val',),"
        f" ('{root}/tgt/ann_dir/val',), m, s, 1),\n"
        f"    snapshot_dir='{root}/log', model='resnet18',\n"
        f"    crop=({HW}, {HW}),\n"
        ")\n"
    )
    cfg = load_config(str(cfg_py))
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    ckpt_model = f"{root}/model.msgpack"
    ckpt_proto = f"{root}/proto.msgpack"
    save_checkpoint(ckpt_model, variables)
    fc = model.config.inchannels
    protos = jnp.asarray(
        np.random.default_rng(0).normal(size=(cfg.class_num, fc)), jnp.float32
    )
    save_checkpoint(ckpt_proto, protos)

    # pseudo labels as the stage-3 gen pass would store them
    ds = SegDataset(cfg.meta, list(cfg.target.image_dir), None, label_type="none")
    pseudo_dir = f"{root}/pseudo_label"
    generate_pseudo_labels(
        model, variables, ds, cfg.target.mean, cfg.target.std,
        out_dir=pseudo_dir, tile=(HW, HW), batch_size=2,
        keep_in_memory=False,
    )

    monkeypatch.setattr(sys, "argv", [
        "refine_quality.py",
        "--config-path", str(cfg_py),
        "--ckpt-model", ckpt_model,
        "--ckpt-proto", ckpt_proto,
        "--pseudo-dir", pseudo_dir,
        "--batch-size", "2",
    ])
    from tools.refine_quality import main

    main()
    out = capsys.readouterr().out.strip().splitlines()
    report = json.loads(out[-1])
    for mode in ("none", "p", "l", "s", "all"):
        assert mode in report, report
        r = report[mode]
        assert 0.0 <= r["accuracy"] <= 1.0
        assert 0.0 <= r["coverage"] <= 1.0
        assert 0.0 <= r["acc_at_matched_coverage"] <= 1.0
        assert np.isfinite(r["matched_acc_delta_vs_none"])
    assert report["none"]["acc_delta_vs_none"] == 0.0
    assert 0.0 <= report["matched_coverage"] <= 1.0
    # matched-coverage takes are comparable: every mode is scored at the
    # same kept-pixel budget, so coverage >= matched_coverage for all
    for mode in ("none", "p", "l", "s", "all"):
        assert report[mode]["coverage"] >= report["matched_coverage"] - 1e-9
