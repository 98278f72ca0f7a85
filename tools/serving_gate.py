"""Serving-mode quality gate: mIoU + per-class IoU of every serving mode.

Before deploying a non-default serving mode (--fastpath / --int8), run this
to verify the mode preserves quality on the actual validation split. The
reference has no analog (it serves the training graph as-is); this guards
the rebuild's folded/quantized serving paths (infer/fastpath.py,
infer/quant.py).

Hardened gate (round-2): accepts MULTIPLE checkpoints (comma list — e.g.
different stages/seeds, so the int8 error is measured across feature
distributions, not one lucky model), gates on BOTH the mIoU delta and the
WORST-CASE per-class IoU delta vs the standard path, and is wired into
tools/run_pipeline.py (--gate) so a pipeline deploy can't silently ship a
degraded quantized path.

Prints one JSON line per (checkpoint, mode) and a final ``GATE_RESULT``
line; exit code 1 if any checkpoint/mode exceeds a tolerance.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from uemda_tpu.utils.log import str2bool
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def gate_checkpoint(cfg, ckpt_path, modes, batch_size, calib_batches,
                    test=False, model=None, init_vars=None):
    """Evaluate every serving mode on one checkpoint.

    ``model``/``init_vars`` let a multi-checkpoint caller pay the model
    build + init once (run_gate does).
    Returns {mode: {"miou": float, "iou": [..], "class_names": [..]}}."""
    from uemda_tpu.datasets.base import SegDataset
    from uemda_tpu.infer.evaluate import evaluate_dataset
    from uemda_tpu.train.checkpoints import load_checkpoint
    from uemda_tpu.train.loop import build_model, init_variables

    if model is None:
        model = build_model(cfg)
    variables = init_variables(model, cfg) if init_vars is None else init_vars
    if ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(ckpt_path))
    else:
        variables = load_checkpoint(ckpt_path, variables)

    split = cfg.test if test else cfg.val
    dataset = SegDataset(cfg.meta, list(split.image_dir), list(split.mask_dir)[0])
    batch = batch_size or split.batch_size

    calib_cache = {}

    def calib(n):
        # mode-independent: collect once per checkpoint, reuse across the
        # calibrated modes (image decode is the 1-core host's bottleneck)
        if n not in calib_cache:
            from uemda_tpu.infer.evaluate import collect_calib_batches

            calib_cache[n] = collect_calib_batches(
                dataset, batch, split.mean, split.std, n, tile=cfg.crop
            )
        return calib_cache[n]

    def build(mode):
        if mode == "standard":
            return model, variables
        if mode in ("fastpath", "fastpath_int8", "fastpath_int8cal",
                    "fastpath_int8cal_all"):
            from uemda_tpu.infer.fastpath import (
                build_fastpath,
                calibrate_act_scales,
            )

            m, p = build_fastpath(
                model, variables, int8="int8" in mode,
                # _all: calibrated int8 on EVERY backbone stage + fused
                # Pallas stem — the EXACT config bench.py/bench_suite
                # measure and serve as the headline, so the gate verifies
                # what ships (interpret-mode Pallas on CPU)
                int8_stages=(1, 2, 3, 4) if mode.endswith("_all") else None,
                fused_stem=mode.endswith("_all"),
            )
            if mode.startswith("fastpath_int8cal"):
                p = calibrate_act_scales(m.meta, p, calib(calib_batches))
            return m, p
        if mode == "int8":
            from uemda_tpu.infer.quant import Int8Model

            return Int8Model(model), variables
        raise ValueError(mode)

    results = {}
    for mode in modes:
        m, v = build(mode)
        summary, miou = evaluate_dataset(
            m, v, dataset, split.mean, split.std, tile=cfg.crop,
            batch_size=batch,
        )
        results[mode] = {
            "miou": round(float(miou), 5),
            "iou": summary["iou"],
            "class_names": summary["class_names"],
        }
        print(json.dumps(
            {"ckpt": ckpt_path, "mode": mode, "miou": results[mode]["miou"]}
        ), flush=True)
    return results


def deltas_vs_standard(results):
    """{mode: {"miou_delta":, "worst_class_delta":, "worst_class":}} for the
    non-standard modes."""
    base = results.get("standard")
    out = {}
    if base is None:
        return out
    for mode, r in results.items():
        if mode == "standard":
            continue
        per_class = [abs(a - b) for a, b in zip(r["iou"], base["iou"])]
        worst = max(range(len(per_class)), key=lambda i: per_class[i])
        out[mode] = {
            "miou_delta": round(abs(r["miou"] - base["miou"]), 5),
            "worst_class_delta": round(per_class[worst], 5),
            "worst_class": r["class_names"][worst],
        }
    return out


def run_gate(config_path, ckpt_paths, modes=None, batch_size=None,
             calib_batches=2, tolerance=0.005, class_tolerance=0.02,
             test=False):
    """Programmatic entry (used by tools/run_pipeline.py --gate).

    Returns (ok, report)."""
    from uemda_tpu.config import load_config

    cfg = load_config(config_path)
    modes = list(modes or
                 ["standard", "fastpath", "fastpath_int8", "fastpath_int8cal",
                  "fastpath_int8cal_all", "int8"])
    if "standard" not in modes:
        # the gate is a comparison — nothing to gate without the baseline,
        # and exiting 0 would read as "quality verified"
        modes = ["standard"] + modes
        print(json.dumps({"note": "added 'standard' baseline to --modes"}))

    from uemda_tpu.train.loop import build_model, init_variables

    model = build_model(cfg)
    init_vars = init_variables(model, cfg)
    report, ok = {}, True
    for ckpt in ckpt_paths:
        results = gate_checkpoint(
            cfg, ckpt, modes, batch_size, calib_batches, test=test,
            model=model, init_vars=init_vars,
        )
        deltas = deltas_vs_standard(results)
        ckpt_ok = all(
            d["miou_delta"] <= tolerance
            and d["worst_class_delta"] <= class_tolerance
            for d in deltas.values()
        )
        ok = ok and ckpt_ok
        report[ckpt] = {
            "miou": {m: r["miou"] for m, r in results.items()},
            "deltas": deltas,
            "ok": ckpt_ok,
        }
    print("GATE_RESULT " + json.dumps(
        {"report": report, "tolerance": tolerance,
         "class_tolerance": class_tolerance, "ok": ok}
    ), flush=True)
    return ok, report


def main():
    parser = argparse.ArgumentParser(
        description="Serving-mode mIoU + per-class IoU gate."
    )
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True,
                        help="checkpoint path, or a comma list of several "
                        "(different stages/seeds) — every one must pass")
    parser.add_argument("--test", type=str2bool, default=0,
                        help="use TEST split instead of EVAL")
    parser.add_argument("--modes", type=str,
                        default="standard,fastpath,fastpath_int8,"
                        "fastpath_int8cal,fastpath_int8cal_all,int8",
                        help="comma list: standard,fastpath,fastpath_int8,"
                        "fastpath_int8cal (static activation scales "
                        "calibrated on --calib-batches of this split),"
                        "fastpath_int8cal_all (calibrated int8 on every "
                        "backbone stage — fastest),int8")
    parser.add_argument("--calib-batches", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--tolerance", type=float, default=0.005,
                        help="max |mIoU - standard| per checkpoint")
    parser.add_argument("--class-tolerance", type=float, default=0.02,
                        help="max per-class |IoU - standard| per checkpoint")
    args = parser.parse_args()

    ok, _ = run_gate(
        args.config_path,
        [p for p in args.ckpt_path.split(",") if p],
        modes=args.modes.split(","),
        batch_size=args.batch_size,
        calib_batches=args.calib_batches,
        tolerance=args.tolerance,
        class_tolerance=args.class_tolerance,
        test=bool(args.test),
    )
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
