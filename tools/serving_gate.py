"""Serving-mode quality gate: mIoU of every serving mode on one checkpoint.

Before deploying a non-default serving mode (--fastpath / --int8), run this
to verify the mode preserves quality on the actual validation split. The
reference has no analog (it serves the training graph as-is); this guards
the rebuild's folded/quantized serving paths (infer/fastpath.py,
infer/quant.py).

Prints one JSON line per mode and a final ``GATE_RESULT`` line with the
max |delta| vs the standard bf16 path.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from uemda_tpu.utils.log import str2bool
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Serving-mode mIoU gate.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--test", type=str2bool, default=0,
                        help="use TEST split instead of EVAL")
    parser.add_argument("--modes", type=str,
                        default="standard,fastpath,fastpath_int8,"
                        "fastpath_int8cal,int8",
                        help="comma list: standard,fastpath,fastpath_int8,"
                        "fastpath_int8cal (static activation scales "
                        "calibrated on --calib-batches of this split),int8")
    parser.add_argument("--calib-batches", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--tolerance", type=float, default=0.005,
                        help="max |mIoU - standard| before exit code 1")
    args = parser.parse_args()

    from uemda_tpu.config import load_config
    from uemda_tpu.datasets.base import SegDataset
    from uemda_tpu.infer.evaluate import evaluate_dataset
    from uemda_tpu.train.checkpoints import load_checkpoint
    from uemda_tpu.train.loop import build_model, init_variables

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path, variables)

    split = cfg.test if args.test else cfg.val
    dataset = SegDataset(cfg.meta, list(split.image_dir), list(split.mask_dir)[0])
    batch = args.batch_size or split.batch_size

    def calib_batches(n):
        from uemda_tpu.infer.evaluate import collect_calib_batches

        return collect_calib_batches(
            dataset, batch, split.mean, split.std, n, tile=cfg.crop
        )

    def build(mode):
        if mode == "standard":
            return model, variables
        if mode in ("fastpath", "fastpath_int8", "fastpath_int8cal"):
            from uemda_tpu.infer.fastpath import (
                build_fastpath,
                calibrate_act_scales,
            )

            m, p = build_fastpath(model, variables, int8="int8" in mode)
            if mode == "fastpath_int8cal":
                p = calibrate_act_scales(m.meta, p, calib_batches(args.calib_batches))
            return m, p
        if mode == "int8":
            from uemda_tpu.infer.quant import Int8Model

            return Int8Model(model), variables
        raise ValueError(mode)

    modes = args.modes.split(",")
    if "standard" not in modes:
        # the gate is a comparison — there is nothing to gate without the
        # baseline mode, and exiting 0 would read as "quality verified"
        modes = ["standard"] + modes
        print(json.dumps({"note": "added 'standard' baseline to --modes"}))

    results = {}
    for mode in modes:
        m, v = build(mode)
        _, miou = evaluate_dataset(
            m, v, dataset, split.mean, split.std, tile=cfg.crop,
            batch_size=batch,
        )
        results[mode] = round(float(miou), 5)
        print(json.dumps({mode: results[mode]}), flush=True)

    base = results.get("standard")
    delta = (
        max(abs(v - base) for v in results.values()) if base is not None else None
    )
    ok = delta is None or delta <= args.tolerance
    print("GATE_RESULT " + json.dumps(
        {"results": results, "max_delta": delta, "ok": ok}
    ))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
