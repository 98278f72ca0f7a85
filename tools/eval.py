"""Checkpoint evaluation CLI (rebuild of reference ``tools/eval.py:15-56``):
sliding-window mIoU on the val or test split with optional x8 TTA."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.infer.evaluate import evaluate_dataset
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True,
                        help=".msgpack variables or reference torch .pth")
    parser.add_argument("--test", type=str2bool, default=0,
                        help="use TEST split instead of EVAL")
    parser.add_argument("--tta", type=str2bool, default=0)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--vis", type=str2bool, default=1)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--int8", type=str2bool, default=0,
                        help="serve convs on the MXU int8 path (infer/quant.py)")
    parser.add_argument("--fastpath", type=str2bool, default=0,
                        help="folded serving fast path (infer/fastpath.py): "
                        "BN-fold + fused dual head, exact math; with --int8, "
                        "quantizes the compute-bound GEMMs instead of all convs")
    parser.add_argument("--calib-batches", type=int, default=0,
                        help="with --fastpath --int8: calibrate static int8 "
                        "activation scales on this many eval batches (faster "
                        "serving than dynamic per-tensor amax)")
    parser.add_argument("--int8-stages", type=str, default="",
                        help="with --fastpath --int8: comma list of backbone "
                        "stages to quantize (default 3,4; 1,2,3,4 is fastest "
                        "with --calib-batches — gate first, serving_gate.py)")
    parser.add_argument("--decode-workers", type=int, default=1,
                        help="host-side image-decode thread pool (>1 pays "
                        "off on multi-core hosts)")
    args = parser.parse_args()

    # validate before any model/calibration work, and reject the flag when
    # it would otherwise be silently ignored (ADVICE r2)
    from uemda_tpu.infer.fastpath import parse_int8_stages_flag

    int8_stages = parse_int8_stages_flag(
        args.int8_stages, bool(args.int8), bool(args.fastpath)
    )

    cfg = load_config(args.config_path)
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    logger = get_console_file_logger("eval", run_dir)
    logging_args(args, logger)

    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path, variables)

    split = cfg.test if args.test else cfg.val
    dataset = SegDataset(cfg.meta, list(split.image_dir), list(split.mask_dir)[0])
    vis_dir = (
        os.path.join(run_dir, f"vis-{os.path.basename(args.ckpt_path)}")
        if args.vis
        else None
    )
    mesh = None
    if (args.num_devices or 0) > 1:
        from uemda_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices)
    if args.fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath, check_fastpath_tile

        check_fastpath_tile(cfg.crop)

        calib = None
        if args.int8 and args.calib_batches > 0:
            from uemda_tpu.infer.evaluate import collect_calib_batches

            calib = collect_calib_batches(
                dataset, args.batch_size or split.batch_size,
                split.mean, split.std, args.calib_batches, tile=cfg.crop,
            )
        model, variables = build_fastpath(
            model, variables, int8=bool(args.int8),
            calibration_batches=calib, int8_stages=int8_stages,
        )
    elif args.int8:
        from uemda_tpu.infer.quant import Int8Model

        model = Int8Model(model)
    summary, miou = evaluate_dataset(
        model, variables, dataset, split.mean, split.std, tile=cfg.crop,
        tta=bool(args.tta),
        batch_size=args.batch_size or split.batch_size,
        vis_dir=vis_dir, logger=logger, mesh=mesh,
        decode_workers=args.decode_workers,
    )
    print(json.dumps({"miou": miou, **{k: summary[k] for k in ("mf1", "mprecision", "mrecall")}}))


if __name__ == "__main__":
    main()
