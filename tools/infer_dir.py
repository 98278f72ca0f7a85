"""Batch directory inference CLI (serving path).

The reference only ships single-image inference (``tools/infer_single.py``)
and label-producing sweeps; this tool runs the batched slide(+TTA) predictor
over every image in a directory — optionally on the int8 MXU path — and
writes raw id PNGs and/or palette PNGs. It is ``generate_pseudo_labels``
without the probability artifacts: one jitted program, images streamed
through the double-buffered device pipeline.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np

import jax.numpy as jnp

from uemda_tpu.config import load_config
from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.infer.evaluate import device_batches
from uemda_tpu.infer.slide import make_predictor
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.log import str2bool
from uemda_tpu.utils.runtime import enable_compile_cache
from uemda_tpu.utils.viz import VisualizeSegmm

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Infer a whole directory.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--img-dir", type=str, required=True)
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--tta", type=str2bool, default=0)
    parser.add_argument("--int8", type=str2bool, default=0)
    parser.add_argument("--fastpath", type=str2bool, default=0,
                        help="folded serving fast path (infer/fastpath.py); "
                        "with --int8, quantizes only the compute-bound GEMMs")
    parser.add_argument("--calib-batches", type=int, default=0,
                        help="with --fastpath --int8: calibrate static int8 "
                        "activation scales on this many input batches")
    parser.add_argument("--int8-stages", type=str, default="",
                        help="with --fastpath --int8: comma list of backbone "
                        "stages to quantize (default 3,4; 1,2,3,4 is fastest "
                        "with --calib-batches — gate first, serving_gate.py)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--ids", type=str2bool, default=1,
                        help="write raw class-id PNGs")
    parser.add_argument("--color", type=str2bool, default=1,
                        help="write palette PNGs")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--decode-workers", type=int, default=1,
                        help="host-side image-decode thread pool (PNG/TIFF "
                        "decompression releases the GIL; >1 pays off on "
                        "multi-core deployment hosts — this 1-core dev host "
                        "is flat)")
    args = parser.parse_args()

    # validate before any model/calibration work (ADVICE r2)
    from uemda_tpu.infer.fastpath import parse_int8_stages_flag

    int8_stages = parse_int8_stages_flag(
        args.int8_stages, bool(args.int8), bool(args.fastpath)
    )

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path, variables)
    dataset = SegDataset(cfg.meta, args.img_dir, None, label_type="none")
    split = cfg.val
    if args.fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath, check_fastpath_tile

        check_fastpath_tile(cfg.crop)

        calib = None
        if args.int8 and args.calib_batches > 0:
            from uemda_tpu.infer.evaluate import collect_calib_batches

            calib = collect_calib_batches(
                dataset, args.batch_size, split.mean, split.std,
                args.calib_batches, tile=cfg.crop,
            )
        model, variables = build_fastpath(
            model, variables, int8=bool(args.int8),
            calibration_batches=calib, int8_stages=int8_stages,
        )
    elif args.int8:
        from uemda_tpu.infer.quant import Int8Model

        model = Int8Model(model)
    mesh = None
    if (args.num_devices or 0) > 1:
        from uemda_tpu.parallel import make_mesh, shard_pytree_replicated

        mesh = make_mesh(args.num_devices)
        variables = shard_pytree_replicated(mesh, variables)

    os.makedirs(args.out_dir, exist_ok=True)
    viz = VisualizeSegmm(args.out_dir, cfg.meta.palette) if args.color else None

    predictor, hw = None, None
    t0, done = time.time(), 0
    for indices, images, n, _ in device_batches(
        dataset, args.batch_size, mesh, decode_workers=args.decode_workers
    ):
        if predictor is None or images.shape[1:3] != hw:
            hw = images.shape[1:3]
            predictor = make_predictor(model, cfg.crop, hw, tta=bool(args.tta))
        probs = predictor(variables, normalize(images, split.mean, split.std))
        pred = np.asarray(jnp.argmax(probs[:n], -1).astype(jnp.int32))
        for j, idx in enumerate(indices):
            stem = os.path.splitext(dataset.filename(idx))[0]
            if args.ids:
                from PIL import Image

                Image.fromarray(pred[j].astype(np.uint8)).save(
                    os.path.join(args.out_dir, stem + "_ids.png")
                )
            if viz is not None:
                viz(pred[j], stem + "_color.png")
        done += n
    dt = time.time() - t0
    print(f"{done} images -> {args.out_dir} in {dt:.1f}s ({done / dt:.2f} img/s)")


if __name__ == "__main__":
    main()
