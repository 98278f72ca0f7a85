"""Peak device memory + throughput probe for the pseudo-gen sweep.

VERDICT r2 item 1 asks for a pseudo-gen throughput and peak-memory note at
the LoveDA geometry (1024² tiles, 3×3-window slide + 8-view TTA —
``uemda/utils/tools.py:61-97``). This drives the real sweep
(:func:`uemda_tpu.infer.pseudo_gen.generate_pseudo_labels`) over a config's
target split and prints one JSON line with images/s and a peak-HBM figure.

Peak HBM (VERDICT r4 item 5): ``device.memory_stats()`` when the backend
exposes it; through the axon tunnel it is permanently None, so the probe
falls back to the compiled executable's ``memory_analysis()`` — the XLA
buffer-assignment HBM bound (arguments + outputs + temporaries) for the
EXACT slide+TTA program the sweep runs. That is a compile-time bound, not a
runtime sample, and is the number that sizes batch/raster settings on
bigger-HBM hardware; ``peak_hbm_method`` names which source produced it.

Usage:
    python tools/mem_probe.py --config-path runs/loveda_synth_config.py \
        --ckpt-model /tmp/uemda_loveda/log/align/SynthUrban_best.msgpack
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax

from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def _hlo_peak_hbm(model, variables, hw, tile, batch, fastpath):
    """Compile-time peak-HBM bound for the sweep's slide+TTA program:
    the compiled executable's ``memory_analysis()`` buffer-assignment sizes
    (arguments + outputs + temporaries − donated aliases). Lowered from
    ShapeDtypeStructs, so nothing is materialized."""
    import jax.numpy as jnp

    from uemda_tpu.infer.slide import make_predictor

    m, v = model, variables
    if fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath

        m, v = build_fastpath(model, variables, dtype=jnp.bfloat16)
    pred = make_predictor(m, tile, hw, tta=True)
    specs = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), v)
    img = jax.ShapeDtypeStruct((batch,) + tuple(hw) + (3,), jnp.float32)
    ma = pred.lower(specs, img).compile().memory_analysis()
    if ma is None:
        raise RuntimeError("backend returned no memory_analysis")
    fields = {}
    for f in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        val = getattr(ma, f, None)
        if val is not None:
            fields[f] = int(val)
    peak = (fields.get("argument_size_in_bytes", 0)
            + fields.get("output_size_in_bytes", 0)
            + fields.get("temp_size_in_bytes", 0)
            - fields.get("alias_size_in_bytes", 0))
    if peak <= 0:
        raise RuntimeError(f"no usable size fields in {ma!r}")
    return peak, fields


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-path", type=str, required=True)
    parser.add_argument("--ckpt-model", type=str, default=None,
                        help="optional checkpoint (random init otherwise — "
                        "memory/throughput are weight-independent)")
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--tile", type=int, default=512)
    parser.add_argument("--fastpath", type=int, default=0)
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_model:
        variables = load_checkpoint(args.ckpt_model, variables)

    ds = SegDataset(cfg.meta, cfg.target.image_dir, cfg.target.mask_dir)
    dev = jax.devices()[0]

    def sweep():
        t0 = time.time()
        out = generate_pseudo_labels(
            model, variables, ds, cfg.target.mean, cfg.target.std,
            tile=(args.tile, args.tile), batch_size=args.batch_size,
            fastpath=bool(args.fastpath),
        )
        # the host fp16 readback inside the loop synchronizes every batch
        return out, time.time() - t0

    out, dt_cold = sweep()  # compiles the slide+TTA program
    out, dt = sweep()       # steady-state: what a regen cadence pays

    stats = dev.memory_stats() or {}
    sample = next(iter(out.values()))
    peak_hbm, method, hlo_fields = stats.get("peak_bytes_in_use"), None, None
    if peak_hbm is not None:
        method = "memory_stats"
    else:
        try:
            peak_hbm, hlo_fields = _hlo_peak_hbm(
                model, variables, tuple(sample.shape[:2]),
                (args.tile, args.tile), args.batch_size, bool(args.fastpath))
            method = "hlo_memory_analysis"
        except Exception as e:  # backend without memory_analysis
            hlo_fields = {"error": repr(e)}
    print(json.dumps({
        "n_images": len(out),
        "image_hw": list(sample.shape[:2]),
        "tile": args.tile,
        "batch_size": args.batch_size,
        "tta_views": 8,
        "wall_s_incl_compile": round(dt_cold, 2),
        "wall_s_warm": round(dt, 2),
        "images_per_sec": round(len(out) / dt, 3),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "peak_hbm_bytes": peak_hbm,
        "peak_hbm_method": method,
        "hlo_memory_analysis": hlo_fields,
        "bytes_limit": stats.get("bytes_limit"),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
