"""Real-chip validation + A/B of the fused Pallas serving kernels.

Run on the live TPU: parity (vs the plain fastpath fold) and throughput for
the fused identity-bottleneck blocks (ops/pallas_resblock.py, stages 1-2)
and the fused stem conv + maxpool (ops/pallas_stem.py), alone and combined.
CPU tests cover these kernels only in interpret mode — Mosaic lowering is a
separate failure surface (see docs/PERF_NOTES.md "Mosaic notes").

Usage: python runs/validate_fused.py [--batch 96] [--reps 3]
Emits one JSON line per measurement to stdout.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--k-chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--parity-batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uemda_tpu.infer.fastpath import build_fastpath
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    model = DeeplabV2(DeeplabV2Config.uemda_default(num_classes=6))
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, 512, 512, 3)),
            train=False,
        )
    )()
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    builds = {
        "plain": dict(),
        "resblock12": dict(fused_stages=(1, 2)),
        "stem": dict(fused_stem=True),
        "resblock12_stem": dict(fused_stages=(1, 2), fused_stem=True),
    }
    models = {}
    for name, kw in builds.items():
        try:
            models[name] = build_fastpath(model, variables, dtype=dtype, **kw)
        except Exception as e:
            print(json.dumps({"metric": f"fused_build_{name}",
                              "error": f"{type(e).__name__}: {e}"[:300]}))

    # -- parity vs the plain fold on a shared random batch ------------------
    xp = jax.random.normal(
        jax.random.key(7), (args.parity_batch, 512, 512, 3), dtype
    )
    ref = None
    for name, (m, p) in list(models.items()):
        try:
            o = np.asarray(
                jax.jit(lambda v, x, _m=m: _m.apply(v, x, train=False))(p, xp),
                np.float32,
            )
        except Exception as e:  # Mosaic lowering of one mode must not end
            # the session — record and keep measuring the others
            print(json.dumps({"metric": f"fused_parity_{name}",
                              "error": f"{type(e).__name__}: {e}"[:300]}))
            del models[name]
            continue
        if name == "plain":
            ref = o
            continue
        if ref is None:  # plain build/apply failed above — no baseline
            print(json.dumps({"metric": f"fused_parity_{name}",
                              "error": "no plain baseline"}))
            continue
        maxd = float(np.abs(o - ref).max())
        agree = float((o.argmax(-1) == ref.argmax(-1)).mean())
        print(json.dumps({
            "metric": f"fused_parity_{name}", "max_abs_diff": maxd,
            "argmax_agreement": agree, "platform": jax.devices()[0].platform,
        }))

    # -- throughput A/B ------------------------------------------------------
    for name, (m, p) in list(models.items()):
        @jax.jit
        def many(v, x, _m=m):
            def body(c, _):
                out = _m.apply(v, c, train=False)
                return c + out[..., :3].mean() * 1e-6, out.mean()
            _, means = jax.lax.scan(body, x, None, length=args.k_chain)
            return means.mean()

        x = jax.random.normal(
            jax.random.key(1), (args.batch, 512, 512, 3), dtype
        )
        float(many(p, x))  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            float(many(p, x))
        dt = (time.time() - t0) / args.reps
        print(json.dumps({
            "metric": f"eval_fastpath_{name}_tiles_per_sec",
            "value": round(args.k_chain * args.batch / dt, 2),
            "unit": "tiles/s", "batch": args.batch,
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
