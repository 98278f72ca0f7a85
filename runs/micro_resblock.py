"""Microbench: fused identity-bottleneck Pallas kernel vs the XLA 3-conv
composition it replaces, on the real serving shapes (layer1/layer2 of the
fastpath at 512^2 tiles).  Run on the live TPU; one JSON line per shape and
implementation, timing a chained scan (device time, single readback).

Usage: python runs/micro_resblock.py [--batch 32] [--iters 20]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uemda_tpu.ops.pallas_resblock import bottleneck_identity_pallas

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    def xla_block(x, w1, b1, w2, b2, w3, b3, dil=1):
        def conv(h, w, b, pad, d=1):
            y = jax.lax.conv_general_dilated(
                h, w.astype(h.dtype), (1, 1), ((pad, pad), (pad, pad)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b.astype(h.dtype)
        y = jax.nn.relu(conv(x, w1, b1, 0))
        y = jax.nn.relu(conv(y, w2, b2, dil, dil))
        y = conv(y, w3, b3, 0)
        return jax.nn.relu(y + x)

    # (name, H, W, Cin, Cmid, dil) — fastpath layer1/layer2 shapes at 512^2
    shapes = [
        ("layer1", 128, 128, 256, 64, 1),
        ("layer2", 64, 64, 512, 128, 1),
    ]

    for name, h, w, cin, cmid, dil in shapes:
        r = np.random.default_rng(0)
        x = jnp.asarray(r.normal(size=(args.batch, h, w, cin)), dtype)
        w1 = jnp.asarray(r.normal(size=(1, 1, cin, cmid)) * 0.05, dtype)
        w2 = jnp.asarray(r.normal(size=(3, 3, cmid, cmid)) * 0.05, dtype)
        w3 = jnp.asarray(r.normal(size=(1, 1, cmid, cin)) * 0.05, dtype)
        b1 = jnp.asarray(r.normal(size=(cmid,)), jnp.float32)
        b2 = jnp.asarray(r.normal(size=(cmid,)), jnp.float32)
        b3 = jnp.asarray(r.normal(size=(cin,)), jnp.float32)

        impls = {
            "xla": lambda v: xla_block(v, w1, b1, w2, b2, w3, b3, dil),
            "pallas": lambda v: bottleneck_identity_pallas(
                v, w1, b1, w2, b2, w3, b3, dilation=dil),
        }
        for iname, fn in impls.items():
            @jax.jit
            def chained(v, _fn=fn):
                def body(c, _):
                    return _fn(c), ()
                out, _ = jax.lax.scan(body, v, None, length=args.iters)
                return out

            try:
                out = chained(x)
                float(jnp.mean(out.astype(jnp.float32)))  # sync (tunnel-safe)
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    out = chained(x)
                    float(jnp.mean(out.astype(jnp.float32)))
                    best = min(best, time.perf_counter() - t0)
                us = best / args.iters / args.batch * 1e6
                # HBM bytes if perfectly fused: read x + write out once
                traffic = 2 * h * w * cin * 2
                print(json.dumps({
                    "metric": f"resblock_{name}_{iname}",
                    "us_per_image": round(us, 2),
                    "eff_gbps_vs_minimal": round(traffic / (us * 1e-6) / 1e9, 1),
                    "batch": args.batch,
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "metric": f"resblock_{name}_{iname}",
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)


if __name__ == "__main__":
    main()
