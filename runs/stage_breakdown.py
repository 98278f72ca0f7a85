"""Per-stage time breakdown of the folded serving forward on the live TPU.

Times cumulative prefixes (stem, +layer1, ..., full forward incl. heads +
eval tail) of ``infer/fastpath.serving_forward`` with a chained scan (the
next iteration's input is perturbed by the previous mean so XLA cannot
hoist the loop-invariant compute); differences between consecutive
prefixes are the per-stage device costs.  One JSON line per prefix.

Usage: python runs/stage_breakdown.py [--batch 96] [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused-stages", type=str, default="")
    ap.add_argument("--fused-stem", action="store_true")
    ap.add_argument("--only", type=str, default="",
                    help="comma list of prefixes to run (delta_ms is only "
                         "meaningful vs the previous prefix in the list)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uemda_tpu.infer import fastpath as fp
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
    fused = tuple(int(s) for s in args.fused_stages.split(",") if s)
    meta, params = fp.build_serving_params(
        model, variables, dtype=dtype, fused_stages=fused,
        fused_stem=args.fused_stem,
        s2b_layer4=False,  # match build_fastpath's production default
    )

    def head_prefix(feat, params, upto: str):
        """PPM head sub-prefix on the final feature map (single-group,
        non-cascade PPM path of serving_forward)."""
        g_params = params["head_groups"][0]
        g_size = meta["head_group_sizes"][0]
        if meta["is_ins_norm"]:
            feat = fp._instance_norm_fast(feat)
        if upto == "insnorm":
            return feat
        h, w = feat.shape[1], feat.shape[2]
        acc = fp._conv_any(feat, g_params["last_feat"])
        if upto == "headgemm":
            return acc
        pooled = fp.adaptive_avg_pool_multi(feat, meta["pool_scales"])
        if upto == "pools":
            return acc + sum(jnp.sum(p) for p in pooled.values())
        both = {
            sc: jax.nn.relu(fp._conv_any(pooled[sc], g_params["ppm_scales"][sc]))
            for sc in meta["pool_scales"]
        }
        if upto == "both":
            return acc + sum(jnp.sum(p) for p in both.values())
        us = fp._ppm_pooled_heads(both, g_params, g_size,
                                  meta["pool_scales"], h, w, feat.dtype)
        acc = jax.nn.relu(acc + us)
        if upto == "ppm":
            return acc
        logits = [
            fp._conv(acc[..., hi * 512:(hi + 1) * 512],
                     **g_params["classifier"][hi])
            for hi in range(g_size)
        ]
        return jnp.concatenate(logits, axis=-1)  # upto == "logits"

    def prefix_forward(params, x, upto: str):
        """serving_forward's stem + stages, stopping after `upto`."""
        def s2d_pad(w):
            k = w.shape[0]
            return ((k // 2, (k - 1) // 2),) * 2

        y = fp._space_to_depth(x)
        if meta.get("fused_stem") and "stem_fused" in params:
            from uemda_tpu.ops.pallas_stem import pack_cw, stem_pool_pallas

            sf = params["stem_fused"]
            y = stem_pool_pallas(pack_cw(y), sf["w"], sf["b"])
        elif meta["deep_stem"]:
            stems = params["deep_stem"]
            y = jax.nn.relu(fp._conv(y, **stems[0], pad=s2d_pad(stems[0]["w"])))
            y = jax.nn.relu(fp._conv(y, **stems[1]))
            y = jax.nn.relu(fp._conv(y, **stems[2]))
            y = fp._max_pool_3x3_s2(y)
        else:
            y = jax.nn.relu(fp._conv(y, **params["stem"],
                                     pad=s2d_pad(params["stem"]["w"])))
            y = fp._max_pool_3x3_s2(y)
        if upto == "stem":
            return y
        plan = fp.stage_plan(meta["output_stride"])
        for li in range(4 if meta["include_conv5"] else 3):
            stride, dilate = plan[li]
            y = fp._stage_forward(y, params[f"layer{li + 1}"], meta, stride,
                                  dilate, s2b=meta["s2b_layer4"], li=li + 1)
            if upto == f"layer{li + 1}":
                return y
        return head_prefix(y, params, upto)

    prefixes = ["stem", "layer1", "layer2", "layer3", "layer4",
                "insnorm", "headgemm", "pools", "both", "ppm",
                "logits", "full"]
    if args.only:
        only = set(args.only.split(","))
        prefixes = [p for p in prefixes if p in only]
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(args.batch, 512, 512, 3)), dtype)

    prev_ms = 0.0
    for upto in prefixes:
        if upto == "full":
            fn = lambda p, v: fp.serving_forward(meta, p, v)
        else:
            fn = lambda p, v, _u=upto: prefix_forward(p, v, _u)

        @jax.jit
        def chained(p, v):
            def body(c, _):
                out = fn(p, v + c.astype(v.dtype))
                return jnp.mean(out.astype(jnp.float32)) * 1e-6, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.iters)
            return c

        c = chained(params, x0)
        float(c)  # sync through the tunnel
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chained(params, x0))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.iters * 1e3
        print(json.dumps({
            "metric": f"prefix_{upto}_ms", "value": round(ms, 2),
            "delta_ms": round(ms - prev_ms, 2),
            "per_tile_us": round((ms - prev_ms) / args.batch * 1e3, 1),
            "batch": args.batch,
        }), flush=True)
        prev_ms = ms


if __name__ == "__main__":
    main()
