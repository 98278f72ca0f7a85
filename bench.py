"""Headline benchmark: 512² tiles/sec/chip, sliding-window eval inference.

Measures the flagship model (ResNet-50 OS16 + dual PPM heads + instance
norm, eval-mode averaged-softmax forward — reference ``tools/eval.py`` /
``infer_single`` path) in bf16 on one chip, with forced value readback
(block_until_ready does not block through the axon tunnel).

Baseline: the reference is single-GPU PyTorch with no published numbers
(BASELINE.md); the target is >=5x an estimated A100 throughput. We estimate
the reference torch fp32/TF32 pipeline at ~200 tiles/s on A100 (≈190 GFLOPs
per 512² forward at ~25% TF32 utilization, per-window Python loop), so
vs_baseline = tiles_per_sec / (5 * 200).
"""

import json
import time

A100_REFERENCE_TILES_PER_SEC = 200.0
TARGET_MULTIPLIER = 5.0


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    import jax
    import jax.numpy as jnp

    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    cfg = DeeplabV2Config.uemda_default(num_classes=6)
    model = DeeplabV2(cfg)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, 512, 512, 3)), train=False
        )
    )()
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    variables = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
    )

    batch = 32 if on_tpu else 2
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    xs = [
        jax.random.normal(jax.random.key(i), (batch, 512, 512, 3), dtype)
        for i in range(4)
    ]
    # warmup + compile
    float(fwd(variables, xs[0]).mean())

    reps = 3 if on_tpu else 1
    t0 = time.time()
    for r in range(reps):
        for x in xs:
            float(fwd(variables, x).mean())  # readback forces completion
    dt = time.time() - t0
    tiles_per_sec = reps * len(xs) * batch / dt

    print(
        json.dumps(
            {
                "metric": "512px_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(
                    tiles_per_sec
                    / (TARGET_MULTIPLIER * A100_REFERENCE_TILES_PER_SEC),
                    4,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
