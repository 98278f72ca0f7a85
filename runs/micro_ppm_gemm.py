"""A/B the _ppm_pooled_heads final upsample GEMM formulations on chip.

The (h*w, sum 9*sc^2) combined tap-bilinear GEMM (infer/fastpath.py) is a
few MFLOP — the question is only HBM traffic + launch shape:
  a) bf16 hi/lo split (two MXU passes, f32 accum)  — current
  b) one f32 GEMM at Precision.HIGHEST on f32 t_all (no bf16 rounding of
     the tap-GEMM accumulations at all — strictly closer to the reference
     f32 resize+conv math)

Run (real TPU): python runs/micro_ppm_gemm.py
"""

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from uemda_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    from uemda_tpu.infer.fastpath import _pooled_upsample_matrix

    B, H, W = 128, 64, 64
    scales = (1, 2, 3, 6)
    K = sum(9 * s * s for s in scales)
    CO = 1024
    bm = _pooled_upsample_matrix(scales, H, W)          # (4096, K)
    rng = np.random.default_rng(0)
    t32 = jnp.asarray(rng.normal(size=(B, K, CO)), jnp.float32)

    hi = jnp.asarray(bm.astype(ml_dtypes.bfloat16))
    lo = jnp.asarray((bm - np.asarray(hi, np.float32)).astype(ml_dtypes.bfloat16))
    bmf = jnp.asarray(bm)

    def split_bf16(t):
        tb = t.astype(jnp.bfloat16)
        return (jnp.einsum("pk,bko->bpo", hi, tb, preferred_element_type=jnp.float32)
                + jnp.einsum("pk,bko->bpo", lo, tb, preferred_element_type=jnp.float32))

    def f32_highest(t):
        return jnp.einsum("pk,bko->bpo", bmf, t,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    for name, fn in (("hi/lo bf16", split_bf16), ("f32 HIGHEST", f32_highest)):
        g = jax.jit(lambda t, _f=fn: jax.lax.scan(
            lambda c, _: (c, _f(t + c).mean()), jnp.float32(0), None,
            length=20)[1].mean())
        float(g(t32))
        t0 = time.time()
        for _ in range(3):
            float(g(t32))
        dt = (time.time() - t0) / 3 / 20
        print(f"{name}: {dt*1e6/B:.2f} us/tile  {dt*1e3:.3f} ms/batch")

    # numerics: max |diff| vs f64 reference on one batch
    ref = np.einsum("pk,bko->bpo", bm.astype(np.float64),
                    np.asarray(t32, np.float64)[:2, :, :64])
    a = np.asarray(split_bf16(t32[:2, :, :64]), np.float64)
    b = np.asarray(f32_highest(t32[:2, :, :64]), np.float64)
    print("max|err| hi/lo :", np.abs(a - ref).max())
    print("max|err| f32H  :", np.abs(b - ref).max())


if __name__ == "__main__":
    main()
