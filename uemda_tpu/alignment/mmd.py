"""MMD losses (linear + multi-kernel RBF).

Rebuild of ``uemda/gast/mmd.py:15-58`` (the criterion of the Deeplabv2_MMD
baseline family): multi-bandwidth Gaussian-kernel MMD with the median-style
bandwidth heuristic, plus the linear form. All-pairs distances are one
(N+M)² GEMM-backed computation — fixed-shape, jittable.
"""

import jax
import jax.numpy as jnp


def mmd_linear(f_x: jnp.ndarray, f_y: jnp.ndarray) -> jnp.ndarray:
    """(mmd.py:41-45): ||mean_x - mean_y||^2 / d."""
    delta = f_x.astype(jnp.float32).mean(0) - f_y.astype(jnp.float32).mean(0)
    return (delta @ delta) / delta.shape[0]


def mmd_rbf(
    source: jnp.ndarray,
    target: jnp.ndarray,
    kernel_mul: float = 2.0,
    kernel_num: int = 5,
    fix_sigma: float = None,
) -> jnp.ndarray:
    """(mmd.py:24-58): sum of Gaussian kernels over bandwidths
    {bw * mul^i}, bw = mean pairwise distance (excluding self-pairs)."""
    n = source.shape[0]
    total = jnp.concatenate([source, target], axis=0).astype(jnp.float32)
    sq = (total * total).sum(-1)
    l2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        total, total.T, precision=jax.lax.Precision.HIGHEST
    )
    l2 = jnp.maximum(l2, 0.0)
    m = total.shape[0]
    if fix_sigma:
        bandwidth = jnp.float32(fix_sigma)
    else:
        bandwidth = jax.lax.stop_gradient(l2.sum()) / (m * m - m)
    bandwidth = bandwidth / (kernel_mul ** (kernel_num // 2))
    kernels = sum(
        jnp.exp(-l2 / (bandwidth * kernel_mul ** i)) for i in range(kernel_num)
    )
    xx = kernels[:n, :n].mean()
    yy = kernels[n:, n:].mean()
    xy = kernels[:n, n:].mean()
    yx = kernels[n:, :n].mean()
    return xx + yy - xy - yx
