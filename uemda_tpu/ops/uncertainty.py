"""Pixel-entropy uncertainty and the UVEM valuable-example weight curve.

Reproduces ``UVEMLoss`` internals (reference ``uemda/gast/balance.py:345-423``):
  u = -sum_c p_c * log(p_c)                 (entropy of the refined soft label)
  w(u) = clamp(-1/m^2      * (u - m)^2 + 1, 0, 1) ^ (1/gamma)   for u <= m
       = clamp(-1/(t-m)^2  * (u - m)^2 + 1, 0, 1) ^ (1/gamma)   for m < u < t
       = 0                                                       for u >= t

This is a pure element-wise pipeline — under jit XLA fuses it into the
surrounding loss computation; the fused Pallas kernel variant for the
standalone mining pass is ``uemda_tpu.ops.pallas_kernels.uvem_mine_pallas``
(entropy + UVEM weight + pseudo selection in one read/write).
"""

import jax.numpy as jnp


def pixel_entropy(probs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """u = -sum p log p with the reference's raw log (p=0 -> 0 contribution
    guarded; reference relies on p>0 from softmax, we guard explicitly)."""
    p = probs.astype(jnp.float32)
    logp = jnp.log(jnp.maximum(p, 1e-30))
    return -(p * logp).sum(axis=axis)


def uvem_weight(
    u: jnp.ndarray, m: float = 0.2, threshold: float = 0.7, gamma: float = 4.0
) -> jnp.ndarray:
    """Piecewise-parabola valuable-example weight (``balance.py:396-423``)."""
    u = u.astype(jnp.float32)

    if m > 0:
        # reference fills out-of-branch entries with 1 before the parabola;
        # those entries are discarded by the final select, so apply directly.
        left = jnp.clip(-1.0 / (m * m) * (u - m) ** 2 + 1.0, 0.0, 1.0)
        left = left ** (1.0 / gamma)
    else:
        left = jnp.ones_like(u)

    if m < threshold:
        x = jnp.where((u > m) & (u <= threshold), u, 0.0)
        right = jnp.clip(
            -1.0 / ((threshold - m) ** 2) * (x - m) ** 2 + 1.0, 0.0, 1.0
        )
        right = right ** (1.0 / gamma)
    else:
        right = jnp.zeros_like(u)

    w = jnp.where(u <= m, left, right)
    return jnp.where(u >= threshold, 0.0, w)
