"""Instance norm in one HBM read + one write (Pallas, serving fast path).

The stable two-pass instance norm (``models.deeplabv2.instance_norm``,
rebuilt from the reference's ``nn.InstanceNorm2d`` defaults at
``uemda/models/Encoder.py:118-123``) streams the (B, H, W, C) feature from
HBM three times under XLA — mean pass, variance pass, normalize pass —
measured 40 us/tile on the serving feat (runs/stage_breakdown.py, v5e).

Statistics are per (sample, channel) over H x W, so a (batch,
channel-chunk) grid needs no cross-block reduction: each block holds the
FULL spatial extent for its channel slice, computes the exact two-pass f32
statistics in VMEM, and writes the normalized block — one read, one write,
~11 us/tile at the HBM roof.  Math is bit-identical to the XLA
formulation: f32 stats, mean-of-squared-deviations variance (no
E[x^2]-E[x]^2 cancellation), output rounded once to the input dtype.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _in_kernel(eps, x_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    o_ref[...] = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(o_ref.dtype)


def instance_norm_1read(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Drop-in for ``models.deeplabv2.instance_norm`` on NHWC tensors.

    Falls back to the XLA formulation when the shape does not block
    cleanly onto the (8, 128) TPU tiles (odd W, channels not a multiple of
    128) — callers never need to guard."""
    from uemda_tpu.models.deeplabv2 import instance_norm

    b, h, w, c = x.shape
    bc = next((cand for cand in (512, 256, 128)
               if c % cand == 0 and h * w * cand * 8 <= 6 * 2**20), None)
    if bc is None or w % 8:
        return instance_norm(x, eps)
    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        functools.partial(_in_kernel, eps),
        grid=(b, c // bc),
        in_specs=[pl.BlockSpec((1, h, w, bc), lambda i, j: (i, 0, 0, j))],
        out_specs=pl.BlockSpec((1, h, w, bc), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)
