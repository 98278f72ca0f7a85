"""Fused eval-tail kernel: W-upsample + per-head softmax + head average.

STATUS: measured alternate, NOT wired into the serving path. On v5e at
batch 128 it TIES XLA (82.4 vs 83.4 us/tile) — the tail is VPU-bound on
the full-resolution softmax exponentials (~400M exps/batch), not
HBM-bound, so removing the materialized full-res logits buys nothing XLA
hasn't already pipelined. An earlier variant that transposed (C, Wo) ->
(Wo, C) inside the kernel measured 231 us/tile: Mosaic minor-dim
relayouts at these shapes are catastrophic — this version writes
channel-major and lets XLA do the final NHWC transpose. Kept as the
record of that measurement and as a starting point if the tail ever
becomes memory-bound (e.g. many more classes/heads).

The serving eval tail it mirrors (``infer/fastpath.serving_forward``,
reference semantics ``uemda/models/Encoder.py:152-155``): upsample the
concatenated head logits to input resolution (bilinear,
align_corners=True), softmax each head, average. Here the H-expansion
stays an XLA einsum (64x smaller than full res) and the kernel consumes
the H-expanded channel-major tensor: per (image, row-block) it W-expands
with the f32 interpolation matrix on the MXU and softmaxes in f32 VMEM —
the full-resolution logits never exist in HBM. Math note: the XLA path
rounds the upsampled logits to bf16 before the softmax; this kernel
softmaxes unrounded f32 and rounds once at the output (max |diff| vs XLA
0.008 on bf16 inputs; exact in f32 interpret mode).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _tail_kernel(g: int, nc: int, t_ref, uw_ref, o_ref):
    """t_ref: (1, R, g*nc, Wi) f32 H-expanded channel-major logits;
    uw_ref: (Wo, Wi) f32 W-interpolation matrix; o_ref: (1, R, nc, Wo)
    channel-major probabilities."""
    t = t_ref[0]                                     # (R, g*nc, Wi)
    uw = uw_ref[...]                                 # (Wo, Wi)
    r = t.shape[0]
    acc = None
    for hi in range(g):
        x = t[:, hi * nc:(hi + 1) * nc, :]           # (R, nc, Wi)
        # W-expand on the MXU: (R*nc, Wi) @ (Wi, Wo) — tiny K, f32
        up = jax.lax.dot_general(
            x.reshape(r * nc, x.shape[2]), uw,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(r, nc, -1)                         # (R, nc, Wo)
        m = jnp.max(up, axis=1, keepdims=True)
        e = jnp.exp(up - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        acc = p if acc is None else acc + p
    o_ref[0] = (acc / g).astype(o_ref.dtype)


def tail_upsample_softmax_mean(
    cat: jnp.ndarray, out_hw, g: int, nc: int
) -> jnp.ndarray:
    """Drop-in for serving_forward's eval tail: ``cat`` is the (B, Hi, Wi,
    g*nc) concatenated head logits; returns (B, Ho, Wo, nc) averaged
    per-head softmax probabilities in ``cat.dtype``."""
    from uemda_tpu.ops.resize import _interp_matrix

    ho, wo = int(out_hw[0]), int(out_hw[1])
    b, hi, wi, gc = cat.shape
    assert gc == g * nc, f"cat has {gc} channels, expected g*nc={g * nc}"
    mh = _interp_matrix(hi, ho, True)
    t = jnp.einsum(
        "bhwc,oh->bowc", cat.astype(jnp.float32), jnp.asarray(mh),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 1, 3, 2)                          # (B, Ho, g*nc, Wi)
    r = next(cand for cand in (16, 8, 4, 2, 1) if ho % cand == 0)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, g, nc),
        grid=(b, ho // r),
        in_specs=[
            pl.BlockSpec((1, r, gc, wi), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((wo, wi), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, nc, wo), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ho, nc, wo), cat.dtype),
        interpret=jax.devices()[0].platform == "cpu",
    )(t, jnp.asarray(_interp_matrix(wi, wo, True)))
    return out.transpose(0, 1, 3, 2)                 # NHWC
