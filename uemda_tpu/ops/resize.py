"""Bilinear resize and adaptive pooling as separable matmuls.

The reference uses ``torch.nn.functional.interpolate(mode='bilinear')`` in two
flavours — ``align_corners=True`` for logit/label upsampling (reference
``uemda/models/Encoder.py:141-142``, ``uemda/utils/tools.py:250``) and
``align_corners=False`` inside the PPM head (``uemda/models/Encoder.py:48-51``)
— plus ``nn.AdaptiveAvgPool2d`` for the PPM pyramid scales
(``uemda/models/Encoder.py:18``).

On TPU we express all three as *separable dense matmuls*: a static (H_out,
H_in) interpolation matrix applied along H, then one along W. The matrices are
built with numpy at trace time (shapes are static under jit), so XLA constant-
folds them and the resize runs on the MXU as two batched GEMMs — far better
than gather-based resampling on this hardware.

Layout: NHWC.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense 1-D bilinear interpolation matrix M with y = M @ x.

    Matches torch.nn.functional.interpolate(mode='bilinear') exactly for both
    align_corners settings (no antialiasing, matching torch's default).
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 and align_corners:
        m[0, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=128)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense 1-D adaptive average pooling matrix (torch AdaptiveAvgPool2d bins:
    bin i covers [floor(i*H/s), ceil((i+1)*H/s)))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def _apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply (H_out,H_in) and (W_out,W_in) matrices to an NHWC tensor."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mh = jnp.asarray(mh)
    mw = jnp.asarray(mw)
    # full-f32 accumulation: interpolation must not round through bf16
    hp = jax.lax.Precision.HIGHEST
    # contract H: (B,H,W,C) x (Ho,H) -> (B,Ho,W,C)
    x = jnp.einsum(
        "bhwc,oh->bowc", x, mh, preferred_element_type=jnp.float32, precision=hp
    )
    # contract W: (B,Ho,W,C) x (Wo,W) -> (B,Ho,Wo,C)
    x = jnp.einsum(
        "bhwc,ow->bhoc", x, mw, preferred_element_type=jnp.float32, precision=hp
    )
    return x.astype(dtype)


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple, align_corners: bool = True
) -> jnp.ndarray:
    """Bilinear NHWC resize matching torch interpolate semantics."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = _interp_matrix(h_in, h_out, align_corners)
    mw = _interp_matrix(w_in, w_out, align_corners)
    return _apply_separable(x, mh, mw)


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d equivalent for NHWC tensors."""
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    _, h_in, w_in, _ = x.shape
    mh = _adaptive_avg_matrix(h_in, int(out_hw[0]))
    mw = _adaptive_avg_matrix(w_in, int(out_hw[1]))
    return _apply_separable(x, mh, mw)


@functools.lru_cache(maxsize=32)
def _multi_pool_matrix(h_in: int, w_in: int, scales: tuple):
    """(sum_s s^2, h_in*w_in) 0/1 bin-indicator matrix + (sum_s s^2,) f32
    reciprocal bin sizes + per-scale row offsets, for every pyramid scale
    at once. The indicator entries are EXACT in bf16, so the pooling GEMM
    runs native bf16 on the MXU; the 1/count scaling is a tiny f32
    elementwise pass on the pooled output."""
    rows = sum(s * s for s in scales)
    n = np.zeros((rows, h_in, w_in), np.float32)
    dinv = np.zeros((rows,), np.float32)
    offs, off = [], 0
    for s in scales:
        for sh in range(s):
            hlo, hhi = (sh * h_in) // s, -(-((sh + 1) * h_in) // s)
            for sw in range(s):
                wlo, whi = (sw * w_in) // s, -(-((sw + 1) * w_in) // s)
                r = off + sh * s + sw
                n[r, hlo:hhi, wlo:whi] = 1.0
                dinv[r] = 1.0 / ((hhi - hlo) * (whi - wlo))
        offs.append(off)
        off += s * s
    return n.reshape(rows, h_in * w_in), dinv, tuple(offs)


def adaptive_avg_pool_multi(x: jnp.ndarray, scales) -> dict:
    """All PPM pyramid scales with ONE native-dtype read of ``x``.

    ``adaptive_avg_pool`` per scale casts the full (B, H, W, C) map to f32
    and contracts it once per scale; on the serving feat that measured
    68-83 us/tile (runs/stage_breakdown.py). Here the 2-D pooling operator
    for EVERY scale factors into a single (sum_s s^2, H*W) 0/1 indicator
    GEMM (exact in bf16 — products of exact values, f32 accumulation, same
    math as the f32 path up to summation order) followed by a 1/count
    scale on the tiny pooled output: one HBM read, one MXU-native GEMM."""
    scales = tuple(int(s) for s in scales)
    b, h_in, w_in, c = x.shape
    n, dinv, offs = _multi_pool_matrix(h_in, w_in, scales)
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    t = jnp.einsum(
        "ph,bhc->bpc", jnp.asarray(n, x.dtype), x.reshape(b, h_in * w_in, c),
        preferred_element_type=jnp.float32, precision=prec,
    )
    t = t * jnp.asarray(dinv)[None, :, None]
    return {
        s: t[:, off:off + s * s].reshape(b, s, s, c).astype(x.dtype)
        for s, off in zip(scales, offs)
    }


def upsample_logits(logits: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Head-logit upsampling: bilinear, align_corners=True (reference
    ``Encoder.py:141-142`` / ``tools.py:249-250``)."""
    return resize_bilinear(logits, out_hw, align_corners=True)
