"""Fused stem conv + 3x3/s2 maxpool (Pallas, serving fast path).

The fastpath XProf trace puts the space-to-depth stem conv (~2.3 ms) and
the following maxpool (~2.1 ms) well above their HBM/MXU roofs at batch 64:
XLA materializes the (B, H/2, W/2, 64) conv output in HBM only for the pool
to read it straight back.  This kernel keeps the conv rows in VMEM and
writes ONLY the pooled output.

Layout: TPU HBM/VMEM arrays are tiled (8, 128) over the LAST TWO dims, so a
channels-minor stem input (12 or 24 channels) is stored 5-10x padded — the
first version of this kernel fed (B, H/2, W/4, 24) and died on exactly that
(Mosaic: "slice shape along dimension 3 must be aligned to tiling (128),
but is 24").  The fix is the **CW layout**: channels in the SUBLANE dim,
width in lanes —

    x_cw (B, H/2, 24, W/4),  ch = jp*12 + c  (jp = output column parity)

which is tile-dense (24 % 8 == 0, W/4 % 128 == 0 at the 512/1024 serving
tiles), so HBM traffic is the true byte count.  Consequences:

* the conv contracts channels (sublanes) against a (96, 128) weight slice
  per column shift — 3 row-batched MXU GEMMs (K = 4 ky taps x 24 ch)
  accumulated in f32;
* both column parities come out as output channels (128 = jp*64 + o), so
  the pool's stride-2 column selection is a SUBLANE split plus one lane
  roll — no strided slicing on tiled dims;
* the pool's stride-2 row selection lands on the leading (untiled) conv-row
  dim where reshapes are free.

Halo: each output band needs 3 conv rows above + 1 below; the kernel takes
the input THREE times (prev/cur/next band blocks, index maps clamped at the
edges) and assembles the haloed band at value level — no manual HBM DMA,
so Mosaic's alignment rules never see a partial tile.

Pool padding: ``models/resnet._max_pool_3x3_s2`` pads with -inf; post-ReLU
activations are >= 0, so zero padding is exact.  Rounding matches
``fastpath._conv``: f32 accumulation (per-tap adds, may differ from XLA's
single conv reduction by ~1 ulp f32 pre-round), rounded to the serving
dtype, bias added in that dtype, ReLU.

Reference behavior: stem + maxpool of ``uemda/_resnets.py:213-228`` (7x7/s2
conv, BN, ReLU, 3x3/s2 maxpool), already BN-folded and space-to-depth
re-indexed by ``fastpath._s2d_stem_kernel``.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pack_cw(y: jnp.ndarray) -> jnp.ndarray:
    """s2d stem input (B, H2, W2, 12) -> CW layout (B, H2, 24, W2//2):
    column parity folded into channels jp-major (ch = jp*12 + c), width in
    the minor (lane) dim."""
    b, h2, w2, c = y.shape
    y = y.reshape(b, h2, w2 // 2, 2, c)          # [b, i, k, jp, c]
    return y.transpose(0, 1, 3, 4, 2).reshape(b, h2, 2 * c, w2 // 2)


def pack_stem_weight(w4: np.ndarray, b4: np.ndarray):
    """Re-index the (4, 4, C, O) s2d stem kernel (pad (2,1) per axis,
    ``fastpath._s2d_stem_kernel``) for the W-paired layout: returns
    w' (3*4*2C, 2*O) with rows (qx+1)*8C + ky*2C + (jpi*C + c), qx taps in
    {-1, 0, +1} (pad (1,1)), and output channels jp*O + o, plus the bias
    tiled per parity.  qx-major row order so the kernel contracts all four
    ky taps of one column shift in a single K=8C GEMM."""
    ky_n, kx_n, c, o = w4.shape
    assert (ky_n, kx_n) == (4, 4), w4.shape
    wp = np.zeros((3, 4, 2 * c, 2 * o), w4.dtype)
    for jp in (0, 1):
        for kx in range(4):
            # output s2d col j = 2k+jp reads input s2d col j' = j + kx - 2
            dj = jp + kx - 2
            qx, jpi = dj // 2, dj % 2
            assert -1 <= qx <= 1, (jp, kx)
            wp[qx + 1, :, jpi * c:(jpi + 1) * c, jp * o:(jp + 1) * o] = \
                w4[:, kx]
    return wp.reshape(24 * c, 2 * o), np.concatenate([b4, b4])


def _pick_pool_rows(h4: int, w4_: int, budget_bytes: int = 10 * 1024 * 1024
                    ) -> int:
    """Largest pool-row band P dividing h4 whose working set fits.  The
    accounting tracks padded VMEM bytes (lane dim rounded to 128, second-
    minor to 8)."""
    w4p = -(-w4_ // 128) * 128

    def band_bytes(p):
        nc = 2 * p + 1
        blocks = 6 * (2 * p * 24 * w4p * 2)       # 3 inputs x double-buffer
        xall = (2 * p + 4) * 24 * w4p * 2
        taps = 2 * nc * 96 * w4p * 2              # xcat + 1 transient roll
        wbr = nc * 96 * 128 * 2                   # broadcast weight slice
        acc = nc * 128 * w4p * 4
        cv = nc * 128 * w4p * 2
        pool = 3 * nc * 64 * w4p * 2              # colmax + a/c_ temps
        out = 3 * p * 64 * w4p * 2                # value + dbuf out blocks
        return blocks + xall + taps + wbr + acc + cv + pool + out

    # p >= 2 so the 3-row top halo fits inside one neighbor band (2p >= 3)
    for p in sorted((d for d in range(2, h4 + 1) if h4 % d == 0),
                    reverse=True):
        if band_bytes(p) <= budget_bytes:
            return p
    return h4


def _kernel(xprev, xcur, xnext, w, b, out_ref, *, p_rows, w4_, n_bands):
    ri = pl.program_id(1)
    nc = 2 * p_rows + 1  # conv rows c_rel = 0..2P; conv row = 2*j0-1+c_rel

    # haloed band at value level: scratch-row s holds input row 2*j0-3+s
    # (j0 = ri*p_rows).  prev's tail covers the 3 rows above, next's head
    # the 1 row below; at the true edges those are the conv's zero padding.
    prev_tail = xprev[0, 2 * p_rows - 3:]          # (3, 24, W4)
    next_head = xnext[0, :1]                       # (1, 24, W4)
    prev_tail = jnp.where(ri == 0, jnp.zeros_like(prev_tail), prev_tail)
    next_head = jnp.where(
        ri == n_bands - 1, jnp.zeros_like(next_head), next_head
    )
    xall = jnp.concatenate([prev_tail, xcur[0], next_head], axis=0)

    dt = xall.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (nc, 96, w4_), 2)

    # conv: 3 row-batched (96 -> 128) GEMMs accumulated in f32 — the four
    # ky row taps of each column shift stack in the sublane (channel) dim
    # so the MXU contracts K=96 per GEMM instead of K=24 per tap.  Column
    # taps qx in {-1, 0, +1} are lane rolls with the wrapped lane masked to
    # the conv's zero padding; row taps ky are free leading-dim slices.
    xcat = jnp.concatenate(
        [xall[ky:ky + nc] for ky in range(4)], axis=1
    )                                              # (nc, 96, W4)
    acc = None
    for qxi, qx in enumerate((-1, 0, 1)):
        if qx == -1:
            patch = jnp.where(
                col == 0, jnp.zeros_like(xcat),
                jnp.roll(xcat, 1, axis=2),
            )
        elif qx == 1:
            patch = jnp.where(
                col == w4_ - 1, jnp.zeros_like(xcat),
                jnp.roll(xcat, -1, axis=2),
            )
        else:
            patch = xcat
        wb = jnp.broadcast_to(w[qxi * 96:(qxi + 1) * 96, :][None],
                              (nc, 96, 128))
        r = jax.lax.dot_general(
            wb, patch,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                          # (nc, 128, W4)
        acc = r if acc is None else acc + r
    cv = acc.astype(dt) + b[...].astype(dt)[None]  # bias (128, 1) per out-ch
    cv = jnp.maximum(cv, 0)
    # first band's c_rel==0 is the phantom conv row -1 (pool padding):
    # post-ReLU zero padding is exact
    row = jax.lax.broadcasted_iota(jnp.int32, (nc, 128, w4_), 0)
    cv = jnp.where((ri == 0) & (row == 0), jnp.zeros_like(cv), cv)

    # column pool: out col k = max(odd[k-1], even[k], odd[k]) — the parity
    # split is a sublane slice in CW layout
    even, odd = cv[:, :64], cv[:, 64:]
    col2 = jax.lax.broadcasted_iota(jnp.int32, (nc, 64, w4_), 2)
    odd_left = jnp.where(
        col2 == 0, jnp.zeros_like(odd), jnp.roll(odd, 1, axis=2)
    )
    colmax = jnp.maximum(jnp.maximum(even, odd), odd_left)  # (nc, 64, W4)

    # row pool: out row t = max(colmax[2t], colmax[2t+1], colmax[2t+2]) —
    # stride-2 on the leading (untiled) dim via free reshapes
    a = colmax[:2 * p_rows].reshape(p_rows, 2, 64, w4_)
    c_ = colmax[1:2 * p_rows + 1].reshape(p_rows, 2, 64, w4_)
    out = jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), c_[:, 1])
    out_ref[0] = out.astype(out_ref.dtype)


def stem_pool_pallas(x_cw: jnp.ndarray, w_packed: jnp.ndarray,
                     b_packed: jnp.ndarray, pool_rows: int = 0
                     ) -> jnp.ndarray:
    """x_cw (B, H/2, 24, W/4) — CW-packed s2d input (``pack_cw``); w_packed
    (288, 128)/b_packed (128,) from ``pack_stem_weight``.  Returns
    maxpool3x3s2(relu(stem_conv(x))) as NHWC (B, H/4, W/4, 64) exactly like
    fastpath's stem + pool."""
    bsz, h2, cin2, w4_ = x_cw.shape
    assert cin2 * 12 == w_packed.shape[0] and w_packed.shape[1] == 128
    h4 = h2 // 2
    p_rows = pool_rows or _pick_pool_rows(h4, w4_)
    assert h4 % p_rows == 0, (h4, p_rows)
    n_bands = h4 // p_rows
    assert p_rows >= 2 or n_bands == 1, (p_rows, n_bands)
    assert 2 * p_rows >= 3, (p_rows,)  # top halo must fit one band
    interpret = jax.devices()[0].platform == "cpu"

    block = (1, 2 * p_rows, cin2, w4_)
    out_cw = pl.pallas_call(
        functools.partial(
            _kernel, p_rows=p_rows, w4_=w4_, n_bands=n_bands,
        ),
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec(block, lambda bi, ri: (bi, jnp.maximum(ri - 1, 0), 0, 0)),
            pl.BlockSpec(block, lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec(
                block,
                lambda bi, ri, _n=n_bands: (bi, jnp.minimum(ri + 1, _n - 1), 0, 0),
            ),
            pl.BlockSpec((12 * cin2, 128), lambda bi, ri: (0, 0)),
            pl.BlockSpec((128, 1), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, p_rows, 64, w4_), lambda bi, ri: (bi, ri, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h4, 64, w4_), x_cw.dtype),
        interpret=interpret,
    )(x_cw, x_cw, x_cw, w_packed,
      b_packed.reshape(128, 1).astype(jnp.float32))
    return out_cw.transpose(0, 1, 3, 2)  # CW -> NHWC (B, H/4, W/4, 64)
