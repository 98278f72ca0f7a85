"""Fused stem conv + 3x3/s2 maxpool (Pallas, serving fast path).

The fastpath XProf trace puts the space-to-depth stem conv (~2.3 ms) and
the following maxpool (~2.1 ms) well above their HBM/MXU roofs at batch 64:
XLA materializes the (B, H/2, W/2, 64) conv output in HBM (~536 MB at
512² x 64) only for the pool to read it straight back.  This kernel keeps
the conv rows in VMEM and writes ONLY the pooled (B, H/4, W/4, 64) output.

Layout trick that makes it fast: the input is space-to-depth packed 2x on H
and 4x on W — i.e. the usual 2x2 s2d (``fastpath._space_to_depth``) plus a
reshape that folds even/odd column pairs into channels (24 = jp*12 + c).
Consequences:

* the conv produces BOTH column parities as output channels (128 = jp*64+o)
  in ONE (rows*W/4, 288) x (288, 128) MXU GEMM — full 128 output lanes;
* the pool's stride-2 column selection becomes a LANE split
  (even = ch[:64], odd = ch[64:]) plus one sublane roll — no strided
  slicing on tiled dims;
* the pool's stride-2 row selection lands on the leading (untiled) dim
  where reshapes are free.

Pool padding: ``models/resnet._max_pool_3x3_s2`` pads with -inf; post-ReLU
activations are >= 0, so zero padding is exact and the masked rolls below
use zeros.  Rounding matches ``fastpath._conv``: one f32 accumulation over
all taps, rounded to the serving dtype, bias added in that dtype, ReLU
(tap order vs XLA's conv may differ by ~1 ulp f32 pre-round).

Reference behavior: stem + maxpool of ``uemda/_resnets.py:213-228`` (7x7/s2
conv, BN, ReLU, 3x3/s2 maxpool), already BN-folded and space-to-depth
re-indexed by ``fastpath._s2d_stem_kernel``.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_w_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H2, W2, C) -> (B, H2, W2//2, 2*C): fold column parity into
    channels, jp-major (ch = jp*C + c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2, c).reshape(b, h, w // 2, 2 * c)


def pack_stem_weight(w4: np.ndarray, b4: np.ndarray):
    """Re-index the (4, 4, C, O) s2d stem kernel (pad (2,1) per axis,
    ``fastpath._s2d_stem_kernel``) for the W-paired layout: returns
    w' (4, 3, 2*C, 2*O) with qx taps in {-1, 0, +1} (pad (1,1)) and
    output channels jp*O + o, plus the bias tiled per parity."""
    ky_n, kx_n, c, o = w4.shape
    assert (ky_n, kx_n) == (4, 4), w4.shape
    wp = np.zeros((4, 3, 2 * c, 2 * o), w4.dtype)
    for jp in (0, 1):
        for kx in range(4):
            # output s2d col j = 2k+jp reads input s2d col j' = j + kx - 2
            dj = jp + kx - 2
            qx, jpi = dj // 2, dj % 2
            assert -1 <= qx <= 1, (jp, kx)
            wp[:, qx + 1, jpi * c:(jpi + 1) * c, jp * o:(jp + 1) * o] = \
                w4[:, kx]
    return wp.reshape(24 * c, 2 * o), np.concatenate([b4, b4])


def _pick_pool_rows(h4: int, w4_: int, budget_bytes: int = 9 * 1024 * 1024
                    ) -> int:
    """Largest pool-row band P dividing h4 whose working set fits."""
    def band_bytes(p):
        s = 2 * p + 4
        xin = 2 * s * w4_ * 128 * 2       # scratch ref + value (24ch->128)
        taps = (2 * p + 1) * w4_ * (288 + 4 * 128) * 2
        acc = (2 * p + 1) * w4_ * 128 * 4
        pool = 4 * (2 * p + 1) * w4_ * 128 * 2
        out = 3 * p * w4_ * 128 * 2
        return xin + taps + acc + pool + out

    # p >= 2 so every interior band's input span 2*j0-3 stays in range
    for p in sorted((d for d in range(2, h4 + 1) if h4 % d == 0),
                    reverse=True):
        if band_bytes(p) <= budget_bytes:
            return p
    return h4


def _kernel(x_hbm, w, b, out_ref, xin, sem, *, p_rows, h2, w4_, cin2,
            n_bands):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    s_rows = 2 * p_rows + 4

    def copy(src_rows_start, n, dst_start):
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(src_rows_start, n), :, :],
            xin.at[pl.ds(dst_start, n), :, :],
            sem,
        )
        cp.start()
        cp.wait()

    def zero_rows(start, n):
        for i in range(n):
            xin[start + i, :, :] = jnp.zeros((w4_, cin2), xin.dtype)

    # scratch row s holds input row 2*j0 - 3 + s (j0 = ri * p_rows); rows
    # outside [0, h2) are the conv's zero padding (top 3 incl. the unused
    # input of the masked phantom conv row, bottom 1)
    if n_bands == 1:
        zero_rows(0, 3)
        zero_rows(s_rows - 1, 1)
        copy(0, h2, 3)
    else:
        @pl.when(ri == 0)
        def _():
            zero_rows(0, 3)
            copy(0, 2 * p_rows + 1, 3)

        @pl.when(ri == n_bands - 1)
        def _():
            zero_rows(s_rows - 1, 1)
            copy(h2 - 2 * p_rows - 3, 2 * p_rows + 3, 0)

        @pl.when((ri > 0) & (ri < n_bands - 1))
        def _():
            copy(2 * ri * p_rows - 3, s_rows, 0)

    xall = xin[...]  # (S, W/4, 2*Cin) bf16
    dt = xall.dtype
    nc = 2 * p_rows + 1  # conv rows c_rel = 0..2P, conv row = 2*j0-1+c_rel

    # conv as one im2col GEMM: ky in 0..3 row slices, qx in {-1,0,+1}
    # column shifts (pad (1,1) in packed columns)
    col = jax.lax.broadcasted_iota(jnp.int32, (nc, w4_, 1), 1)
    taps = []
    for ky in range(4):
        xrow = xall[ky:ky + nc]
        for qx in (-1, 0, 1):
            if qx == -1:
                patch = jnp.where(
                    col == 0, jnp.zeros_like(xrow),
                    jnp.roll(xrow, 1, axis=1),
                )
            elif qx == 1:
                patch = jnp.where(
                    col == w4_ - 1, jnp.zeros_like(xrow),
                    jnp.roll(xrow, -1, axis=1),
                )
            else:
                patch = xrow
            taps.append(patch.reshape(nc * w4_, cin2))
    cv = jax.lax.dot_general(
        jnp.concatenate(taps, axis=1), w[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b[...].astype(dt)
    cv = jnp.maximum(cv, 0).reshape(nc, w4_, 128)
    # first band's c_rel==0 is the phantom conv row -1 (pool padding):
    # post-ReLU zero padding is exact
    row = jax.lax.broadcasted_iota(jnp.int32, (nc, w4_, 1), 0)
    cv = jnp.where((ri == 0) & (row == 0), jnp.zeros_like(cv), cv)

    # column pool: out col k = max(odd[k-1], even[k], odd[k])
    even, odd = cv[..., :64], cv[..., 64:]
    odd_left = jnp.where(
        col == 0, jnp.zeros_like(odd), jnp.roll(odd, 1, axis=1)
    )
    colmax = jnp.maximum(jnp.maximum(even, odd), odd_left)  # (nc, W/4, 64)

    # row pool: out row t = max(colmax[2t], colmax[2t+1], colmax[2t+2]) —
    # stride-2 on the leading (untiled) dim via free reshapes
    a = colmax[:2 * p_rows].reshape(p_rows, 2, w4_, 64)
    c_ = colmax[1:2 * p_rows + 1].reshape(p_rows, 2, w4_, 64)
    out = jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), c_[:, 1])
    out_ref[0] = out.astype(out_ref.dtype)


def stem_pool_pallas(x_packed: jnp.ndarray, w_packed: jnp.ndarray,
                     b_packed: jnp.ndarray, pool_rows: int = 0
                     ) -> jnp.ndarray:
    """x_packed (B, H/2, W/4, 24) — 2x2 space-to-depth + W-pair packing
    (``pack_w_pairs``); w_packed (288, 128)/b_packed (128,) from
    ``pack_stem_weight``.  Returns maxpool3x3s2(relu(stem_conv(x)))
    as (B, H/4, W/4, 64) exactly like fastpath's stem + pool."""
    bsz, h2, w4_, cin2 = x_packed.shape
    assert cin2 * 12 == w_packed.shape[0] and w_packed.shape[1] == 128
    h4 = h2 // 2
    p_rows = pool_rows or _pick_pool_rows(h4, w4_)
    assert h4 % p_rows == 0, (h4, p_rows)
    n_bands = h4 // p_rows
    assert p_rows >= 2 or n_bands == 1, (p_rows, n_bands)
    interpret = jax.devices()[0].platform == "cpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(bsz, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((12 * cin2, 128), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, 128), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, p_rows, w4_, 64), lambda bi, ri: (bi, ri, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * p_rows + 4, w4_, cin2), x_packed.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, p_rows=p_rows, h2=h2, w4_=w4_, cin2=cin2,
            n_bands=n_bands,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h4, w4_, 64), x_packed.dtype),
        interpret=interpret,
    )(x_packed, w_packed, b_packed.reshape(1, 128).astype(jnp.float32))
