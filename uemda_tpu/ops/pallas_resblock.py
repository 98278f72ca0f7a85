"""Fused identity-bottleneck residual block (Pallas, serving fast path).

The round-1 XProf eval trace put the early ResNet stages at ~37% MXU — they
are HBM-bandwidth-bound: XLA executes the bottleneck block
(1x1 -> 3x3 -> 1x1 + skip, ``uemda/_resnets.py:72-112``) as three separate
convs, each doing a full HBM round trip of the activation.  This kernel
keeps the whole block in VMEM: the input row band (with a 1-row halo for
the 3x3) is DMA'd from HBM ONCE, the three GEMMs + biases + ReLUs + the
residual add all run on-chip, and only the output band is written back —
~3x less activation traffic for the identity blocks of layer1/layer2.

Math matches the XLA fast path's rounding: bf16 operands, f32 conv
accumulation, conv outputs rounded to the serving dtype BEFORE the
dtype-cast bias add and residual add — the exact epilogue of
``fastpath._conv``/``_block_forward``.  (The 3x3's f32 accumulator sums the
nine taps in a different order than XLA's conv, which can differ by ~1 ulp
f32 pre-round.)  The 3x3 runs as three (R*W, Cmid) x (Cmid, 3*Cmid) MXU
GEMMs — row taps contracted per-GEMM, column taps stacked in the output
dim and resolved by post-GEMM sublane shifts (no im2col concat: a lane-
axis concat of 64-channel pieces lowers as per-piece relayouts).

Mosaic layout rule that shapes this kernel: a memref slice offset in the
sublane (second-minor) dim must be a multiple of the 8-row tile, so the
VMEM scratch holds ONLY image columns (width w, aligned, dense DMA) and
the 3x3's +-1 column shifts run at VALUE level (``jnp.roll`` + edge mask,
a sublane rotate) instead of storing a 1-column halo at offset 1.

Applies ONLY to identity bottleneck blocks: stride 1, groups 1, no
downsample branch, Cin == Cout (true for every non-first block of every
stage); the 3x3 may be dilated (halo/shifts scale with the dilation, the
plan for DeeplabV2's dilated layer3/layer4).  Opt-in from the serving fast path (build_fastpath(fused_blocks=..))
— A/B-measure on chip before enabling by default (the in-step-measurement
rule: trace-visible copies can be overlapped time).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_band_rows(h: int, w: int, cin: int, cmid: int, dil: int = 1,
                    budget_bytes: int = 12 * 1024 * 1024) -> int:
    """Largest row-band R dividing h whose working set fits the budget
    (Mosaic's scoped-vmem stack limit is 16M; the accounting below tracks
    every live vector value, measured within ~20% of the compiler's
    number on the layer1/layer2 shapes).  R >= dil so each interior band's
    halo lies entirely in the neighbouring bands."""
    def band_bytes(r):
        xin = 2 * (r + 2 * dil) * w * cin * 2  # scratch ref + loaded value
        y1 = (r + 2 * dil) * w * cmid * 2
        # conv2 g accumulator (f32, 3*cmid lane-padded) + shifted parts
        taps = r * w * (-(-3 * cmid // 128) * 128) * 4 + 2 * r * w * 128 * 4
        acc = r * w * cmid * 4
        y3f32 = r * w * cin * 4           # conv3's f32 dot result
        out = 3 * r * w * cin * 2         # value + double-buffered blocks
        return xin + y1 + taps + acc + y3f32 + out

    # largest divisor of h whose band fits the budget; dil always divides
    # the spatial sizes in practice (h is a power-of-two multiple of dil)
    for r in sorted((d for d in range(dil, h + 1) if h % d == 0),
                    reverse=True):
        if band_bytes(r) <= budget_bytes:
            return r
    return dil


def _kernel(x_hbm, w1, b1, w2, b2, w3, b3, out_ref, xin, sem,
            *, rows, h, w, cin, cmid, n_bands, dil):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    # --- haloed row-band DMA (HBM -> VMEM) ---
    # xin holds ONLY image columns (full width w): the destination slice is
    # sublane-aligned and the copy is dense.  Out-of-image halo ROWS (dil on
    # each side) are zeroed by ref writes on dim 0 (untiled); the 3x3's
    # column padding is applied at value level below.
    def copy(src_rows_start, n, dst_start):
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(src_rows_start, n), :, :],
            xin.at[pl.ds(dst_start, n), :, :],
            sem,
        )
        cp.start()
        cp.wait()

    def zero_rows(start):
        for i in range(dil):
            xin[start + i, :, :] = jnp.zeros((w, cin), xin.dtype)

    if n_bands == 1:
        zero_rows(0)
        zero_rows(rows + dil)
        copy(0, rows, dil)
    else:
        @pl.when(ri == 0)
        def _():
            zero_rows(0)
            copy(0, rows + dil, dil)

        @pl.when(ri == n_bands - 1)
        def _():
            zero_rows(rows + dil)
            copy(h - rows - dil, rows + dil, 0)

        @pl.when((ri > 0) & (ri < n_bands - 1))
        def _():
            copy(ri * rows - dil, rows + 2 * dil, 0)

    xall = xin[...]  # (R+2*dil, W, Cin) bf16

    # conv1 (1x1) + bias + relu on the haloed rows so the 3x3 sees its
    # halo.  Rounding matches fastpath._conv exactly: the f32-accumulated
    # conv output is rounded to the serving dtype FIRST, then the bias is
    # added in that dtype (fastpath.py:_conv `y + b.astype(x.dtype)`).
    dt = xall.dtype
    y1 = jax.lax.dot_general(
        xall.reshape(-1, cin), w1[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b1[...].astype(dt)
    y1 = jnp.maximum(y1, 0).reshape(rows + 2 * dil, w, cmid)
    # the 3x3's zero padding applies AFTER conv1: at out-of-image halo rows
    # conv1 of the zeroed x gives relu(b1), which must be forced back to 0
    # (top dil rows only on the first band, bottom dil rows only on the
    # last — interior halo rows hold real neighbor-band values)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows + 2 * dil, w, 1), 0)
    invalid = ((ri == 0) & (row < dil)) | (
        (ri == n_bands - 1) & (row >= rows + dil)
    )
    y1 = jnp.where(invalid, jnp.zeros_like(y1), y1)

    # conv2 (3x3, pad dil) as three row-tap GEMMs with the COLUMN taps
    # stacked in the weight's output dim: g[.., dx*Cmid+co] = sum_dy
    # y1[r+dy'] @ W[dy, dx], then out[c] = sum_dx shift_dx(g_dx)[c].  The
    # first fused version im2col'd all nine taps into one (R*W, 9*Cmid)
    # operand — a lane-axis concat of 64-channel pieces that Mosaic
    # lowers as per-piece relayouts, and nine live tap buffers; this form
    # has NO input concat (row taps are free leading-dim slices of y1) and
    # the column shifts run once on the f32 GEMM output (sublane rotates,
    # wrapped column masked to the conv's zero padding).
    g = None
    for dy in range(3):
        lhs = y1[dy * dil:dy * dil + rows].reshape(rows * w, cmid)
        r = jax.lax.dot_general(
            lhs, w2[dy * cmid:(dy + 1) * cmid, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # (R*W, 3*Cmid) f32
        g = r if g is None else g + r
    g = g.reshape(rows, w, 3 * cmid)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w, 1), 1)
    acc = None
    for dx in range(3):
        part = g[..., dx * cmid:(dx + 1) * cmid]
        if dx == 0:  # output col c reads input col c-dil
            part = jnp.where(
                col < dil, jnp.zeros_like(part),
                jnp.roll(part, dil, axis=1),
            )
        elif dx == 2:  # output col c reads input col c+dil
            part = jnp.where(
                col >= w - dil, jnp.zeros_like(part),
                jnp.roll(part, -dil, axis=1),
            )
        acc = part if acc is None else acc + part
    acc = acc.reshape(rows * w, cmid)
    y2 = jnp.maximum(acc.astype(dt) + b2[...].astype(dt), 0)

    # conv3 (1x1) + bias, then the residual add in the serving dtype — the
    # same dtype semantics as _block_forward's `relu(y + identity)`
    y3 = jax.lax.dot_general(
        y2, w3[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt) + b3[...].astype(dt)
    identity = xall[dil:rows + dil].reshape(-1, cin)
    out = jnp.maximum(y3 + identity, 0)
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, w, cin)


def bottleneck_identity_pallas(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    band_rows: int = 0,
    dilation: int = 1,
) -> jnp.ndarray:
    """x (B, H, W, C); w1 (1,1,C,Cm), w2 (3,3,Cm,Cm), w3 (1,1,Cm,C) HWIO
    conv kernels (BN already folded; biases f32).  Returns
    relu(conv3(relu(conv2(relu(conv1(x))))) + x) exactly like the XLA path
    in ``infer/fastpath._block_forward``; the 3x3 runs at ``dilation`` with
    SAME padding (= padding dilation), the plan for the dilated stages of
    ``uemda/_resnets.py:72-112``."""
    b, h, w, cin = x.shape
    cmid = w1.shape[-1]
    dil = int(dilation)
    assert w1.shape[:2] == (1, 1) and w3.shape[:2] == (1, 1)
    assert w2.shape[:2] == (3, 3) and w3.shape[-1] == cin, (w2.shape, w3.shape)
    assert 1 <= dil <= min(h, w), (dil, h, w)
    rows = band_rows or _pick_band_rows(h, w, cin, cmid, dil)
    assert h % rows == 0 and rows >= dil, (h, rows, dil)
    n_bands = h // rows
    interpret = jax.devices()[0].platform == "cpu"

    w1m = w1.reshape(cin, cmid)
    # rows dy*cmid+ci, cols dx*cmid+co: the kernel's per-dy GEMMs contract
    # ci and produce all three column taps stacked in the output dim
    w2m = w2.transpose(0, 2, 1, 3).reshape(3 * cmid, 3 * cmid)
    w3m = w3.reshape(cmid, cin)
    b1r = b1.reshape(1, cmid).astype(jnp.float32)
    b2r = b2.reshape(1, cmid).astype(jnp.float32)
    b3r = b3.reshape(1, cin).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((cin, cmid), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, cmid), lambda bi, ri: (0, 0)),
            pl.BlockSpec((3 * cmid, 3 * cmid), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, cmid), lambda bi, ri: (0, 0)),
            pl.BlockSpec((cmid, cin), lambda bi, ri: (0, 0)),
            pl.BlockSpec((1, cin), lambda bi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w, cin), lambda bi, ri: (bi, ri, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * dil, w, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, h=h, w=w, cin=cin, cmid=cmid,
            n_bands=n_bands, dil=dil,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cin), x.dtype),
        interpret=interpret,
    )(x, w1m, b1r, w2m, b2r, w3m, b3r)
