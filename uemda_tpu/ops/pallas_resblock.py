"""Fused identity-bottleneck residual block (Pallas, serving fast path).

The round-1 XProf eval trace put the early ResNet stages at ~37% MXU — they
are HBM-bandwidth-bound: XLA executes the bottleneck block
(1x1 -> 3x3 -> 1x1 + skip, ``uemda/_resnets.py:72-112``) as three separate
convs, each doing a full HBM round trip of the activation.  This kernel
keeps the whole block in VMEM: the input row band is read ONCE, the three
GEMMs + biases + ReLUs + the residual add all run on-chip, and only the
output band is written back — ~3x less activation traffic for the identity
blocks of layer1/layer2.

Pipelining (the lesson of the first on-chip A/B, where a manual
``make_async_copy`` + immediate wait per band lost 9% end-to-end to XLA):
ALL inputs arrive via BlockSpecs so Mosaic double-buffers the fetches
against compute.  The row halo the 3x3 needs comes from two extra
dil-row-tall views of the same input array — ``prev_tail`` (last dil rows
of the band above) and ``next_head`` (first dil rows of the band below),
block-aligned because ``rows % dil == 0`` — assembled around the current
band at value level.  Out-of-image halo rows are masked to the conv's zero
padding; the halo blocks' index maps clamp at the array edges.

Math matches the XLA fast path's rounding: bf16 operands, f32 conv
accumulation, conv outputs rounded to the serving dtype BEFORE the
dtype-cast bias add and residual add — the exact epilogue of
``fastpath._conv``/``_block_forward``.  (The 3x3's f32 accumulator sums the
nine taps in a different order than XLA's conv, which can differ by ~1 ulp
f32 pre-round.)  The 3x3 runs as three (R*W, Cmid) x (Cmid, 3*Cmid) MXU
GEMMs — row taps contracted per-GEMM, column taps stacked in the output
dim and resolved by post-GEMM sublane shifts (no im2col concat: a lane-
axis concat of 64-channel pieces lowers as per-piece relayouts).

Applies ONLY to identity bottleneck blocks: stride 1, groups 1, no
downsample branch, Cin == Cout (true for every non-first block of every
stage); the 3x3 may be dilated (halo/shifts scale with the dilation, the
plan for DeeplabV2's dilated layer3/layer4).  Opt-in from the serving fast
path (build_fastpath(fused_stages=..)) — A/B-measure on chip before
enabling by default (the in-step-measurement rule: trace-visible copies can
be overlapped time).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-vmem limit is 16M; the serving kernels request
# more so the row bands (and with them the per-grid-step overhead
# amortization) can grow.  Raised empirically — v5e accepts 32M.
_VMEM_LIMIT = 32 * 1024 * 1024


def _pick_band_rows(h: int, w: int, cin: int, cmid: int, dil: int = 1,
                    budget_bytes: int = _VMEM_LIMIT) -> int:
    """Largest row-band R dividing h whose working set fits the budget.
    The accounting tracks every live vector value plus Mosaic's
    double-buffered input/output blocks (measured within ~25% of the
    compiler's number on the layer1/layer2 shapes).  R must be a multiple
    of dil so the halo blocks are block-aligned."""
    lanepad = -(-cin // 128) * 128

    def band_bytes(r):
        blocks = 2 * r * w * cin * 2 + 4 * dil * w * cin * 2  # dbuf in
        xall = (r + 2 * dil) * w * cin * 2
        y1 = (r + 2 * dil) * w * cmid * 2
        # conv2 f32 accumulator g (3*cmid lane-padded) + shifted parts
        taps = r * w * (-(-3 * cmid // 128) * 128) * 4 + 2 * r * w * 128 * 4
        acc = r * w * cmid * 4
        y3f32 = r * w * lanepad * 4       # conv3's f32 dot result
        out = 3 * r * w * cin * 2         # value + double-buffered blocks
        return blocks + xall + y1 + taps + acc + y3f32 + out

    for r in sorted((d for d in range(dil, h + 1)
                     if h % d == 0 and d % dil == 0), reverse=True):
        if band_bytes(r) <= budget_bytes:
            return r
    return dil


def _kernel(prev_tail, cur, next_head, w1, b1, w2, b2, w3, b3, out_ref,
            *, rows, w, cin, cmid, n_bands, dil):
    ri = pl.program_id(1)

    # --- haloed band at value level (all blocks Mosaic-pipelined) ---
    # out-of-image halo rows are the conv's zero padding; interior halo
    # rows hold real neighbor-band values (index maps clamp at the edges,
    # the clamped fetch is masked here)
    top = jnp.where(ri == 0, jnp.zeros_like(prev_tail[0]), prev_tail[0])
    bot = jnp.where(
        ri == n_bands - 1, jnp.zeros_like(next_head[0]), next_head[0]
    )
    xall = jnp.concatenate([top, cur[0], bot], axis=0)  # (R+2*dil, W, Cin)

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
    assert h % rows == 0 and rows >= dil and rows % dil == 0, (h, rows, dil)
    n_bands = h // rows
    nh = h // dil  # halo-block grid extent along rows
    q = rows // dil
    interpret = jax.devices()[0].platform == "cpu"

    w1m = w1.reshape(cin, cmid)
    # rows dy*cmid+ci, cols dx*cmid+co: the kernel's per-dy GEMMs contract
    # ci and produce all three column taps stacked in the output dim
    w2m = w2.transpose(0, 2, 1, 3).reshape(3 * cmid, 3 * cmid)
    w3m = w3.reshape(cmid, cin)
    b1r = b1.reshape(1, cmid).astype(jnp.float32)
    b2r = b2.reshape(1, cmid).astype(jnp.float32)
    b3r = b3.reshape(1, cin).astype(jnp.float32)

    halo = (1, dil, w, cin)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, n_bands),
        in_specs=[
            # prev band's last dil rows / this band / next band's first dil
            # rows — dil-row blocks of the same array, index maps clamped
            pl.BlockSpec(
                halo, lambda bi, ri, _q=q: (bi, jnp.maximum(ri * _q - 1, 0), 0, 0)
            ),
            pl.BlockSpec((1, rows, w, cin), lambda bi, ri: (bi, ri, 0, 0)),
            pl.BlockSpec(
                halo,
                lambda bi, ri, _q=q, _n=nh: (
                    bi, jnp.minimum((ri + 1) * _q, _n - 1), 0, 0
                ),
            ),
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
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, w=w, cin=cin, cmid=cmid,
            n_bands=n_bands, dil=dil,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cin), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, x, x, w1m, b1r, w2m, b2r, w3m, b3r)
