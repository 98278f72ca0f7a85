"""Pallas TPU kernels for the superpixel segment reductions.

The reference offloads these to the torch_scatter CUDA extension
(``uemda/gast/alignment.py:187,245``). On TPU, XLA lowers segment reductions
to serialized scatters (~33 ms for the stage-3 refinement view at batch 8 /
512² / 1056 segments); these kernels instead tile the pixel stream through
VMEM and reduce against a broadcasted segment-id mask on the VPU, revisiting
a per-image (S, C) accumulator block across the pixel-tile grid.

Semantics match ``uemda_tpu.ops.segment``: empty segments hold the dtype
minimum (max) / zero (sum); callers only gather through occupied ids.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = -3.0e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_max_kernel(ids_ref, val_ref, out_ref, *, seg_pad: int, c_pad: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.full_like(out_ref, NEG)

    ids = ids_ref[0, 0, 0, :]  # (T,)
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], seg_pad), 1)
    mask = ids[:, None] == seg_iota  # (T, S)
    acc = out_ref[0]  # (S, C)
    vals = val_ref[0, 0]  # (T, C)
    cols = []
    for c in range(c_pad):
        masked = jnp.where(mask, vals[:, c:c + 1], NEG)  # (T, S)
        cols.append(masked.max(axis=0))  # (S,)
    out_ref[0] = jnp.maximum(acc, jnp.stack(cols, axis=-1))


def _seg_sum_kernel(ids_ref, val_ref, out_ref, *, seg_pad: int, c_pad: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    ids = ids_ref[0, 0, 0, :]
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], seg_pad), 1)
    onehot = (ids[:, None] == seg_iota).astype(jnp.float32)  # (T, S)
    # (S, T) @ (T, C) on the MXU; HIGHEST so f32 values are not rounded
    # through bf16 on their way into the accumulation
    out_ref[0] += jax.lax.dot_general(
        onehot, val_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _fit_tile(tile: int, seg_pad: int, budget: int = 4 * 1024 * 1024) -> int:
    """Shrink the pixel tile so the (tile, seg_pad) f32 one-hot/mask block
    stays within a VMEM budget — at large segment counts (the regime these
    kernels target) a fixed tile would not lower."""
    cap = max(128, budget // (seg_pad * 4) // 128 * 128)
    return min(tile, cap)


def _run_segment_kernel(kernel, data, segment_ids, num_segments, tile):
    # interpret mode on CPU so tests/virtual meshes exercise the same code
    interpret = jax.devices()[0].platform == "cpu"
    b, n, c = data.shape
    seg_pad = _round_up(num_segments, 128)
    tile = _fit_tile(tile, seg_pad)
    c_pad = _round_up(c, 8)
    n_pad = _round_up(n, tile)
    data = jnp.pad(
        data.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, c_pad - c))
    )
    # padded pixels get an out-of-range id -> never hit a real segment
    ids = jnp.pad(
        segment_ids.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
        constant_values=seg_pad,
    )
    n_tiles = n_pad // tile
    # shapes chosen so block last-two-dims satisfy the (8, 128) tiling rule
    ids = ids.reshape(b, n_tiles, 1, tile)
    data = data.reshape(b, n_tiles, tile, c_pad)
    out = pl.pallas_call(
        functools.partial(kernel, seg_pad=seg_pad, c_pad=c_pad),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda b_, t_: (b_, t_, 0, 0)),
            pl.BlockSpec((1, 1, tile, c_pad), lambda b_, t_: (b_, t_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, seg_pad, c_pad), lambda b_, t_: (b_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, seg_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(ids, data)
    return out[:, :num_segments, :c]


def segment_max_pallas(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    tile: int = 1024,
) -> jnp.ndarray:
    """Batched segment max: data (B, N, C), ids (B, N) -> (B, S, C)."""
    return _run_segment_kernel(
        _seg_max_kernel, data, segment_ids, num_segments, tile
    )


def segment_sum_pallas(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    tile: int = 1024,
) -> jnp.ndarray:
    """Batched segment sum: data (B, N, C), ids (B, N) -> (B, S, C)."""
    return _run_segment_kernel(
        _seg_sum_kernel, data, segment_ids, num_segments, tile
    )


def _seg_gather_kernel(ids_ref, seg_ref, out_ref, *, seg_pad: int):
    ids = ids_ref[0, 0, 0, :]  # (T,)
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], seg_pad), 1)
    onehot = (ids[:, None] == seg_iota).astype(jnp.float32)  # (T, S)
    # (T, S) @ (S, C) on the MXU — the gather-back as a one-hot matmul.
    # HIGHEST: the default precision rounds f32 operands through bf16,
    # corrupting the selected values (a gather must be exact)
    out_ref[0, 0] = jax.lax.dot_general(
        onehot, seg_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def segment_gather_pallas(
    seg_vals: jnp.ndarray, segment_ids: jnp.ndarray, tile: int = 1024,
) -> jnp.ndarray:
    """Batched gather-back: seg_vals (B, S, C), ids (B, N) -> (B, N, C),
    out[b, p] = seg_vals[b, ids[b, p]].

    XLA lowers ``take_along_axis`` over the segment axis to SparseCore
    scatter/gather plumbing with slow memory-space copies of the id map
    (~12 ms + 15 ms/copy per stage-3 step in the XProf trace); here the
    gather is a per-tile one-hot matmul that stays on the MXU."""
    interpret = jax.devices()[0].platform == "cpu"
    b, s, c = seg_vals.shape
    n = segment_ids.shape[1]
    seg_pad = _round_up(s, 128)
    tile = _fit_tile(tile, seg_pad)
    c_pad = _round_up(c, 128)  # MXU lane width; padding is free zeros
    n_pad = _round_up(n, tile)
    seg_vals = jnp.pad(
        seg_vals.astype(jnp.float32), ((0, 0), (0, seg_pad - s), (0, c_pad - c))
    )
    ids = jnp.pad(
        segment_ids.astype(jnp.int32), ((0, 0), (0, n_pad - n)),
        constant_values=seg_pad,
    )
    n_tiles = n_pad // tile
    ids = ids.reshape(b, n_tiles, 1, tile)
    out = pl.pallas_call(
        functools.partial(_seg_gather_kernel, seg_pad=seg_pad),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, tile), lambda b_, t_: (b_, t_, 0, 0)),
            pl.BlockSpec((1, seg_pad, c_pad), lambda b_, t_: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, c_pad), lambda b_, t_: (b_, t_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, tile, c_pad), jnp.float32),
        interpret=interpret,
    )(ids, seg_vals)
    return out.reshape(b, n_pad, c_pad)[:, :n, :c]


# ---------------------------------------------------------------------------
# Fused uncertainty mining: entropy + UVEM weight + per-class-threshold
# pseudo-label selection in ONE pass over the probability map (the
# BASELINE.json north-star fusion: "softmax-entropy uncertainty maps and
# per-class confidence-threshold pseudo-label mining fuse into single Pallas
# kernels"). Reference semantics: UVEMLoss internals (balance.py:356-423) and
# pseudo_selection (pseudo_generation.py:59-93).
#
# The per-(batch, class) adaptive thresholds need a global max over all
# pixels — that reduction stays in XLA (a single optimal reduce); everything
# per-pixel afterwards (entropy, gate, parabola weight, strict-threshold
# exactly-one-class selection) fuses here and is read/written once.
# ---------------------------------------------------------------------------


def _uvem_mine_kernel(
    probs_ref, thresh_ref, label_ref, w_ref, u_ref, *, c: int,
    m: float, t: float, gamma: float, ignore_label: int
):
    p = probs_ref[0].astype(jnp.float32)  # (TR, 128, C)
    th = thresh_ref[0]  # (1, C)
    logp = jnp.log(jnp.maximum(p, 1e-30))
    u = -(p * logp).sum(axis=-1)  # (TR, 128)
    over = p > th[None, :, :]  # strict, pseudo_generation.py:83
    cnt = over.sum(axis=-1)
    # Mosaic argmax only lowers for f32 inputs; the label is only consumed
    # when exactly one class is over threshold, so a masked index-sum is
    # equivalent (and VPU-cheaper) where it matters.
    class_iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    lab = jnp.where(over, class_iota, 0).sum(axis=-1).astype(jnp.int32)
    lab = jnp.where(cnt != 1, jnp.int32(ignore_label), lab)

    # piecewise-parabola valuable-example weight (balance.py:396-423)
    if m > 0:
        left = jnp.clip(-1.0 / (m * m) * (u - m) ** 2 + 1.0, 0.0, 1.0)
        left = left ** (1.0 / gamma)
    else:
        left = jnp.ones_like(u)
    if m < t:
        x = jnp.where((u > m) & (u <= t), u, 0.0)
        right = jnp.clip(-1.0 / ((t - m) ** 2) * (x - m) ** 2 + 1.0, 0.0, 1.0)
        right = right ** (1.0 / gamma)
    else:
        right = jnp.zeros_like(u)
    w = jnp.where(u <= m, left, right)
    w = jnp.where(u >= t, 0.0, w)

    label_ref[0] = lab
    w_ref[0] = w
    u_ref[0] = u


def uvem_mine_pallas(
    probs: jnp.ndarray,
    cutoff_top: float = 0.8,
    cutoff_low: float = 0.6,
    m: float = 0.2,
    threshold: float = 0.7,
    gamma: float = 4.0,
    ignore_label: int = -1,
    tile_rows: int = 8,
):
    """Fused mining pass: (B, H, W, C) softmax probs ->
    (hard labels (B, H, W) int32, UVEM weight (B, H, W) f32, entropy u f32).

    Matches ``ops.pseudo.pseudo_selection`` + ``ops.uncertainty`` exactly.
    """
    interpret = jax.devices()[0].platform == "cpu"
    b, h, w, c = probs.shape
    n = h * w
    flat = probs.reshape(b, n, c).astype(jnp.float32)
    class_max = flat.max(axis=1)  # (B, C) — XLA reduce
    thresh = jnp.maximum(class_max * cutoff_top, cutoff_low)[:, None, :]

    lane = 128
    rows = _round_up(n, lane * tile_rows) // lane
    n_pad = rows * lane
    flat = jnp.pad(flat, ((0, 0), (0, n_pad - n), (0, 0)))
    grid_r = rows // tile_rows
    p4 = flat.reshape(b, rows, lane, c)

    label, wgt, u = pl.pallas_call(
        functools.partial(
            _uvem_mine_kernel, c=c, m=m, t=threshold, gamma=gamma,
            ignore_label=ignore_label,
        ),
        grid=(b, grid_r),
        in_specs=[
            pl.BlockSpec((1, tile_rows, lane, c), lambda b_, r_: (b_, r_, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda b_, r_: (b_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_rows, lane), lambda b_, r_: (b_, r_, 0)),
            pl.BlockSpec((1, tile_rows, lane), lambda b_, r_: (b_, r_, 0)),
            pl.BlockSpec((1, tile_rows, lane), lambda b_, r_: (b_, r_, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rows, lane), jnp.int32),
            jax.ShapeDtypeStruct((b, rows, lane), jnp.float32),
            jax.ShapeDtypeStruct((b, rows, lane), jnp.float32),
        ],
        interpret=interpret,
    )(p4, thresh)
    label = label.reshape(b, n_pad)[:, :n].reshape(b, h, w)
    wgt = wgt.reshape(b, n_pad)[:, :n].reshape(b, h, w)
    u = u.reshape(b, n_pad)[:, :n].reshape(b, h, w)
    return label, wgt, u


# ---------------------------------------------------------------------------
# Fused tile crop + normalization (north-star fusion (a)): per-sample random
# crop offsets drive an async DMA of just the (th, tw) window from the full
# image in ANY/HBM into VMEM, where the IRRG mean/std normalization is
# applied and the tile written out — the full image is never copied on-chip.
# Reference: RandomCrop + Normalize (uemda/aug/augmentation.py:75-122).
# Channels are packed into the lane dimension (W*3) so the window slice is
# one contiguous 2-D DMA.
# ---------------------------------------------------------------------------


def _crop_norm_kernel(off_ref, img_ref, mean_ref, inv_std_ref, out_ref,
                      scratch, sem, *, th: int, tw3: int, interpret: bool):
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    y = off_ref[b, 0]
    x3 = off_ref[b, 1]  # pixel offset * 3 (packed channels)
    # Mosaic DMA slices in the tiled (sublane, lane) dims must be 8/128
    # aligned — DMA the aligned superset window, then rotate the sub-tile
    # remainder away in VMEM (tpu.dynamic_rotate) and take the static prefix.
    y0 = (y // 8) * 8
    x0 = (x3 // 128) * 128
    dy = y - y0
    dx = x3 - x0
    sh, sw = scratch.shape
    dma = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(y0, sh), pl.ds(x0, sw)], scratch, sem
    )
    dma.start()
    dma.wait()
    v = scratch[...]
    # shifts MUST be non-negative: Mosaic silently miscompiles negative
    # dynamic rotates on multi-tile shapes (verified on v5e, jax 0.9.0)
    if interpret:  # pltpu.roll lowers only for Mosaic; CPU tests use jnp
        v = jnp.roll(v, sh - dy, axis=0)
        v = jnp.roll(v, sw - dx, axis=1)
    else:
        v = pltpu.roll(v, sh - dy, axis=0)
        v = pltpu.roll(v, sw - dx, axis=1)
    out_ref[0] = (v[:th, :tw3] - mean_ref[0]) * inv_std_ref[0]


def crop_normalize_pallas(
    images: jnp.ndarray,  # (B, H, W, 3) raw float32
    offsets: jnp.ndarray,  # (B, 2) int32 top-left (y, x) crop origins
    crop_hw,
    mean,
    std,
):
    """Per-sample fused crop+normalize: returns (B, th, tw, 3) f32."""
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.devices()[0].platform == "cpu"
    b, h, w, ch = images.shape
    th, tw = int(crop_hw[0]), int(crop_hw[1])
    tw3 = tw * ch
    # superset window: + one sublane tile of rows, + one lane tile of cols
    sh = _round_up(th + 8, 8)
    sw = _round_up(tw3 + 128, 128)
    packed = images.reshape(b, h, w * ch).astype(jnp.float32)
    # pad so the aligned superset never reads past the image edge:
    # max row read is (y - y%8) + sh <= h + (sh - th), same for cols
    packed = jnp.pad(packed, ((0, 0), (0, sh - th), (0, sw - tw3)))
    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32), tw)[None, :]
    inv_std_row = (1.0 / jnp.tile(jnp.asarray(std, jnp.float32), tw))[None, :]
    off = jnp.stack([offsets[:, 0], offsets[:, 1] * ch], axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tw3), lambda b_, off_: (0, 0)),
            pl.BlockSpec((1, tw3), lambda b_, off_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw3), lambda b_, off_: (b_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _crop_norm_kernel, th=th, tw3=tw3, interpret=interpret
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, th, tw3), jnp.float32),
        interpret=interpret,
    )(off, packed, mean_row, inv_std_row)
    return out.reshape(b, th, tw, ch)
