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
    # (S, T) @ (T, C) on the MXU
    out_ref[0] += jax.lax.dot_general(
        onehot, val_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _run_segment_kernel(kernel, data, segment_ids, num_segments, tile):
    # interpret mode on CPU so tests/virtual meshes exercise the same code
    interpret = jax.devices()[0].platform == "cpu"
    b, n, c = data.shape
    seg_pad = _round_up(num_segments, 128)
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
