"""Whole-raster spatially-sharded sliding-window inference (halo exchange).

The reference never runs the model on a full aerial raster: huge scenes
(e.g. 6000² Potsdam) are pre-tiled offline into 512² crops
(``convert_datasets/convert_potsdam.py:35-103``) and, at eval time, each
tile is processed alone through a Python window loop
(``uemda/utils/tools.py:61-97`` ``pre_slide``). This module is the
TPU-native capability the single-GPU design cannot express: the raster's
rows are sharded across the chips of a ``jax.sharding.Mesh``; each chip
runs the sliding-window (+TTA) forward for the window origins it owns,
fetching the ``tile - stride`` boundary rows it is missing from its
neighbour with a single ``ppermute`` over ICI (halo exchange), and the
overlap-accumulated probability canvas is reconciled with one reverse
``ppermute``. Nothing but the final per-shard canvas exists anywhere; no
chip ever holds the whole raster's activations.

Geometry (all static, so XLA sees fixed shapes):

  * stride = tile·(1-overlap); halo = tile - stride.
  * The raster is zero-padded to ``Hp = N·band_h`` rows (``band_h`` a
    multiple of stride, at least one window tall, ``Hp ≥ H + halo``) and
    ``Wp`` columns (grid-aligned). The result is bit-identical to running
    the single-device :func:`uemda_tpu.infer.slide.make_predictor` over the
    padded raster (the last device masks both the wrapped halo rows and its
    beyond-grid window origins, so this holds for every overlap); rows/cols
    beyond ``H``/``W`` are cropped. (The reference instead clamps its last
    window to the border — ``tools.py:74-78`` — a boundary-pixel difference
    documented in docs/MIGRATION.md.)
  * Every device owns the ``band_h/stride`` window rows whose origin falls
    in its band; a window may read up to ``halo`` rows past the band end —
    exactly what the halo exchange provides.
  * The overlap-count canvas is fully static per device and is baked in as
    a constant (devices differ only in whether the top-halo contribution
    from the previous band exists, selected by ``lax.axis_index``).

Memory per chip: ``(band_h + halo) · Wp · C`` f32 canvas + one window
chunk of activations — a 6144²/7-class raster on 8 chips is ~176 MB of
canvas, far below HBM.
"""

import functools
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from uemda_tpu.infer.slide import _unviews, _views
from uemda_tpu.parallel.mesh import DATA_AXIS


class RasterPlan:
    """Static geometry for one (raster_hw, tile, overlap, n_devices) combo."""

    def __init__(self, raster_hw, tile, overlap, n_devices):
        h, w = raster_hw
        th, tw = tile
        stride = math.ceil(th * (1 - overlap))
        if not 0 < stride <= th:
            raise ValueError(f"overlap {overlap} gives invalid stride {stride}")
        halo = th - stride
        # rows: equal bands, multiple of stride, at least one full window tall
        # (so every band is covered by its own windows), generous zero pad
        # past H+halo
        band_h = max(
            math.ceil(th / stride) * stride,
            math.ceil((h + halo) / (n_devices * stride)) * stride,
        )
        self.h, self.w = h, w
        self.th, self.tw, self.stride, self.halo = th, tw, stride, halo
        self.n_devices = n_devices
        self.band_h = band_h
        self.hp = n_devices * band_h
        self.wp = max(tw, math.ceil((w - tw) / stride) * stride + tw) if w > tw else tw
        self.local_ys = list(range(0, band_h, stride))
        self.xs = list(range(0, self.wp - tw + 1, stride))

    def origins(self, chunk: int):
        """(nwin_padded, 2) int32 local origins, (nwin_padded,) f32 validity
        mask, and (nwin_padded,) f32 'extra' flags — windows whose GLOBAL
        origin on the LAST device falls past the padded grid's final window
        (origin > Hp - tile). Those windows don't exist in the reference
        window grid; the last device masks their contribution so the result
        matches the single-device slide over the zero-padded raster for any
        overlap, not just the ones where their output rows get cropped."""
        pts = [(y, x) for y in self.local_ys for x in self.xs]
        n = len(pts)
        pad = (-n) % chunk
        pts += [(0, 0)] * pad
        mask = np.concatenate([np.ones(n), np.zeros(pad)]).astype(np.float32)
        extra = np.asarray(
            [float(y > self.band_h - self.th) for (y, _) in pts], np.float32
        )
        return np.asarray(pts, np.int32), mask, extra

    def count_canvas(self, include_extra: bool = True) -> np.ndarray:
        """Static per-device overlap counts, (band_h + halo, wp) f32 — the
        contribution of this device's own windows (identical on every
        device by construction). ``include_extra=False`` drops the windows
        flagged by :meth:`origins` (the last device's counts)."""
        cnt = np.zeros((self.band_h + self.halo, self.wp), np.float32)
        for y in self.local_ys:
            if not include_extra and y > self.band_h - self.th:
                continue
            for x in self.xs:
                cnt[y : y + self.th, x : x + self.tw] += 1.0
        return cnt


def make_raster_predictor(
    model,
    mesh,
    raster_hw: Tuple[int, int],
    tile: Tuple[int, int] = (512, 512),
    overlap: float = 0.5,
    tta: bool = False,
    window_chunk: int = 4,
    compute_dtype: str = "bfloat16",
    return_probs: bool = False,
) -> Callable:
    """Returns jitted ``fn(variables, raster_norm (H, W, 3)) ->``
    ``(H, W) int32 preds`` (or ``(H, W, C) f32 probs``), computed with the
    raster row-sharded over ``mesh`` and halo exchange over ICI."""
    n = mesh.devices.size
    plan = RasterPlan(raster_hw, tile, overlap, n)
    origins_np, wmask_np, extra_np = plan.origins(window_chunk)
    count_np = plan.count_canvas()
    count_nolast_np = plan.count_canvas(include_extra=False)
    dtype = jnp.dtype(compute_dtype)
    th, tw, halo, band_h = plan.th, plan.tw, plan.halo, plan.band_h
    fwd_perm = [(i, (i - 1) % n) for i in range(n)]  # top rows -> prev device
    bwd_perm = [(i, (i + 1) % n) for i in range(n)]  # canvas tail -> next

    def make_band_fn(num_classes):
        return functools.partial(_band_fn, num_classes)

    def _band_fn(num_classes, variables, band):
        is_first = (jax.lax.axis_index(DATA_AXIS) == 0).astype(jnp.float32)
        is_last = (jax.lax.axis_index(DATA_AXIS) == n - 1).astype(jnp.float32)

        # 1. halo exchange: fetch the next band's first `halo` rows. The last
        #    band's "next" rows are virtual zero padding, not the wrapped
        #    device-0 content the cyclic ppermute delivers — mask them.
        top = jax.lax.slice_in_dim(band, 0, halo, axis=0)
        recv = jax.lax.ppermute(top, DATA_AXIS, fwd_perm) * (1.0 - is_last)
        x = jnp.concatenate([band, recv.astype(band.dtype)], axis=0)

        origins = jnp.asarray(origins_np)
        # windows past the padded grid's last origin exist only as grid
        # padding on the last device — zero their contribution there
        wmask = jnp.asarray(wmask_np) * (1.0 - is_last * jnp.asarray(extra_np))
        n_chunks = origins.shape[0] // window_chunk

        def chunk_body(canvas, i):
            o = jax.lax.dynamic_slice(origins, (i * window_chunk, 0), (window_chunk, 2))
            m = jax.lax.dynamic_slice(wmask, (i * window_chunk,), (window_chunk,))
            tiles = jax.vmap(
                lambda p: jax.lax.dynamic_slice(x, (p[0], p[1], 0), (th, tw, 3))
            )(o)
            if tta:
                v = _views(tiles)
                probs = model.apply(
                    variables, v.reshape((-1,) + v.shape[2:]), train=False
                )
                probs = _unviews(probs.reshape((8, window_chunk) + probs.shape[1:]))
            else:
                probs = model.apply(variables, tiles, train=False)
            probs = probs.astype(jnp.float32) * m[:, None, None, None]
            for j in range(window_chunk):
                y, xx = o[j, 0], o[j, 1]
                c = probs.shape[-1]
                cur = jax.lax.dynamic_slice(canvas, (y, xx, 0), (th, tw, c))
                canvas = jax.lax.dynamic_update_slice(canvas, cur + probs[j], (y, xx, 0))
            return canvas, None

        canvas = jnp.zeros((band_h + halo, plan.wp, num_classes), jnp.float32)
        canvas, _ = jax.lax.scan(chunk_body, canvas, jnp.arange(n_chunks))

        # 2. reverse exchange: this band's tail rows belong to the next band's
        #    head; the wrap-around contribution from the last band is garbage
        #    (rows past Hp) and is masked out on device 0.
        tail = jax.lax.slice_in_dim(canvas, band_h, band_h + halo, axis=0)
        back = jax.lax.ppermute(tail, DATA_AXIS, bwd_perm)
        head = jax.lax.slice_in_dim(canvas, 0, halo, axis=0)
        canvas = jax.lax.dynamic_update_slice(
            canvas, head + back * (1.0 - is_first), (0, 0, 0)
        )

        # per-device static counts: last device drops its extra windows
        count = jnp.asarray(count_np) * (1.0 - is_last) + jnp.asarray(
            count_nolast_np
        ) * is_last
        count = count.at[:halo].add(
            jnp.asarray(count_np)[band_h : band_h + halo] * (1.0 - is_first)
        )
        probs = canvas[:band_h] / count[:band_h, :, None]
        if return_probs:
            return probs
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    # pre-folded serving params (infer/fastpath.py) keep biases/int8 scales
    # in f32 on purpose — skip the blanket downcast for them
    precast = getattr(model, "params_precast", False)

    @jax.jit
    def predict(variables, raster):
        if not precast:
            variables = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        # abstract trace only — no throwaway forward is compiled
        num_classes = jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False),
            variables,
            jax.ShapeDtypeStruct((1, th, tw, 3), dtype),
        ).shape[-1]
        sharded = jax.shard_map(
            make_band_fn(num_classes),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
        h, w = raster.shape[:2]
        raster = jnp.pad(
            raster.astype(dtype),
            ((0, plan.hp - h), (0, plan.wp - w), (0, 0)),
        )
        out = sharded(variables, raster)
        return out[: plan.h, : plan.w]

    return predict


def raster_predict(
    model,
    variables,
    raster,
    mean,
    std,
    mesh,
    tile: Tuple[int, int] = (512, 512),
    tta: bool = False,
    window_chunk: int = 4,
    compute_dtype: str = "bfloat16",
    return_probs: bool = False,
    predictor: Optional[Callable] = None,
):
    """One-shot convenience: normalize a raw (H, W, 3) raster and run the
    sharded predictor. Pass ``predictor`` to reuse a compiled plan."""
    from uemda_tpu.datasets.augment import normalize

    raster = normalize(jnp.asarray(raster)[None], mean, std)[0]
    if predictor is None:
        predictor = make_raster_predictor(
            model,
            mesh,
            raster.shape[:2],
            tile=tile,
            tta=tta,
            window_chunk=window_chunk,
            compute_dtype=compute_dtype,
            return_probs=return_probs,
        )
    # shard the padded input's rows at put time so no chip materializes it all
    return predictor(variables, raster)
