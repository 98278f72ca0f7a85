"""Batched sliding-window inference with optional x8 TTA.

TPU-first rebuild of the reference inference hot loop
(``uemda/utils/tools.py:61-97`` ``pre_slide`` + ``:132-152`` ``tta_predict``):
the reference runs a Python loop of single-window forwards, each with 8
sequential TTA forwards. Here ALL windows of a batch of images and ALL 8
dihedral TTA views fold into ONE batched forward — (B*windows*views) tiles in
a single XLA call — then views are inverse-transformed and averaged and
windows are stitched with count-normalized overlap accumulation. Window
coordinates are static (image sizes are fixed per dataset), so stitching is
static-slice adds that XLA fuses.

The eval-mode model already returns averaged head softmax at tile resolution
(``Encoder.py:152-155``).
"""

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def window_grid(hw: Tuple[int, int], tile: Tuple[int, int], overlap: float = 0.5):
    """Static window origins replicating pre_slide's arithmetic
    (tools.py:65-79): stride = tile*(1-overlap), last window clamped."""
    h, w = hw
    th, tw = tile
    stride = math.ceil(th * (1 - overlap))
    rows = int(math.ceil(max(h - th, 0) / stride) + 1)
    cols = int(math.ceil(max(w - tw, 0) / stride) + 1)
    coords = []
    for r in range(rows):
        for c in range(cols):
            y2 = min(r * stride + th, h)
            x2 = min(c * stride + tw, w)
            y1 = max(y2 - th, 0)
            x1 = max(x2 - tw, 0)
            coords.append((y1, x1))
    return coords


# -- dihedral TTA group: ttach.Compose([HorizontalFlip, Rotate90(0/90/180/270)])
#    (tools.py:132-152). Each element g acts on NHWC tiles; mean over
#    g^{-1}(model(g(x))) for all 8 elements.


def _views(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (8, B, H, W, C): hflip in {0,1} x rot90 k in {0..3}."""
    outs = []
    for flip in (False, True):
        base = x[:, :, ::-1] if flip else x
        for k in range(4):
            outs.append(jnp.rot90(base, k=k, axes=(1, 2)))
    return jnp.stack(outs)


def _unviews(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _views on stacked outputs (8, B, H, W, C) -> mean (B,H,W,C)."""
    outs = []
    i = 0
    for flip in (False, True):
        for k in range(4):
            v = jnp.rot90(y[i], k=-k, axes=(1, 2))
            if flip:
                v = v[:, :, ::-1]
            outs.append(v)
            i += 1
    return sum(outs) / len(outs)


def make_predictor(
    model,
    tile: Tuple[int, int],
    image_hw: Tuple[int, int],
    tta: bool = False,
    overlap: float = 0.5,
    compute_dtype: str = "bfloat16",
) -> Callable:
    """Returns jitted fn(variables, images_norm (B,H,W,3)) -> probs
    (B, H, W, C) — the full slide(+TTA) pipeline in one XLA program."""
    coords = window_grid(image_hw, tile, overlap)
    th, tw = tile
    dtype = jnp.dtype(compute_dtype)

    # models with pre-folded serving params (infer/fastpath.py) keep their
    # biases / int8 dequant scales in f32 on purpose — don't downcast them
    precast = getattr(model, "params_precast", False)

    def predict(variables, images):
        if not precast:
            variables = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        b = images.shape[0]
        x = images.astype(dtype)
        tiles = [
            jax.lax.dynamic_slice(x, (0, y1, x1, 0), (b, th, tw, x.shape[-1]))
            for (y1, x1) in coords
        ]
        tiles = jnp.concatenate(tiles, axis=0)  # (B*nw, th, tw, 3)
        if tta:
            v = _views(tiles)  # (8, B*nw, th, tw, 3)
            flat = v.reshape((-1,) + v.shape[2:])
            probs = model.apply(variables, flat, train=False)
            probs = probs.reshape((8,) + tiles.shape[:1] + probs.shape[1:])
            probs = _unviews(probs)
        else:
            probs = model.apply(variables, tiles, train=False)
        probs = probs.astype(jnp.float32)
        c = probs.shape[-1]
        full = jnp.zeros((b,) + image_hw + (c,), jnp.float32)
        count = jnp.zeros((1,) + image_hw + (1,), jnp.float32)
        for i, (y1, x1) in enumerate(coords):
            full = jax.lax.dynamic_update_slice(
                full,
                jax.lax.dynamic_slice(
                    full, (0, y1, x1, 0), (b, th, tw, c)
                ) + probs[i * b:(i + 1) * b],
                (0, y1, x1, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (0, y1, x1, 0), (1, th, tw, 1)) + 1.0,
                (0, y1, x1, 0),
            )
        return full / count

    return jax.jit(predict)


def slide_predict(model, variables, images, tile=(512, 512), tta=False):
    """One-off convenience wrapper (compiles per image size)."""
    fn = make_predictor(model, tile, images.shape[1:3], tta=tta)
    return fn(variables, images)
