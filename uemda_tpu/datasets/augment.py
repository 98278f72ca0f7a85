"""On-device joint augmentation (crop / flip / rot90 / normalize).

The reference augments on CPU workers — albumentations for id-label source
batches (``configs/ToVaihingen.py:44-55``) and a torch-tensor ``Compose`` for
the stage-3 prob-label target batches (``uemda/aug/augmentation.py:150-157``).
Here the host ships raw uint8 tiles and the *device* performs the joint
transform inside the jitted train step: random crop (dynamic_slice), the D4
subgroup ops, and normalization fuse with the first conv under XLA, so the
1-core host never touches pixels.

Both reference pipelines are reproduced:
  * source: RandomCrop + OneOf[hflip, vflip, rot90(k~U{0..3})] p=0.75 +
    Normalize(mean, std) (max_pixel_value=1 — stats are in raw 0..255 units);
  * target (prob labels): RandomCrop + hflip(0.5) + vflip(0.5) + rot90(0.5)
    + Normalize with clamp(max=1.0) (``aug/augmentation.py:112-122``),
    applied in lockstep to image + soft label + superpixel map.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def normalize(image: jnp.ndarray, mean, std, clamp: bool = False) -> jnp.ndarray:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    out = (image.astype(jnp.float32) - mean) / std
    if clamp:
        out = jnp.minimum(out, 1.0)
    return out


def _rand_crop_single(rng, arrs, crop_hw: Tuple[int, int]):
    """Joint random crop of a dict of (H, W, ...) arrays."""
    ch, cw = crop_hw
    some = next(iter(arrs.values()))
    h, w = some.shape[0], some.shape[1]
    ky, kx = jax.random.split(rng)
    top = jax.random.randint(ky, (), 0, max(h - ch, 0) + 1)
    left = jax.random.randint(kx, (), 0, max(w - cw, 0) + 1)

    def crop(a):
        start = (top, left) + (0,) * (a.ndim - 2)
        size = (ch, cw) + a.shape[2:]
        return jax.lax.dynamic_slice(a, start, size)

    return {k: crop(v) for k, v in arrs.items()}


def _d4_single(rng, arrs, mode: str):
    """Joint flip/rot90. mode='oneof' (albumentations OneOf p=.75) or
    'compose' (independent hflip/vflip/rot90 each p=.5)."""

    def hflip(a):
        return a[:, ::-1]

    def vflip(a):
        return a[::-1, :]

    def rot(a, k):
        return jax.lax.switch(
            k,
            [lambda x: x] + [
                (lambda kk: lambda x: jnp.rot90(x, k=kk, axes=(0, 1)))(kk)
                for kk in (1, 2, 3)
            ],
            a,
        )

    if mode == "oneof":
        kc, kp, kk = jax.random.split(rng, 3)
        apply = jax.random.uniform(kp) < 0.75
        choice = jax.random.randint(kc, (), 0, 3)
        k90 = jax.random.randint(kk, (), 0, 4)

        def tx(a):
            out = jax.lax.switch(
                choice, [hflip, vflip, lambda x: rot(x, k90)], a
            )
            return jnp.where(apply, out, a)

        return {k: tx(v) for k, v in arrs.items()}

    kh, kv, kr = jax.random.split(rng, 3)
    do_h = jax.random.uniform(kh) < 0.5
    do_v = jax.random.uniform(kv) < 0.5
    do_r = jax.random.uniform(kr) < 0.5

    def tx(a):
        a = jnp.where(do_h, hflip(a), a)
        a = jnp.where(do_v, vflip(a), a)
        # torch.rot90(k=1) (aug/augmentation.py:67)
        a = jnp.where(do_r, jnp.rot90(a, k=1, axes=(0, 1)), a)
        return a

    return {k: tx(v) for k, v in arrs.items()}


def augment_batch(
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    crop_hw: Tuple[int, int],
    mean,
    std,
    mode: str = "oneof",
    clamp: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Per-sample joint augmentation over a batch dict with keys among
    {'image', 'label', 'prob', 'sup'}; image is normalized afterwards."""

    def one(rng, arrs):
        kc, kd = jax.random.split(rng)
        arrs = _rand_crop_single(kc, arrs, crop_hw)
        return _d4_single(kd, arrs, mode)

    b = batch["image"].shape[0]
    keys = jax.random.split(rng, b)
    out = jax.vmap(one)(keys, batch)
    out["image"] = normalize(out["image"], mean, std, clamp=clamp)
    return out
