"""Host-side dataset IO: file pairing and decoding.

Rebuilds the reference ``BaseData`` file conventions
(``uemda/datasets/basedata.py:28-119``):
  * images are ``*.png``/``*.tif`` under ``image_dir``;
  * hard masks pair by identical filename under ``mask_dir``;
  * superpixel maps live next to masks with the ``_sup_shrink`` suffix,
    derived by ``img_dir -> ann_dir`` / ``images_png -> masks_png``
    substitution (``basedata.py:62-64``);
  * stage-3 soft labels are per-image (C, H, W) probability files — the
    reference stores torch ``.pt`` (``pseudo_generation.py:135``), we store
    ``.npy`` (and read ``.pt`` for cross-framework compatibility).

Decoding uses PIL (no cv2/skimage dependency). This machine has one CPU
core, so the recommended path is ``RamCache`` — decode each tile once into
RAM and let the device do augmentation (see ``uemda_tpu.datasets.augment``).
"""

import glob as _glob
import os
from typing import Dict, List

import numpy as np
from PIL import Image


def list_images(image_dir) -> List[str]:
    dirs = image_dir if isinstance(image_dir, (list, tuple)) else [image_dir]
    paths: List[str] = []
    for d in dirs:
        if d is None:
            continue
        paths += _glob.glob(os.path.join(d, "*.tif"))
        paths += _glob.glob(os.path.join(d, "*.png"))
    paths.sort()
    return paths


def sup_path_for(image_path: str) -> str:
    """Superpixel map path by directory substitution (basedata.py:62-64)."""
    d, fname = os.path.split(image_path)
    sup_dir = d.replace("img_dir", "ann_dir").replace("images_png", "masks_png")
    stem = fname.split(".")[0]
    return os.path.join(sup_dir + "_sup_shrink", stem + ".tif")


def mask_path_for(image_path: str, mask_dir: str) -> str:
    return os.path.join(mask_dir, os.path.basename(image_path))


def read_image(path: str) -> np.ndarray:
    """(H, W, 3) uint8/uint16 image."""
    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    return arr[..., :3]


def read_mask(path: str, offset: int, num_classes: int, ignore_label: int = -1):
    """Hard id mask: raw + offset, ids >= C clamped to ignore
    (basedata.py:84-89)."""
    with Image.open(path) as im:
        arr = np.asarray(im).astype(np.int32)
    arr = arr + offset
    arr[arr >= num_classes] = ignore_label
    return arr


def read_sup(path: str) -> np.ndarray:
    """(H, W) int32 superpixel id map (uint16 tif)."""
    with Image.open(path) as im:
        return np.asarray(im).astype(np.int32)


def read_prob(path_base: str) -> np.ndarray:
    """(H, W, C) float probability label. Accepts our ``.npy`` (HWC) or the
    reference's ``.pt`` (CHW) side by side (basedata.py:87)."""
    if os.path.exists(path_base + ".npy"):
        arr = np.load(path_base + ".npy")
        return arr.astype(np.float32)
    if os.path.exists(path_base + ".pt"):
        import torch

        t = torch.load(path_base + ".pt", map_location="cpu")
        return t.numpy().transpose(1, 2, 0).astype(np.float32)
    raise FileNotFoundError(path_base + ".{npy,pt}")


def save_prob(path_base: str, prob_hwc: np.ndarray):
    np.save(path_base + ".npy", prob_hwc.astype(np.float16))


class RamCache:
    """Decode-once tile cache: the whole training split lives in host RAM
    (a few GB of uint8), replacing the reference's 8-worker DataLoader
    processes (``daLoader.py:53``) which this 1-core host cannot afford."""

    def __init__(self):
        self._store: Dict[str, np.ndarray] = {}

    def get(self, path: str, reader) -> np.ndarray:
        hit = self._store.get(path)
        if hit is None:
            hit = reader(path)
            self._store[path] = hit
        return hit
