"""Synthetic tiny datasets for tests and end-to-end pipeline checks.

Generates an on-disk dataset with the reference's layout
(``data/<name>/img_dir/{train,val}`` + ``ann_dir`` + ``ann_dir/..._sup_shrink``,
see ``uemda/datasets/basedata.py:50-64``): blocky class regions with
class-dependent colors plus noise, so a small model can actually learn the
mapping; a shifted color profile makes a poor-man's "target domain".
"""

import os
from typing import Tuple

import numpy as np
from PIL import Image

from uemda_tpu.datasets.meta import DatasetMeta


def _blocky_labels(rng, hw: int, num_classes: int, cell: int = 16) -> np.ndarray:
    g = rng.integers(0, num_classes, size=(hw // cell, hw // cell))
    return np.kron(g, np.ones((cell, cell), np.int64)).astype(np.int32)


def _render(rng, label: np.ndarray, num_classes: int, shift: float = 0.0):
    """Class-colored image with noise; `shift` emulates a domain gap."""
    palette = (
        np.linspace(40, 215, num_classes)[:, None]
        * np.array([[1.0, 0.8, 0.6]])
    )  # (C, 3)
    img = palette[label] + rng.normal(0, 12, size=label.shape + (3,))
    img = img + shift
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_dataset(
    root: str,
    meta: DatasetMeta,
    n_train: int = 8,
    n_val: int = 2,
    hw: int = 64,
    seed: int = 0,
    domain_shift: float = 0.0,
    with_sup: bool = True,
) -> Tuple[str, str]:
    """Returns (img_dir_train, ann_dir_train); also writes val split and
    superpixel maps (regular grid with a boundary ring carrying the max id,
    mirroring the LSC + edge-shrink output)."""
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "img_dir", split)
        ann_dir = os.path.join(root, "ann_dir", split)
        sup_dir = ann_dir + "_sup_shrink"
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        if with_sup:
            os.makedirs(sup_dir, exist_ok=True)
        for i in range(n):
            label = _blocky_labels(rng, hw, meta.num_classes)
            img = _render(rng, label, meta.num_classes, shift=domain_shift)
            name = f"tile_{i:03d}"
            Image.fromarray(img).save(os.path.join(img_dir, name + ".png"))
            # raw mask = label - offset (read_mask adds offset back)
            raw = (label - meta.offset).astype(np.uint8)
            Image.fromarray(raw).save(os.path.join(ann_dir, name + ".png"))
            if with_sup:
                cell = 16
                n_sup = (hw // cell) * (hw // cell)
                grid = np.arange(n_sup, dtype=np.int32).reshape(
                    hw // cell, hw // cell
                )
                sup = np.kron(grid, np.ones((cell, cell), np.int32))
                # boundary ring -> max id (superpixels.py:129-152 shrink)
                ring = np.zeros_like(sup, bool)
                for c0 in range(cell, hw, cell):
                    ring[c0 - 1 : c0 + 1, :] = True
                    ring[:, c0 - 1 : c0 + 1] = True
                sup = np.where(ring, n_sup, sup).astype(np.uint16)
                Image.fromarray(sup).save(os.path.join(sup_dir, name + ".tif"))
    return (
        os.path.join(root, "img_dir", "train"),
        os.path.join(root, "ann_dir", "train"),
    )
