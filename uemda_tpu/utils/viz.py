"""Palette PNG writers for predictions and pseudo labels.

Rebuilds ``VisualizeSegmm`` (reference ``uemda/viz.py:11-28``): class-id maps
are written as palettized PNGs using the dataset color map; ignore (-1)
renders as class 0's color shifted to black.
"""

import os
from typing import Sequence

import numpy as np
from PIL import Image


class VisualizeSegmm:
    def __init__(self, out_dir: str, palette: Sequence[int]):
        self.out_dir = out_dir
        self.palette = list(palette) + [0] * (768 - len(palette))
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, label: np.ndarray, filename: str):
        arr = np.asarray(label).astype(np.int32)
        arr = np.where(arr < 0, 255, arr).astype(np.uint8)  # ignore -> 255
        im = Image.fromarray(arr, mode="P")
        im.putpalette(self.palette)
        im.save(os.path.join(self.out_dir, filename))
