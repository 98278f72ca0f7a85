"""Alternative superpixel front-ends (reference ``uemda/gast/slic/
superpixel.py:18-202``, dormant): grid superpixels and an LDA color
projection preprocessing, without the skimage dependency.

The production path is the C++ runtime (``uemda_tpu.superpixels.native``);
these exist for experimentation parity.
"""

from typing import Optional, Tuple

import numpy as np


def grid_superpixels(hw: Tuple[int, int], region_size: int = 16) -> np.ndarray:
    """Trivial regular-grid segmentation (the degenerate baseline)."""
    h, w = hw
    gy = np.arange(h) // region_size
    gx = np.arange(w) // region_size
    cols = -(-w // region_size)
    return (gy[:, None] * cols + gx[None, :]).astype(np.int32)


def lda_project(image: np.ndarray, labels: Optional[np.ndarray]) -> np.ndarray:
    """LDA color projection used as SLIC preprocessing in the reference's
    alt module: project RGB onto the most class-discriminative axes."""
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

    h, w = image.shape[:2]
    x = image.reshape(-1, image.shape[-1]).astype(np.float64)
    if labels is None:
        return image.astype(np.float32)
    y = labels.reshape(-1)
    keep = y >= 0
    lda = LinearDiscriminantAnalysis(n_components=min(2, image.shape[-1] - 1))
    lda.fit(x[keep], y[keep])
    proj = lda.transform(x).reshape(h, w, -1)
    proj = proj - proj.min(axis=(0, 1))
    proj = proj / np.maximum(proj.max(axis=(0, 1)), 1e-9) * 255.0
    if proj.shape[-1] < 3:
        proj = np.concatenate([proj] * 3, axis=-1)[..., :3]
    return proj.astype(np.float32)


def slic_on_projection(
    image: np.ndarray,
    labels: Optional[np.ndarray] = None,
    region_size: int = 16,
    ratio: float = 0.075,
    iterations: int = 100,
):
    """SLIC over the LDA-projected colors (the reference's LDA+SLIC combo)."""
    from uemda_tpu.superpixels.native import slic_superpixels

    proj = lda_project(image, labels)
    return slic_superpixels(
        np.clip(proj, 0, 255).astype(np.uint8), region_size, ratio, iterations
    )
