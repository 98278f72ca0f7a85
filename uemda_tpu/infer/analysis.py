"""Pseudo-label quality analysis.

Rebuild of ``analysis_pseudo_labels`` / plotting helpers (reference
``uemda/gast/pseudo_generation.py:158-335``): measure mined-pseudo-label
accuracy and coverage against ground truth, binned by prediction uncertainty,
so the CUTOFF/UVEM thresholds can be tuned.
"""

from typing import Dict, Optional

import numpy as np

from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.datasets.io import read_mask, read_prob
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.ops.uncertainty import pixel_entropy

import jax.numpy as jnp


def analyze_pseudo_labels(
    label_dir: str,
    pseudo_dir: str,
    meta,
    cutoff_top: float = 0.8,
    cutoff_low: float = 0.6,
    n_bins: int = 10,
) -> Dict:
    """Returns accuracy/coverage overall and per uncertainty bin."""
    ds = SegDataset(meta, label_dir.replace("ann_dir", "img_dir"), label_dir)
    total = kept = correct = 0
    bin_edges = np.linspace(0, np.log(meta.num_classes), n_bins + 1)
    bin_cnt = np.zeros(n_bins)
    bin_correct = np.zeros(n_bins)
    for i in range(len(ds)):
        fname = ds.filename(i)
        gt = ds.item(i)["label"]
        prob = read_prob(f"{pseudo_dir}/{fname}")  # (H, W, C)
        hard = np.asarray(
            pseudo_selection(
                jnp.asarray(prob[None]), cutoff_top, cutoff_low,
                meta.ignore_label,
            )
        )[0]
        u = np.asarray(pixel_entropy(jnp.asarray(prob)))
        valid_gt = gt != meta.ignore_label
        mined = (hard != meta.ignore_label) & valid_gt
        total += int(valid_gt.sum())
        kept += int(mined.sum())
        correct += int(((hard == gt) & mined).sum())
        for b in range(n_bins):
            sel = mined & (u >= bin_edges[b]) & (u < bin_edges[b + 1])
            bin_cnt[b] += sel.sum()
            bin_correct[b] += ((hard == gt) & sel).sum()
    return {
        "coverage": kept / max(total, 1),
        "accuracy": correct / max(kept, 1),
        "bin_edges": bin_edges.tolist(),
        "bin_count": bin_cnt.tolist(),
        "bin_accuracy": (bin_correct / np.maximum(bin_cnt, 1)).tolist(),
    }
