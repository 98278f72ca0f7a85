"""Class-distribution analysis across dataset splits.

Rebuild of ``uemda/utils/classvis.py`` (the class-frequency bar-chart tool):
computes per-class pixel rates for one or more splits and saves a grouped
bar chart + JSON report (plot.py's checkpoint-statistics scripts are
environment-specific one-offs and intentionally not reproduced).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset


def class_rates(dataset) -> np.ndarray:
    c = dataset.meta.num_classes
    counts = np.zeros(c, np.float64)
    for i in range(len(dataset)):
        lbl = dataset.item(i)["label"]
        for cls in range(c):
            counts[cls] += float((lbl == cls).sum())
    return counts / max(counts.sum(), 1.0)


def main():
    parser = argparse.ArgumentParser(description="Class distribution bars.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--out", type=str, default="class_dist.png")
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    splits = {
        "source": (cfg.source.image_dir, cfg.source.mask_dir),
        "target": (cfg.target.image_dir, cfg.target.mask_dir),
    }
    rates = {}
    for name, (img, ann) in splits.items():
        ds = SegDataset(cfg.meta, list(img), list(ann)[0])
        rates[name] = class_rates(ds).round(5).tolist()
    print(json.dumps({"classes": cfg.meta.class_names, **rates}, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.arange(cfg.meta.num_classes)
    fig, ax = plt.subplots(figsize=(8, 4))
    width = 0.8 / len(rates)
    for i, (name, r) in enumerate(rates.items()):
        ax.bar(x + i * width, r, width, label=name)
    ax.set_xticks(x + width / 2)
    ax.set_xticklabels(cfg.meta.class_names, rotation=30, ha="right")
    ax.set_ylabel("pixel rate")
    ax.legend()
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
