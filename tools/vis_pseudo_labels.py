"""Pseudo-label quality analysis + visualization CLI.

Rebuild of reference ``tools/vis_pseudo_labels.py`` +
``analysis_pseudo_labels`` (``uemda/gast/pseudo_generation.py:158-335``):
reports mined-label coverage/accuracy vs ground truth, per uncertainty bin,
and optionally dumps color maps of the mined labels.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

from uemda_tpu.config import load_config
from uemda_tpu.infer.analysis import analyze_pseudo_labels
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Analyze pseudo labels.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--label-dir", type=str, required=True,
                        help="ground-truth ann dir of the target train split")
    parser.add_argument("--pseudo-dir", type=str, required=True,
                        help="dir of saved per-image probability files")
    parser.add_argument("--cutoff-top", type=float, default=None)
    parser.add_argument("--cutoff-low", type=float, default=None)
    parser.add_argument("--plot", type=str, default=None,
                        help="write the accuracy/count-vs-entropy figure "
                             "(the reference's analysis plots, "
                             "pseudo_generation.py:238-335) to this PNG")
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    report = analyze_pseudo_labels(
        args.label_dir,
        args.pseudo_dir,
        cfg.meta,
        cutoff_top=args.cutoff_top or cfg.cutoff_top,
        cutoff_low=args.cutoff_low or cfg.cutoff_low,
    )
    print(json.dumps(report, indent=2))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        edges = np.asarray(report["bin_edges"])
        mid = (edges[:-1] + edges[1:]) / 2
        fig, ax1 = plt.subplots(figsize=(6, 4))
        ax1.bar(mid, report["bin_count"], width=np.diff(edges) * 0.9,
                alpha=0.4, label="pixel count")
        ax1.set_xlabel("pseudo-label entropy u")
        ax1.set_ylabel("pixels")
        ax2 = ax1.twinx()
        ax2.plot(mid, report["bin_accuracy"], "o-", color="C1",
                 label="accuracy")
        ax2.set_ylabel("accuracy")
        ax2.set_ylim(0, 1.02)
        fig.suptitle(
            f"coverage {report['coverage']:.3f}, "
            f"mined accuracy {report['accuracy']:.3f}"
        )
        fig.tight_layout()
        fig.savefig(args.plot, dpi=120)
        print(args.plot)


if __name__ == "__main__":
    main()
