"""Per-channel mean/std statistics over image directories.

Rebuild of the reference root-level ``statistic.py:1-96`` (the tool that
produced the normalization constants baked into the configs).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from uemda_tpu.datasets.convert import compute_channel_stats


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Channel statistics.")
    parser.add_argument("--img-dir", type=str, required=True, nargs="+")
    args = parser.parse_args()
    mean, std = compute_channel_stats(list(args.img_dir))
    print("mean:", [round(float(v), 4) for v in mean])
    print("std: ", [round(float(v), 4) for v in std])


if __name__ == "__main__":
    main()
