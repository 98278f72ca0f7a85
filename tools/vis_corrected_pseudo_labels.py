"""Corrected-pseudo-label visualization CLI.

Rebuild of the reference root-level ``vis_corrected_pseudo_labels.py``
(which subclasses Deeplabv2 to expose eval logits+feat, runs the target
split through slide+TTA, refines the soft labels through the multi-view
scheme and dumps color maps of the mined labels before/after refinement).
Here the model's ``with_aux`` eval mode returns (probs, x1, x2, feat) in
one jitted forward per tile; raw and corrected hard labels are mined with
``pseudo_selection`` and written side by side.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.alignment.prototypes import init_aligner, label_refine
from uemda_tpu.config import load_config
from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.base import SegDataset, sequential_batches
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool
from uemda_tpu.utils.runtime import enable_compile_cache
from uemda_tpu.utils.viz import VisualizeSegmm

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Visualize corrected pseudo labels.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--ckpt-proto", type=str, required=True)
    parser.add_argument("--refine-mode", type=str, default="all",
                        choices=["s", "p", "n", "l", "all"])
    parser.add_argument("--refine-temp", type=float, default=2.0)
    parser.add_argument("--out-dir", type=str, default=None,
                        help="default <snapshot>/vis_corrected")
    parser.add_argument("--max-images", type=int, default=0,
                        help="limit (0 = whole target train split)")
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    out_dir = args.out_dir or os.path.join(cfg.snapshot_dir, "vis_corrected")
    os.makedirs(out_dir, exist_ok=True)
    logger = get_console_file_logger("vis_corrected", cfg.snapshot_dir)
    logging_args(args, logger)

    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_path.endswith((".pth", ".pt")):
        from uemda_tpu.models.port_torch import load_torch_state_dict, port_deeplabv2

        variables = port_deeplabv2(load_torch_state_dict(args.ckpt_path))
    else:
        variables = load_checkpoint(args.ckpt_path, variables)
    prototypes = load_checkpoint(
        args.ckpt_proto,
        np.zeros((cfg.class_num, model.config.inchannels), np.float32),
    )
    aligner = init_aligner(
        cfg.class_num, model.config.inchannels,
        ignore_label=cfg.meta.ignore_label, prototypes=prototypes,
    )

    need_sup = args.refine_mode in ("all", "s")
    split = cfg.target
    dataset = SegDataset(
        cfg.meta, list(split.image_dir), None, label_type="none",
        read_sup=need_sup,
    )

    @functools.partial(jax.jit, static_argnames=("mode",))
    def step(variables, state, images, sup, mode):
        probs, x1, x2, feat = model.apply(
            variables, images, train=False, with_aux=True
        )
        refined = label_refine(
            state, probs, feat, [x1, x2], sup=sup, mode=mode,
            temp=args.refine_temp,
        )
        raw = pseudo_selection(
            probs, cfg.cutoff_top, cfg.cutoff_low, cfg.meta.ignore_label
        )
        cor = pseudo_selection(
            refined, cfg.cutoff_top, cfg.cutoff_low, cfg.meta.ignore_label
        )
        return raw, cor

    viz = VisualizeSegmm(out_dir, cfg.meta.palette)
    done = 0
    changed_px = total_px = 0
    for indices, batch in sequential_batches(dataset, split.batch_size):
        images = normalize(jnp.asarray(batch["image"]), split.mean, split.std)
        sup = jnp.asarray(batch["sup"]) if need_sup else None
        raw, cor = step(variables, aligner, images, sup, args.refine_mode)
        raw, cor = np.asarray(raw), np.asarray(cor)
        changed_px += int((raw != cor).sum())
        total_px += raw.size
        for j, idx in enumerate(indices):
            stem = os.path.splitext(dataset.filename(idx))[0]
            viz(raw[j], f"{stem}_raw.png")
            viz(cor[j], f"{stem}_corrected.png")
        done += len(indices)
        if args.max_images and done >= args.max_images:
            break
    logger.info(
        f"{done} images -> {out_dir}; corrected {changed_px}/{total_px} px "
        f"({100.0 * changed_px / max(total_px, 1):.2f}%)"
    )


if __name__ == "__main__":
    main()
