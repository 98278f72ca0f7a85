"""Prototype initialization pass: one source epoch of exact class means.

Rebuild of the reference ``tools/init_prototypes.py:50-119``: load a stage
checkpoint, accumulate per-class feature sums/counts over one epoch of the
source split (jitted, batched), average, save prototypes for the next stage.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import jax
import numpy as np

from uemda_tpu.alignment.prototypes import init_avg
from uemda_tpu.config import load_config
from uemda_tpu.datasets.base import SegDataset, sequential_batches
from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from uemda_tpu.train.loop import (
    build_model,
    build_state,
    default_hparams,
    init_variables,
    variables_of,
)
from uemda_tpu.train.steps import make_init_proto_step
from uemda_tpu.utils.log import get_console_file_logger, logging_args

import jax.numpy as jnp


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Init prototypes.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-model", type=str, required=True)
    parser.add_argument("--ckpt-proto", type=str, required=True)
    parser.add_argument("--stage", type=int, default=1)
    parser.add_argument("--seed", type=int, default=2333)
    args = parser.parse_args()

    postfix = "/src" if args.stage == 1 else "/align"
    cfg = load_config(args.config_path, snapshot_postfix=postfix)
    logger = get_console_file_logger("init_prototypes", cfg.snapshot_dir)
    logging_args(args, logger)

    model = build_model(cfg)
    variables = init_variables(model, cfg, seed=args.seed)
    variables = load_checkpoint(args.ckpt_model, variables)
    state = build_state(variables, cfg, stop_steps=1,
                        feat_channels=model.config.inchannels)

    hp = default_hparams(cfg)
    step_fn = make_init_proto_step(model, hp)

    ds = SegDataset(
        cfg.meta, list(cfg.source.image_dir), list(cfg.source.mask_dir)[0]
    )
    key = jax.random.key(args.seed)
    bsz = cfg.source.batch_size
    n_batches = 0
    for _, batch in sequential_batches(ds, bsz):
        if batch["image"].shape[0] < bsz:
            continue  # drop_last, like the reference loader
        key, sub = jax.random.split(key)
        state = step_fn(
            state,
            {"image": jnp.asarray(batch["image"]), "label": jnp.asarray(batch["label"])},
            sub,
        )
        n_batches += 1
    aligner = init_avg(state.aligner)
    logger.info(f"counts = {np.asarray(aligner.data_cnt).ravel()}")
    save_checkpoint(args.ckpt_proto, aligner.prototypes)
    logger.info(f"prototypes saved to {args.ckpt_proto} ({n_batches} batches)")


if __name__ == "__main__":
    main()
