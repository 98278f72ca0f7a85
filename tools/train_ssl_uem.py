"""Stage 3: self-training with uncertainty-based valuable example mining.

CLI rebuild of the reference ``tools/train_ssl_uem.py:69-266``: generate the
pseudo-label dataset for the full target split (batched slide + x8 TTA in
one jitted program, written as .npy and kept in host RAM), rebuild the
target loader on prob labels + superpixels, then self-train with the chosen
target loss (UVEM by default) while refining the stored soft labels online.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np

from uemda_tpu.config import load_config, snapshot_config
from uemda_tpu.datasets.base import SegDataset, infinite_batches
from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
from uemda_tpu.parallel.multihost import (
    add_multihost_flags,
    setup_multihost,
    trainer_mesh,
)
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import (add_loop_flags,
    host_crop_of,
    LoopHooks,
    build_model,
    build_state,
    default_hparams,
    init_variables,
    make_eval_hook,
    maybe_resume,
    make_source_iter,
    run_training_loop,
    variables_of,
    process_shard,
)
from uemda_tpu.train.steps import make_ssl_step
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool

LOSS_CHOICES = ["ours", "uvem", "ohem", "focal", "ghm", "gdp", "ups", "none", "ce"]


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Self-training (stage 3).")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-model", type=str, required=True)
    parser.add_argument("--ckpt-proto", type=str, required=True)
    parser.add_argument("--gen", type=str2bool, default=1)
    parser.add_argument("--gen-fastpath", type=str2bool, default=0,
                        help="run the pseudo-label sweep on the folded "
                        "serving fast path (infer/fastpath.py, exact math)")
    parser.add_argument("--refine-label", type=str2bool, default=1)
    parser.add_argument("--refine-mode", type=str, default="all",
                        choices=["s", "p", "n", "l", "all"])
    parser.add_argument("--refine-temp", type=float, default=2.0)
    parser.add_argument("--ls", type=str, default="CrossEntropy",
                        choices=["CrossEntropy", "OhemCrossEntropy"])
    parser.add_argument("--bcs", type=str2bool, default=0)
    parser.add_argument("--lt", type=str, default="uvem", choices=LOSS_CHOICES)
    parser.add_argument("--bct", type=str2bool, default=0)
    parser.add_argument("--class-temp", type=float, default=2.0)
    parser.add_argument("--uvem-m", type=float, default=0.2)
    parser.add_argument("--uvem-t", type=float, default=0.7)
    parser.add_argument("--uvem-g", type=float, default=4)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--seed", type=int, default=2333)
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation: one SGD update per k "
                             "micro-batches (effective batch k x batch)")
    add_loop_flags(parser)
    parser.add_argument("--resume", type=str, default="",
                        help="'auto' or a state_curr.msgpack path (exact full-state resume)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 10-15")
    add_multihost_flags(parser)
    args = parser.parse_args()
    multihost = setup_multihost(args)

    cfg = load_config(args.config_path, snapshot_postfix="/ssl")
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    snapshot_config(cfg, run_dir)
    logger = get_console_file_logger("train_ssl_uem", run_dir)
    logging_args(args, logger)

    mesh = trainer_mesh(args, multihost)

    stop_steps = args.steps or cfg.stage3_steps
    model = build_model(cfg)
    variables = init_variables(model, cfg, seed=args.seed)
    variables = load_checkpoint(args.ckpt_model, variables)
    prototypes = load_checkpoint(
        args.ckpt_proto,
        np.zeros((cfg.class_num, model.config.inchannels), np.float32),
    )
    state = build_state(
        variables, cfg, stop_steps, prototypes=prototypes,
        balance_temp=args.class_temp,
        feat_channels=model.config.inchannels,
        accum_steps=args.accum_steps,
    )

    state, start_step, state_path = maybe_resume(state, run_dir, args.resume, logger)

    # ---- pseudo-label generation pass (train_ssl_uem.py:177-189) ----
    # (skipped on resume: the saved labels from the interrupted run's own
    # gen pass are already on disk and regenerating from the same stage-2
    # checkpoint would reproduce them)
    pseudo_dir = os.path.join(run_dir, "..", "pseudo_label")
    if args.gen and start_step == 0:
        logger.info("###### generating pseudo labels ######")
        gen_ds = SegDataset(
            cfg.meta, list(cfg.target.image_dir), None, label_type="none"
        )
        generate_pseudo_labels(
            model, variables_of(state), gen_ds, cfg.target.mean, cfg.target.std,
            out_dir=pseudo_dir, tile=cfg.crop, tta=True,
            batch_size=min(4, cfg.target.batch_size),
            cutoff_top=cfg.cutoff_top, cutoff_low=cfg.cutoff_low,
            color_dir=pseudo_dir + "_color", logger=logger, mesh=mesh,
            fastpath=bool(args.gen_fastpath),
        )

    loss_name = {"ours": "uvem"}.get(args.lt, args.lt)
    hp = default_hparams(
        cfg,
        source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce",
        balance_source=bool(args.bcs),
        refine=bool(args.refine_label),
        refine_mode=args.refine_mode,
        refine_temp=args.refine_temp,
        target_loss=loss_name,
        balance_target=bool(args.bct),
        uvem_m=args.uvem_m,
        uvem_t=args.uvem_t,
        uvem_g=args.uvem_g,
    )
    step_fn = make_ssl_step(model, hp)

    hc = host_crop_of(args, cfg)
    src_iter, _ = make_source_iter(cfg, skip=start_step, host_crop=hc)
    need_sup = args.refine_mode in ("all", "s") and bool(args.refine_label)
    tgt_ds = SegDataset(
        cfg.meta, list(cfg.target.image_dir), pseudo_dir,
        label_type="prob", read_sup=need_sup,
    )
    tgt_iter = infinite_batches(
        tgt_ds, cfg.target.batch_size, seed=1, skip_batches=start_step,
        process_shard=process_shard(cfg.target.batch_size), host_crop=hc,
    )

    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)
    hooks = LoopHooks(eval_every=cfg.eval_every, eval_fn=eval_fn,
                      steps_per_call=args.steps_per_call,
                      on_best=on_best, state_path=state_path)

    run_training_loop(
        state, step_fn, src_iter, tgt_iter, stop_steps, logger, hooks,
        mesh=mesh, rng_seed=args.seed, profile_dir=args.profile_dir,
        start_step=start_step,
    )


if __name__ == "__main__":
    main()
