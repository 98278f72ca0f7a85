"""Stage 2: prototype contrastive alignment with online label refinement.

CLI rebuild of the reference ``tools/train_align_uem.py:62-217``: loads the
stage-1 model + prototypes, per step EMA-updates prototypes from source,
refines the online target soft label through the multi-view scheme
(superpixel view needs the offline superpixel maps), mines hard pseudo
labels, and adds PCL on both domains.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np

from uemda_tpu.config import load_config, snapshot_config
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
    make_target_iter,
    run_training_loop,
)
from uemda_tpu.train.steps import make_align_step
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Train alignment (stage 2).")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-model", type=str, required=True)
    parser.add_argument("--ckpt-proto", type=str, required=True)
    parser.add_argument("--align-domain", type=str2bool, default=0)
    parser.add_argument("--gen", type=str2bool, default=1,
                        help="accepted for reference-CLI parity; stage 2's "
                             "supervision is purely online (SURVEY §3.2 note)")
    parser.add_argument("--refine-label", type=str2bool, default=1)
    parser.add_argument("--refine-mode", type=str, default="all",
                        choices=["s", "p", "n", "l", "all"])
    parser.add_argument("--refine-temp", type=float, default=2.0)
    parser.add_argument("--ls", type=str, default="CrossEntropy",
                        choices=["CrossEntropy", "OhemCrossEntropy"])
    parser.add_argument("--bcs", type=str2bool, default=0)
    parser.add_argument("--class-temp", type=float, default=2.0)
    parser.add_argument("--pcl-temp", type=float, default=8.0)
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

    cfg = load_config(args.config_path, snapshot_postfix="/align")
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    snapshot_config(cfg, run_dir)
    logger = get_console_file_logger("train_align_uem", run_dir)
    logging_args(args, logger)

    stop_steps = args.steps or cfg.stage2_steps
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

    hp = default_hparams(
        cfg,
        align_domain=bool(args.align_domain),
        source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce",
        balance_source=bool(args.bcs),
        refine=bool(args.refine_label),
        refine_mode=args.refine_mode,
        refine_temp=args.refine_temp,
        pcl_temp=args.pcl_temp,
    )
    step_fn = make_align_step(model, hp)

    mesh = trainer_mesh(args, multihost)
    state, start_step, state_path = maybe_resume(state, run_dir, args.resume, logger)
    hc = host_crop_of(args, cfg)
    src_iter, _ = make_source_iter(cfg, skip=start_step, host_crop=hc)
    need_sup = args.refine_mode in ("all", "s") and bool(args.refine_label)
    tgt_iter, _ = make_target_iter(cfg, label_type="none", read_sup=need_sup,
                                   skip=start_step, host_crop=hc)
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
