"""Stage 1: supervised source training + optional CORAL domain alignment.

CLI-compatible rebuild of the reference ``tools/train_src.py`` (lines
43-172): same flags (--config-path, --align-domain, --ls, --bcs,
--class-temp), same schedule semantics (NUM_STEPS = 1.5 x stage steps,
warmup stage/20, eval every EVAL_EVERY with best-checkpoint tracking) — but
the whole per-iteration body is one jitted TPU step and eval runs the
batched slide predictor.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import jax

from uemda_tpu.config import load_config, snapshot_config
from uemda_tpu.parallel.multihost import (
    add_multihost_flags,
    setup_multihost,
    trainer_mesh,
)
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
from uemda_tpu.train.steps import make_src_step
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Train on source (stage 1).")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--align-domain", type=str2bool, default=0)
    parser.add_argument("--ls", type=str, default="CrossEntropy",
                        choices=["CrossEntropy", "OhemCrossEntropy"])
    parser.add_argument("--bcs", type=str2bool, default=0,
                        help="class balance for source")
    parser.add_argument("--class-temp", type=float, default=2.0)
    parser.add_argument("--pretrained", type=str, default=None,
                        help="ported ImageNet backbone (.msgpack) or torch .pth")
    parser.add_argument("--steps", type=int, default=None,
                        help="override STAGE1_STEPS")
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

    cfg = load_config(args.config_path, snapshot_postfix="/src")
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    snapshot_config(cfg, run_dir)
    logger = get_console_file_logger("train_src", run_dir)
    logging_args(args, logger)

    stop_steps = args.steps or cfg.stage1_steps
    model = build_model(cfg, pretrained=args.pretrained)
    variables = init_variables(model, cfg, seed=args.seed)
    state = build_state(variables, cfg, stop_steps, balance_temp=args.class_temp,
                        feat_channels=model.config.inchannels,
                        accum_steps=args.accum_steps)

    hp = default_hparams(
        cfg,
        align_domain=bool(args.align_domain),
        source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce",
        balance_source=bool(args.bcs),
    )
    step_fn = make_src_step(model, hp)

    mesh = trainer_mesh(args, multihost)
    state, start_step, state_path = maybe_resume(state, run_dir, args.resume, logger)
    hc = host_crop_of(args, cfg)
    src_iter, _ = make_source_iter(cfg, skip=start_step, host_crop=hc)
    tgt_iter, _ = make_target_iter(cfg, label_type="none", skip=start_step,
                                   host_crop=hc)
    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)
    hooks = LoopHooks(eval_every=cfg.eval_every, eval_fn=eval_fn,
                      steps_per_call=args.steps_per_call,
                      on_best=on_best, state_path=state_path)

    run_training_loop(
        state, step_fn, src_iter, tgt_iter, stop_steps, logger, hooks,
        mesh=mesh, rng_seed=args.seed, profile_dir=args.profile_dir, start_step=start_step,
    )


if __name__ == "__main__":
    main()
