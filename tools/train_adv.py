"""Adversarial output-space adaptation trainer (the working counterpart of
the reference's ``configs/adv`` method family, whose trainer is absent from
the reference repo; discriminator surface: ``uemda/models/Discriminator.py:
4-78``).

Round 3: driven by the unified training loop (uemda_tpu/train/loop.py), so
it gets the same elasticity surface as every pipeline trainer — ``--resume
auto`` exact full-state resume (G + D params, both optimizers, step),
``--accum-steps`` (segmenter updates; D steps every micro-batch),
``--steps-per-call``, ``--num-devices`` and ``--multihost``.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

from uemda_tpu.config import load_config, snapshot_config
from uemda_tpu.parallel.multihost import (
    add_multihost_flags,
    setup_multihost,
    trainer_mesh,
)
from uemda_tpu.train.adversarial import create_adv_state, make_adv_step
from uemda_tpu.train.loop import (
    host_crop_of,
    LoopHooks,
    add_loop_flags,
    build_model,
    build_state,
    default_hparams,
    init_variables,
    make_eval_hook,
    make_source_iter,
    make_target_iter,
    maybe_resume,
    run_training_loop,
)
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="Adversarial DA training.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--ckpt-model", type=str, default=None)
    parser.add_argument("--lambda-adv", type=float, default=0.001)
    parser.add_argument("--d-lr", type=float, default=1e-4)
    parser.add_argument("--ls", type=str, default="CrossEntropy",
                        choices=["CrossEntropy", "OhemCrossEntropy"])
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--seed", type=int, default=2333)
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="gradient accumulation for the segmenter: one "
                             "SGD update per k micro-batches (the "
                             "discriminator still steps every micro-batch)")
    add_loop_flags(parser)
    parser.add_argument("--resume", type=str, default="",
                        help="'auto' or a state_curr.msgpack path (exact "
                             "full-state resume incl. discriminator)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of steps 10-15")
    add_multihost_flags(parser)
    args = parser.parse_args()
    multihost = setup_multihost(args)

    cfg = load_config(args.config_path, snapshot_postfix="/adv")
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    snapshot_config(cfg, run_dir)
    logger = get_console_file_logger("train_adv", run_dir)
    logging_args(args, logger)

    stop_steps = args.steps or cfg.stage1_steps
    model = build_model(cfg, pretrained=args.pretrained)
    variables = init_variables(model, cfg, seed=args.seed)
    if args.ckpt_model:
        from uemda_tpu.train.checkpoints import load_checkpoint

        variables = load_checkpoint(args.ckpt_model, variables)
    seg_state = build_state(
        variables, cfg, stop_steps, feat_channels=model.config.inchannels,
        accum_steps=args.accum_steps,
    )
    state = create_adv_state(seg_state, cfg.class_num, args.d_lr, cfg.crop)

    hp = default_hparams(
        cfg, source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce"
    )
    step_fn = make_adv_step(model, hp, lambda_adv=args.lambda_adv)

    mesh = trainer_mesh(args, multihost)
    state, start_step, state_path = maybe_resume(state, run_dir, args.resume, logger)
    hc = host_crop_of(args, cfg)
    src_iter, _ = make_source_iter(cfg, skip=start_step, host_crop=hc)
    tgt_iter, _ = make_target_iter(cfg, label_type="none", skip=start_step,
                                   host_crop=hc)
    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)
    hooks = LoopHooks(
        eval_every=cfg.eval_every,
        eval_fn=lambda adv: eval_fn(adv.seg),
        on_best=lambda adv, i, miou: on_best(adv.seg, i, miou),
        steps_per_call=args.steps_per_call,
        state_path=state_path,
    )

    run_training_loop(
        state, step_fn, src_iter, tgt_iter, stop_steps, logger, hooks,
        mesh=mesh, rng_seed=args.seed, profile_dir=args.profile_dir,
        start_step=start_step,
    )


if __name__ == "__main__":
    main()
