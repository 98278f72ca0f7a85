"""Adversarial output-space adaptation trainer (the working counterpart of
the reference's ``configs/adv`` method family, whose trainer is absent from
the reference repo)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

from uemda_tpu.config import load_config, snapshot_config
from uemda_tpu.train.adversarial import create_adv_state, make_adv_step
from uemda_tpu.train.loop import (
    LoopHooks,
    build_model,
    build_state,
    default_hparams,
    init_variables,
    make_eval_hook,
    make_source_iter,
    make_target_iter,
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
    parser.add_argument("--seed", type=int, default=2333)
    args = parser.parse_args()

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
        variables, cfg, stop_steps, feat_channels=model.config.inchannels
    )
    adv_state = create_adv_state(seg_state, cfg.class_num, args.d_lr, cfg.crop)

    hp = default_hparams(
        cfg, source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce"
    )
    step_fn = make_adv_step(model, hp, lambda_adv=args.lambda_adv)

    src_iter, _ = make_source_iter(cfg)
    tgt_iter, _ = make_target_iter(cfg, label_type="none")
    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)

    import jax

    key = jax.random.key(args.seed)
    miou_max, iter_max = 0.0, 0
    for i in range(stop_steps):
        batch_s = next(src_iter)
        batch_t = next(tgt_iter)
        key, sub = jax.random.split(key)
        adv_state, metrics = step_fn(adv_state, batch_s, batch_t, sub)
        if i == 0 or (i + 1) % 50 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                f"iter={i + 1}/{stop_steps}, "
                + ", ".join(f"{k}={v:.4g}" for k, v in m.items())
            )
        if (i + 1) % cfg.eval_every == 0 or (i + 1) >= stop_steps:
            miou = eval_fn(adv_state.seg)
            if miou >= miou_max:
                miou_max, iter_max = miou, i + 1
                on_best(adv_state.seg, i + 1, miou)
            logger.info(
                f"eval@{i + 1}: mIoU={miou:.5f} (best {miou_max:.5f} @ {iter_max})"
            )


if __name__ == "__main__":
    main()
