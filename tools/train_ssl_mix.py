"""SSL with CutMix / ClassMix / DACS domain mixing.

Rebuild of reference ``tools/train_ssl_mix.py:54-207``: pseudo labels are
regenerated every GENE_EVERY steps over the full target split; each step
mines hard labels from the stored soft labels and pastes source content into
the target batch (on device) before the twin forwards + CE.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

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
from uemda_tpu.train.steps import make_mix_step
from uemda_tpu.utils.log import get_console_file_logger, logging_args, str2bool


from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="SSL with domain mixing.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-model", type=str, required=True)
    parser.add_argument("--gen", type=str2bool, default=1)
    parser.add_argument("--gen-fastpath", type=str2bool, default=0,
                        help="run the pseudo-label sweep on the folded "
                        "serving fast path (infer/fastpath.py, exact math)")
    parser.add_argument("--mix", type=str, default="cutmix",
                        choices=["cutmix", "classmix", "dacs"])
    parser.add_argument("--ls", type=str, default="CrossEntropy",
                        choices=["CrossEntropy", "OhemCrossEntropy"])
    parser.add_argument("--bcs", type=str2bool, default=0)
    parser.add_argument("--class-temp", type=float, default=2.0)
    # ---- beyond-reference combo: UVEM/refinement on top of mixing ----
    parser.add_argument("--lt", type=str, default="legacy",
                        choices=["legacy", "uvem", "ups", "ohem", "focal",
                                 "ghm", "gdp", "ce"],
                        help="target loss on the mixed batch: 'legacy' = the "
                        "reference's CE-on-mined-labels; anything else runs "
                        "the stage-3 loss zoo (beyond-reference)")
    parser.add_argument("--refine-label", type=str2bool, default=0,
                        help="refine stored soft labels online before "
                        "mining+mixing (beyond-reference; needs --ckpt-proto)")
    parser.add_argument("--refine-mode", type=str, default="all",
                        choices=["s", "p", "n", "l", "all"])
    parser.add_argument("--refine-temp", type=float, default=2.0)
    parser.add_argument("--ckpt-proto", type=str, default=None,
                        help="stage-2 prototypes (required with --refine-label)")
    parser.add_argument("--bct", type=str2bool, default=0)
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
    add_multihost_flags(parser)
    args = parser.parse_args()
    multihost = setup_multihost(args)

    cfg = load_config(args.config_path, snapshot_postfix=f"/{args.mix}")
    run_dir = cfg.snapshot_dir
    os.makedirs(run_dir, exist_ok=True)
    snapshot_config(cfg, run_dir)
    logger = get_console_file_logger("train_ssl_mix", run_dir)
    logging_args(args, logger)

    combo = args.lt != "legacy" or bool(args.refine_label)
    if args.refine_label and not args.ckpt_proto:
        parser.error("--refine-label 1 requires --ckpt-proto")

    stop_steps = args.steps or cfg.stage3_steps
    model = build_model(cfg)
    variables = init_variables(model, cfg, seed=args.seed)
    variables = load_checkpoint(args.ckpt_model, variables)
    prototypes = None
    if args.ckpt_proto:
        import numpy as np

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
        source_loss="ohem" if args.ls == "OhemCrossEntropy" else "ce",
        balance_source=bool(args.bcs),
        refine=bool(args.refine_label),
        refine_mode=args.refine_mode,
        refine_temp=args.refine_temp,
        target_loss=args.lt if args.lt != "legacy" else "ce",
        balance_target=bool(args.bct),
        uvem_m=args.uvem_m,
        uvem_t=args.uvem_t,
        uvem_g=args.uvem_g,
    )
    step_fn = make_mix_step(model, hp, mix=args.mix, combo=combo)

    mesh = trainer_mesh(args, multihost)
    state, start_step, state_path = maybe_resume(state, run_dir, args.resume, logger)
    hc = host_crop_of(args, cfg)
    src_iter, _ = make_source_iter(cfg, skip=start_step, host_crop=hc)
    pseudo_dir = os.path.join(run_dir, "..", "pseudo_label")
    gen_ds = SegDataset(
        cfg.meta, list(cfg.target.image_dir), None, label_type="none"
    )

    def regen(state, skip=0):
        generate_pseudo_labels(
            model, variables_of(state), gen_ds, cfg.target.mean, cfg.target.std,
            out_dir=pseudo_dir, tile=cfg.crop, tta=True,
            batch_size=min(4, cfg.target.batch_size),
            cutoff_top=cfg.cutoff_top, cutoff_low=cfg.cutoff_low, logger=logger,
            mesh=mesh, fastpath=bool(args.gen_fastpath),
        )
        need_sup = bool(args.refine_label) and args.refine_mode in ("all", "s")
        ds = SegDataset(
            cfg.meta, list(cfg.target.image_dir), pseudo_dir,
            label_type="prob", read_sup=need_sup,
        )
        return infinite_batches(
            ds, cfg.target.batch_size, seed=1, skip_batches=skip,
            process_shard=process_shard(cfg.target.batch_size), host_crop=hc,
        )

    first_chunk = min(cfg.gene_every, stop_steps)
    if args.gen and start_step >= first_chunk:
        tgt_iter = None  # first live chunk regenerates below
    else:
        tgt_iter = regen(state, skip=start_step)

    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)
    hooks = LoopHooks(eval_every=cfg.eval_every, eval_fn=eval_fn,
                      steps_per_call=args.steps_per_call,
                      on_best=on_best, state_path=state_path)

    # gene_every rounds (train_ssl_mix.py:125-141): run in chunks, regenerate
    done = 0
    while done < stop_steps:
        chunk = min(cfg.gene_every, stop_steps - done)
        state = run_training_loop(
            state, step_fn, src_iter, tgt_iter, chunk, logger, hooks,
            mesh=mesh, rng_seed=args.seed + done,
            start_step=min(max(start_step - done, 0), chunk),
        )
        done += chunk
        if done < stop_steps and args.gen:
            nxt = min(cfg.gene_every, stop_steps - done)
            if done + nxt > start_step:
                logger.info(f"###### regenerating pseudo labels @ step {done} ######")
                tgt_iter = regen(state, skip=min(max(start_step - done, 0), nxt))


if __name__ == "__main__":
    main()
