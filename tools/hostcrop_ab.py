"""Same-trainer --host-crop A/B at big-tile geometry (VERDICT r3 item 6).

The r3 "4x less transfer" claim for --host-crop was inferred across two
different trainers (PERF_NOTES.md); this measures it cleanly: the SAME
``make_src_step`` program, the SAME process, alternating host-crop off/on
for >=2 consecutive pairs, per-step wall time with a scalar readback each
step (the loop's real K=1 dispatch regime; ``jax.block_until_ready`` does
not block through the axon tunnel — CLAUDE.md).

Off ships the full tile and crops on device (one extra recompile for the
big input shape); on pre-crops on the host (``datasets/base.py
_host_crop_batch``). Prints ONE JSON line:

    {"pairs": [{"off_ms": .., "on_ms": ..}, ...], "speedup": ..}

Usage:
    python tools/hostcrop_ab.py --config-path runs/loveda_synth_config.py \
        --steps 30 --pairs 2
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="host-crop on/off A/B")
    parser.add_argument("--config-path", type=str,
                        default="runs/loveda_synth_config.py")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--pairs", type=int, default=2)
    args = parser.parse_args()

    import jax

    from uemda_tpu.config import load_config
    from uemda_tpu.train.loop import (
        build_model,
        build_state,
        default_hparams,
        init_variables,
        make_source_iter,
        make_target_iter,
    )
    from uemda_tpu.train.steps import make_src_step

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    hp = default_hparams(cfg, align_domain=True)
    step_fn = make_src_step(model, hp)
    variables = init_variables(model, cfg)

    def measure(host_crop):
        src_iter, _ = make_source_iter(cfg, host_crop=host_crop)
        tgt_iter, _ = make_target_iter(cfg, host_crop=host_crop)
        import jax.numpy as jnp

        v = jax.tree.map(jnp.array, variables)
        state = build_state(v, cfg, 1000,
                            feat_channels=model.config.inchannels)
        key = jax.random.key(0)
        for i in range(args.warmup):
            state, m = step_fn(state, next(src_iter), next(tgt_iter), key)
            float(m["loss"])
        t0 = time.time()
        for i in range(args.steps):
            state, m = step_fn(state, next(src_iter), next(tgt_iter), key)
            float(m["loss"])  # forced readback: real per-step sync + RTT
        return (time.time() - t0) / args.steps * 1000

    pairs = []
    for _ in range(args.pairs):
        off = measure(None)
        on = measure(cfg.crop)
        pairs.append({"off_ms": round(off, 2), "on_ms": round(on, 2)})
    mean_off = sum(p["off_ms"] for p in pairs) / len(pairs)
    mean_on = sum(p["on_ms"] for p in pairs) / len(pairs)
    print(json.dumps({
        "config": cfg.name,
        "crop": list(cfg.crop),
        "batch": cfg.source.batch_size,
        "steps_per_arm": args.steps,
        "pairs": pairs,
        "mean_off_ms": round(mean_off, 2),
        "mean_on_ms": round(mean_on, 2),
        "speedup": round(mean_off / mean_on, 3),
    }))


if __name__ == "__main__":
    main()
