"""Headline benchmark: 512² tiles/sec/chip, sliding-window eval inference.

Measures the flagship model (ResNet-50 OS16 + dual PPM heads + instance
norm, eval-mode averaged-softmax forward — the reference ``tools/eval.py`` /
``infer_single`` path) in bf16 on one chip. Throughput is pure device time:
K forwards are chained inside one jitted scan with a single value readback,
because (a) jax dispatch is async anyway in production pipelines and (b) the
axon TPU tunnel adds large RTT to every host readback which would otherwise
dominate the measurement.

Baseline: the reference is single-GPU PyTorch with no published numbers
(BASELINE.md); the target is >=5x an estimated A100 throughput. We estimate
the reference torch TF32 pipeline at ~200 tiles/s on A100 (≈139 GFLOPs per
512² eval forward, per-window Python loop, 8 sequential TTA forwards), so
vs_baseline = tiles_per_sec / (5 * 200).
"""

import json
import time

A100_REFERENCE_TILES_PER_SEC = 200.0
TARGET_MULTIPLIER = 5.0

from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def _probe_devices(timeout_s: float = 300.0):
    """jax.devices() with a watchdog: the axon TPU tunnel hangs forever when
    the relay is down (STATUS.md round-1 incident) — degrade to a clean JSON
    line instead of hanging the driver."""
    import threading

    box = {}

    def probe():
        import jax

        box["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return box.get("devices")


def main():
    # two probes: a transient tunnel stall at the first attempt must not
    # zero the round artifact (the tunnel recovers between processes more
    # often than within one — STATUS.md r3 outage log)
    if _probe_devices() is None and _probe_devices(240.0) is None:
        print(
            json.dumps(
                {
                    "metric": "512px_tiles_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "tiles/s",
                    "vs_baseline": 0.0,
                    "note": "tpu tunnel unreachable (device probe timed out "
                    "twice); last measured 1319.9 tiles/s headline / 1066.3 "
                    "exact-math (BENCH_r02.json) — see docs/PERF_NOTES.md",
                }
            )
        )
        return

    import jax
    import jax.numpy as jnp

    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    cfg = DeeplabV2Config.uemda_default(num_classes=6)
    model = DeeplabV2(cfg)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, 512, 512, 3)), train=False
        )
    )()
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # serving fast path (infer/fastpath.py): exact-math BN fold + fused dual
    # head, plus the int8 variant (compute-bound GEMMs on the MXU int8 mode;
    # serving-mode mIoU gate (tools/serving_gate.py over the three
    # schedule-scale trained checkpoints, runs/tpu_results/
    # full_synth_schedule.md): worst deltas vs standard — fastpath 0.00065,
    # calibrated int8 0.00141. Fall back to the plain apply if the fold
    # ever rejects the config.
    modes, build_errors = [], []
    from uemda_tpu.infer.fastpath import build_fastpath

    try:
        modes.append(("fastpath_bf16",) + build_fastpath(model, variables, dtype=dtype))
    except Exception as e:
        build_errors.append(f"fastpath build failed: {type(e).__name__}: {e}")
    if modes and on_tpu:
        # exact-math fused stem conv+maxpool (ops/pallas_stem.py) — measured
        # faster than XLA; the fused resblock stages measured slower and are
        # not enabled (docs/PERF_NOTES.md A/B). Failure must not discard the
        # plain fold.
        try:
            modes.append(
                ("fastpath_bf16_fstem",)
                + build_fastpath(model, variables, dtype=dtype,
                                 fused_stem=True)
            )
        except Exception as e:
            build_errors.append(f"fused fastpath build failed: {type(e).__name__}: {e}")
    if modes and on_tpu:
        # int8 build failure must not discard the working bf16 fastpath
        try:
            calib = [jax.random.normal(jax.random.key(3), (8, 512, 512, 3), dtype)]
            # static activation scales from one same-distribution batch:
            # +2.4% over dynamic per-tensor amax (1017 -> 1041 tiles/s);
            # _all = calibrated int8 on EVERY backbone stage — with static
            # scales the quantize fuses into each producer so the HBM-bound
            # early stages read int8 (1286 -> 1326 tiles/s, gated <=0.0012
            # mIoU on the 3 schedule-scale checkpoints)
            m8, p8 = build_fastpath(model, variables, dtype=dtype, int8=True,
                                    calibration_batches=calib)
            modes.append(("fastpath_int8cal", m8, p8))
            # fused_stem=True: matches bench_suite's eval_fastpath_int8cal_all
            # and the config the 1295-1326 tiles/s records were measured with
            m8a, p8a = build_fastpath(model, variables, dtype=dtype, int8=True,
                                      int8_stages=(1, 2, 3, 4), fused_stem=True,
                                      calibration_batches=calib)
            modes.append(("fastpath_int8cal_all", m8a, p8a))
        except Exception as e:
            build_errors.append(f"int8 fastpath build failed: {type(e).__name__}: {e}")
    if not modes:
        modes = [(
            "standard",
            model,
            jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            ),
        )]

    batches = (64, 96, 128) if on_tpu else (2,)
    k_chain = 8 if on_tpu else 1

    reps = 3 if on_tpu else 1
    tiles_per_sec, best_mode, sweep_error = 0.0, None, None
    # the exact-math modes tracked separately so the target never hinges on
    # int8 alone (VERDICT r1): standard / fastpath_bf16 / fastpath_bf16_fused
    exact_tiles, exact_mode = 0.0, None
    for mode_name, mode_model, mode_vars in modes:

        @jax.jit
        def many(v, x, _m=mode_model):
            def body(c, _):
                out = _m.apply(v, c, train=False)
                # tie iterations together so the scan can't be parallelized away
                return c + out[..., :3].mean() * 1e-6, out.mean()
            _, means = jax.lax.scan(body, x, None, length=k_chain)
            return means.mean()

        for batch in batches:
            # larger batches improve MXU utilization until HBM runs out —
            # sweep and keep the best; an OOM at one size must not zero the run
            try:
                x = jax.random.normal(
                    jax.random.key(1), (batch, 512, 512, 3), dtype
                )
                float(many(mode_vars, x))  # compile + warm
                t0 = time.time()
                for _ in range(reps):
                    float(many(mode_vars, x))  # single readback per chain
                dt = (time.time() - t0) / reps
                rate = k_chain * batch / dt
                if rate > tiles_per_sec:
                    tiles_per_sec = rate
                    best_mode = mode_name
                if "int8" not in mode_name and rate > exact_tiles:
                    exact_tiles, exact_mode = rate, mode_name
            except Exception as e:  # OOM at larger batches ends the sweep
                sweep_error = f"{mode_name} batch {batch}: {type(e).__name__}: {e}"
                break
    if tiles_per_sec == 0.0:
        # no batch succeeded: report the failure instead of a silent zero
        print(
            json.dumps(
                {
                    "metric": "512px_tiles_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "tiles/s",
                    "vs_baseline": 0.0,
                    "note": f"measurement failed: {sweep_error}"[:400],
                }
            )
        )
        return

    # train-step throughput in the round artifact (VERDICT r2 item 6): a
    # regression in any stage's step time now shows up in BENCH_r{N}.json,
    # not only in PERF_NOTES. Times include the axon tunnel RTT on the
    # per-step readback (the loop's real dispatch regime at K=1).
    train_note = ""
    if on_tpu:
        try:
            from tools.bench_suite import bench_train_steps
            from uemda_tpu.config import load_config

            tb = 8  # the reference schedule's batch size
            tms = bench_train_steps(load_config("2vaihingen"), model,
                                    variables, reps=2, batch=tb)
            wall = {k: v for k, v in tms.items() if not k.endswith("_dev")}
            dev = {k: v for k, v in tms.items() if k.endswith("_dev")}
            train_note = (
                "train (b8, ms/step incl. tunnel RTT): "
                + ", ".join(f"{k.split('_')[0]}={v:.1f}"
                            for k, v in wall.items())
                + "; device-side ms/step (8 steps per readback, RTT/8): "
                + ", ".join(f"{k.split('_')[0]}={v:.1f}"
                            for k, v in dev.items())
                + "; train img/s/chip (device): "
                + ", ".join(f"{k.split('_')[0]}={tb / (v / 1000):.1f}"
                            for k, v in dev.items())
                + "; "
            )
        except Exception as e:
            train_note = f"train bench failed: {type(e).__name__}: {e}; "

    print(
        json.dumps(
            {
                "metric": "512px_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(
                    tiles_per_sec
                    / (TARGET_MULTIPLIER * A100_REFERENCE_TILES_PER_SEC),
                    4,
                ),
                "note": f"serving mode {best_mode}; "
                + train_note
                + (
                    f"exact-math {exact_mode}={round(exact_tiles, 1)} tiles/s "
                    f"(vs_baseline {round(exact_tiles / (TARGET_MULTIPLIER * A100_REFERENCE_TILES_PER_SEC), 4)}); "
                    if exact_mode else "no exact-math mode measured; "
                )
                + "serving_gate worst mIoU delta vs standard over 3 trained "
                "ckpts: fastpath 0.00065, calibrated int8 0.00141 — "
                "runs/tpu_results/full_synth_schedule.md"
                + ("; " + "; ".join(build_errors) if build_errors else ""),
            }
        )
    )


if __name__ == "__main__":
    main()
