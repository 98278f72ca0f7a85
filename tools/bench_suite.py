"""Extended benchmark suite (one JSON line per measurement).

``bench.py`` is the driver-facing headline (bf16 eval tiles/s); this tool
measures the rest of the performance surface on whatever platform is live:

  * eval forward tiles/s at bf16, f32 and int8 (``--modes``)
  * train-step latency for stages 1/2/3
  * whole-raster spatially-sharded inference (needs >1 device or a virtual
    CPU mesh via --xla_force_host_platform_device_count)

Timing uses chained in-jit scans with one scalar readback, because the axon
TPU tunnel does not block in ``block_until_ready`` and adds large RTT per
readback (docs/PERF_NOTES.md).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def _bench(fn, *args, reps=3):
    fn(*args)  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        fn(*args)
    return (time.time() - t0) / reps


def bench_eval(model, variables, batch, k_chain, dtype_name, int8, reps,
               tile=512, fastpath=False, fused_stages=(), fused_stem=False,
               int8_stages=None, calibrate=False):
    import jax
    import jax.numpy as jnp

    from uemda_tpu.infer.quant import Int8Model

    dtype = jnp.dtype(dtype_name)
    if fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath

        calib = ([jax.random.normal(jax.random.key(3), (8, tile, tile, 3),
                                    dtype)] if calibrate else None)
        m, v = build_fastpath(model, variables, dtype=dtype, int8=int8,
                              fused_stages=tuple(fused_stages),
                              fused_stem=fused_stem, int8_stages=int8_stages,
                              calibration_batches=calib)
    else:
        v = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
        )
        m = Int8Model(model) if int8 else model

    @jax.jit
    def many(v, x):
        def body(c, _):
            out = m.apply(v, c, train=False)
            return c + out[..., :3].mean() * 1e-6, out.mean()

        _, means = jax.lax.scan(body, x, None, length=k_chain)
        return means.mean()

    x = jax.random.normal(jax.random.key(1), (batch, tile, tile, 3), dtype)
    dt = _bench(lambda a, b: float(many(a, b)), v, x, reps=reps)
    return k_chain * batch / dt


def bench_train_steps(cfg, model, variables, reps, batch=8):
    import jax
    import jax.numpy as jnp

    from uemda_tpu.train.loop import build_state, default_hparams
    from uemda_tpu.train import steps as S

    h, w = cfg.crop
    key = jax.random.key(0)
    img = jax.random.uniform(key, (batch, h, w, 3), maxval=255.0)
    lab = jnp.zeros((batch, h, w), jnp.int32)
    soft = jax.nn.softmax(jax.random.normal(key, (batch, h, w, cfg.class_num)))
    sup = jnp.zeros((batch, h, w), jnp.int32)
    bs = {"image": img, "label": lab}

    def run(step_fn, batch_t, chain=1):
        # the step donates its input state (CLAUDE.md convention): deep-copy
        # the shared variables and thread the returned state through reps.
        # chain>1: K async dispatches per readback, so the per-step figure is
        # ~device time + RTT/K — the resident-data / device-side metric
        # (VERDICT r3 item 7; the K=1 figure is tunnel-RTT-dominated: r3
        # measured 113.6 ms wall vs 39.3 ms XProf device for stage 1).
        v = jax.tree.map(jnp.array, variables)
        state = build_state(v, cfg, 100, feat_channels=model.config.inchannels)
        state, metrics = step_fn(state, bs, batch_t, key)
        float(metrics["loss"])  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            for _ in range(chain):
                state, metrics = step_fn(state, bs, batch_t, key)
            float(metrics["loss"])
        return (time.time() - t0) / (reps * chain) * 1000

    out = {}
    step1 = S.make_src_step(model, default_hparams(cfg, align_domain=True))
    out["stage1_step_ms"] = run(step1, {"image": img})
    out["stage1_step_ms_dev"] = run(step1, {"image": img}, chain=8)
    step2 = S.make_align_step(
        model, default_hparams(cfg, align_domain=True, refine=True, refine_mode="all")
    )
    out["stage2_step_ms"] = run(step2, {"image": img, "sup": sup})
    out["stage2_step_ms_dev"] = run(step2, {"image": img, "sup": sup}, chain=8)
    step3 = S.make_ssl_step(
        model, default_hparams(cfg, target_loss="uvem", refine=True, refine_mode="all")
    )
    out["stage3_step_ms"] = run(step3, {"image": img, "prob": soft, "sup": sup})
    out["stage3_step_ms_dev"] = run(step3, {"image": img, "prob": soft, "sup": sup},
                                    chain=8)
    return out


def bench_raster(model, variables, n_devices, reps, hw=(2048, 2048), tile=512,
                 chunk=8):
    import jax
    import jax.numpy as jnp

    from uemda_tpu.infer.raster import make_raster_predictor
    from uemda_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices)
    fn = make_raster_predictor(model, mesh, hw, tile=(tile, tile), window_chunk=chunk)
    raster = jax.random.normal(jax.random.key(2), hw + (3,), jnp.float32)
    dt = _bench(lambda: float(fn(variables, raster).sum()), reps=reps)
    mpx = hw[0] * hw[1] / 1e6
    return mpx / dt


def bench_e2e_serve(model, variables, reps, tile=512, n_images=64,
                    batch=16, fastpath=True, tta=False, workdir=None,
                    decode_workers=1):
    """HOST-INCLUSIVE serving throughput: PNG decode -> prefetch ->
    normalize -> slide(+TTA) forward -> argmax -> id-PNG write, end to end
    wall clock over a synthetic image directory (the tiles/s headline is
    pure device time; this is the number a deployment actually sees —
    VERDICT r1 item 7).  Mirrors tools/infer_dir.py's serving loop.
    ``decode_workers``: the --decode-workers thread pool (VERDICT r2 item
    7) — measured at 1 and 4 by the suite to record the scaling curve."""
    import shutil
    import tempfile

    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from uemda_tpu.datasets.base import SegDataset
    from uemda_tpu.datasets.meta import IsprsDA
    from uemda_tpu.datasets.synthetic import make_synthetic_dataset
    from uemda_tpu.infer.evaluate import device_batches, normalize
    from uemda_tpu.infer.slide import make_predictor

    root = workdir or tempfile.mkdtemp(prefix="uemda_e2e_bench_")
    img_dir, _ = make_synthetic_dataset(
        root, IsprsDA, n_train=n_images, n_val=1, hw=tile, seed=0
    )
    out_dir = os.path.join(root, "out")
    os.makedirs(out_dir, exist_ok=True)
    dataset = SegDataset(IsprsDA, [img_dir], None, label_type="none")
    mean = std = (127.5,) * 3

    if fastpath:
        from uemda_tpu.infer.fastpath import build_fastpath

        m, v = build_fastpath(model, variables)
    else:
        m, v = model, jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )

    def run_once():
        predictor, hw = None, None
        for indices, images, n, _ in device_batches(
            dataset, batch, None, decode_workers=decode_workers
        ):
            if predictor is None or images.shape[1:3] != hw:
                hw = images.shape[1:3]
                predictor = make_predictor(m, (tile, tile), hw, tta=tta)
            probs = predictor(v, normalize(images, mean, std))
            pred = np.asarray(jnp.argmax(probs[:n], -1).astype(jnp.int32))
            for j, idx in enumerate(indices):
                stem = os.path.splitext(dataset.filename(idx))[0]
                Image.fromarray(pred[j].astype(np.uint8)).save(
                    os.path.join(out_dir, stem + "_ids.png")
                )

    run_once()  # compile + page-cache warm
    t0 = time.time()
    for _ in range(reps):
        run_once()
    dt = (time.time() - t0) / reps
    if workdir is None:
        shutil.rmtree(root, ignore_errors=True)
    return len(dataset) / dt


def main():
    parser = argparse.ArgumentParser(description="Extended benchmarks.")
    parser.add_argument("--modes", type=str,
                        default="eval_bf16,eval_int8,eval_fastpath,"
                        "eval_fastpath_int8,eval_fastpath_int8cal_all,"
                        "train,raster,e2e_serve",
                        help="comma list: eval_bf16,eval_f32,eval_int8,"
                        "eval_fastpath,eval_fastpath_int8,"
                        "eval_fastpath_int8cal_all,train,raster,"
                        "e2e_serve (host-inclusive decode->infer->write)")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--k-chain", type=int, default=None)
    parser.add_argument("--reps", type=int, default=None)
    parser.add_argument("--raster-devices", type=int, default=None)
    parser.add_argument("--train-batch", type=int, default=None,
                        help="train-step batch size (default 8, the "
                        "reference schedule)")
    parser.add_argument("--tiny", action="store_true",
                        help="smoke mode: resnet18, 64px tiles, 256px raster")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = args.batch or (64 if on_tpu else 2)
    k_chain = args.k_chain or (8 if on_tpu else 1)
    reps = args.reps or (3 if on_tpu else 1)

    tile = 64 if args.tiny else 512
    import dataclasses

    from uemda_tpu.models import ResNetEncoder
    from uemda_tpu.models.config import PPMConfig

    name = "resnet18" if args.tiny else "resnet50"
    fc_dim = ResNetEncoder.out_channels(name)
    cfg_model = DeeplabV2Config.uemda_default(num_classes=6, resnet_type=name)
    if fc_dim != 2048:
        cfg_model = dataclasses.replace(
            cfg_model,
            ppm=PPMConfig(num_classes=6, fc_dim=fc_dim),
            inchannels=fc_dim,
        )
    model = DeeplabV2(cfg_model)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.key(0)}, jnp.ones((1, tile, tile, 3)), train=False
        )
    )()

    def emit(metric, value, unit):
        print(json.dumps({"metric": metric, "value": round(value, 2),
                          "unit": unit, "platform": jax.devices()[0].platform}))

    modes = args.modes.split(",")
    if "eval_bf16" in modes:
        emit("eval_bf16_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", False,
                        reps, tile), "tiles/s")
    if "eval_f32" in modes:
        emit("eval_f32_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "float32", False,
                        reps, tile), "tiles/s")
    if "eval_int8" in modes:
        emit("eval_int8_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", True,
                        reps, tile), "tiles/s")
    if "eval_fastpath" in modes:
        emit("eval_fastpath_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", False,
                        reps, tile, fastpath=True), "tiles/s")
    if "eval_fastpath_fused" in modes:
        # exact-math fused identity blocks (ops/pallas_resblock.py) on the
        # HBM-bound early stages — the in-step A/B vs eval_fastpath
        emit("eval_fastpath_fused_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", False,
                        reps, tile, fastpath=True, fused_stages=(1, 2)),
             "tiles/s")
    if "eval_fastpath_stem" in modes:
        # fused Pallas stem conv + maxpool (ops/pallas_stem.py) — the
        # in-step A/B vs eval_fastpath (exact math)
        emit("eval_fastpath_stem_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", False,
                        reps, tile, fastpath=True, fused_stem=True),
             "tiles/s")
    if "eval_fastpath_stem_int8" in modes:
        emit("eval_fastpath_stem_int8_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", True,
                        reps, tile, fastpath=True, fused_stem=True),
             "tiles/s")
    if "eval_fastpath_int8" in modes:
        emit("eval_fastpath_int8_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", True,
                        reps, tile, fastpath=True), "tiles/s")
    if "eval_fastpath_int8cal_all" in modes:
        # the measured-fastest serving mode: calibrated static scales +
        # int8 on every backbone stage (docs/PERF_NOTES.md round 2)
        emit("eval_fastpath_int8cal_all_tiles_per_sec",
             bench_eval(model, variables, batch, k_chain, "bfloat16", True,
                        reps, tile, fastpath=True, fused_stem=True,
                        int8_stages=(1, 2, 3, 4), calibrate=True), "tiles/s")
    if "train" in modes:
        from uemda_tpu.config import load_config

        cfg = load_config("2vaihingen")
        if args.tiny:
            cfg = dataclasses.replace(cfg, crop=(64, 64), model="resnet18")
        tb = args.train_batch or (2 if args.tiny else 8)
        for k, v in bench_train_steps(
            cfg, model, variables, reps, batch=tb
        ).items():
            emit(k + (f"_b{tb}" if tb != 8 else ""), v, "ms")
    if "e2e_serve" in modes:
        # decode-thread scaling curve (VERDICT r2 item 7): w1 = the old
        # single-decoder number; w4 = the --decode-workers 4 pool (flat on
        # this 1-core host, the knob is for deployment hosts)
        for w in (1, 4):
            emit(f"e2e_serve_img_per_sec_w{w}",
                 bench_e2e_serve(model, variables, reps, tile=tile,
                                 n_images=8 if args.tiny else 64,
                                 batch=2 if args.tiny else 16,
                                 decode_workers=w),
                 "img/s (host-inclusive)")
    if "raster" in modes:
        n = args.raster_devices or len(jax.devices())
        hw = (256, 256) if args.tiny else (2048, 2048)
        emit(f"raster{hw[0]}_mpx_per_sec_{n}dev",
             bench_raster(model, variables, n, reps, hw=hw, tile=tile,
                          chunk=2 if args.tiny else 8), "Mpx/s")


if __name__ == "__main__":
    main()
