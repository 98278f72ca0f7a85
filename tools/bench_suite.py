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


# peak dense bf16 FLOP/s by TPU generation (public spec sheets) — the MFU
# denominator. Matched loosely against jax.devices()[0].device_kind.
_PEAK_BF16 = (
    ("v6", 918e12), ("trillium", 918e12),
    ("v5p", 459e12), ("v5 lite", 197e12), ("v5e", 197e12),
    ("v4", 275e12),
)


def peak_bf16_flops():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for tag, peak in _PEAK_BF16:
        if tag in kind:
            return peak
    return None


def bench_train_steps(cfg, model, variables, reps, batch=8, k_dev=16):
    import jax
    import jax.numpy as jnp

    from uemda_tpu.train.loop import _make_multi_step, build_state, default_hparams
    from uemda_tpu.train import steps as S

    h, w = cfg.crop
    key = jax.random.key(0)
    img = jax.random.uniform(key, (batch, h, w, 3), maxval=255.0)
    lab = jnp.zeros((batch, h, w), jnp.int32)
    soft = jax.nn.softmax(jax.random.normal(key, (batch, h, w, cfg.class_num)))
    sup = jnp.zeros((batch, h, w), jnp.int32)
    bs = {"image": img, "label": lab}
    peak = peak_bf16_flops()

    def run(step_fn, batch_t):
        # the step donates its input state (CLAUDE.md convention): deep-copy
        # the shared variables and thread the returned state through reps.
        v = jax.tree.map(jnp.array, variables)
        state = build_state(v, cfg, 100, feat_channels=model.config.inchannels)
        state, metrics = step_fn(state, bs, batch_t, key)
        float(metrics["loss"])  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            state, metrics = step_fn(state, bs, batch_t, key)
            float(metrics["loss"])
        return state, (time.time() - t0) / reps * 1000

    def run_dev(step_fn, state, batch_t):
        # DEVICE-SIDE metric: k_dev steps inside ONE jitted lax.scan (the
        # production --steps-per-call program, train/loop.py::_make_multi_step)
        # — one dispatch + one readback amortized over k_dev, data resident.
        # The r4 version looped k Python dispatches instead, and each dispatch
        # through the axon tunnel costs ~45 ms that is NOT readback RTT, so it
        # reported ~87 ms/step against a 39.3 ms XProf device time (VERDICT r4
        # item 4 / docs/PERF_NOTES.md round-5 reconciliation). This form
        # matches XProf: wall = device + (dispatch + RTT)/k_dev.
        multi = _make_multi_step(step_fn, with_target=True)
        stack = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jnp.broadcast_to(a, (k_dev,) + a.shape), t)
        bs_k, bt_k = stack(bs), stack(batch_t)
        flops = None
        try:
            cost = multi.lower(state, bs_k, bt_k, key,
                               jnp.int32(0)).compile().cost_analysis()
            flops = float(cost["flops"]) / k_dev
        except Exception:  # backend without cost analysis
            pass
        state, metrics = multi(state, bs_k, bt_k, key, jnp.int32(0))
        float(metrics["loss"])  # warm
        t0 = time.time()
        for _ in range(reps):
            state, metrics = multi(state, bs_k, bt_k, key, jnp.int32(0))
            float(metrics["loss"])
        return (time.time() - t0) / (reps * k_dev) * 1000, flops

    out = {}

    def measure(name, step_fn, batch_t):
        state, wall = run(step_fn, batch_t)
        dev, flops = run_dev(step_fn, state, batch_t)
        out[f"{name}_step_ms"] = wall
        out[f"{name}_step_ms_dev"] = dev
        out[f"{name}_dispatch_ms"] = wall - dev  # per-dispatch tunnel/host cost
        if flops:
            out[f"{name}_gflops_per_step"] = flops / 1e9
            if peak:
                out[f"{name}_mfu_pct"] = flops / (dev / 1e3) / peak * 100

    measure("stage1", S.make_src_step(
        model, default_hparams(cfg, align_domain=True)), {"image": img})
    measure("stage2", S.make_align_step(
        model, default_hparams(cfg, align_domain=True, refine=True,
                               refine_mode="all")),
        {"image": img, "sup": sup})
    measure("stage3", S.make_ssl_step(
        model, default_hparams(cfg, target_loss="uvem", refine=True,
                               refine_mode="all")),
        {"image": img, "prob": soft, "sup": sup})
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
                        default="flops,eval_bf16,eval_int8,eval_fastpath,"
                        "eval_fastpath_int8,eval_fastpath_int8cal_all,"
                        "train,raster,e2e_serve",
                        help="comma list: flops (compiled cost_analysis "
                        "GF/tile),eval_bf16,eval_f32,eval_int8,"
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
    if "flops" in modes:
        # compiled-executable FLOP counts (the BASELINE.md A100-denominator
        # derivation and the MFU numerators cite these): eval forward per
        # 512² tile, from XLA cost_analysis of the exact serving program.
        fb = 4 if args.tiny else 8
        v16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        x = jnp.zeros((fb, tile, tile, 3), jnp.bfloat16)
        try:
            cost = fwd.lower(v16, x).compile().cost_analysis()
            emit("eval_fwd_gflops_per_tile", float(cost["flops"]) / fb / 1e9,
                 "GF/tile")
        except Exception as e:  # backend without cost analysis
            print(json.dumps({"metric": "eval_fwd_gflops_per_tile",
                              "error": repr(e)}))
        peak = peak_bf16_flops()
        if peak:
            emit("device_peak_bf16_tflops", peak / 1e12, "TFLOP/s")
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
            unit = ("%" if k.endswith("_mfu_pct")
                    else "GF" if k.endswith("_gflops_per_step") else "ms")
            emit(k + (f"_b{tb}" if tb != 8 else ""), v, unit)
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
