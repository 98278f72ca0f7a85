"""Shared trainer driver: model/state construction, the step loop with
periodic eval + best-checkpoint tracking, and pipeline-stage hand-off.

Factors out what every reference tool repeats (``tools/train_src.py:43-166``
etc.): build Deeplabv2 + Aligner + loaders, loop steps, log every 50, eval
every EVAL_EVERY keeping ``<target>_best`` on mIoU improvement. Differences
from the reference runtime model:

  * one resident process per stage function, state handed off in memory or
    via msgpack checkpoints (the reference forks 5 OS processes glued by
    .pth files, SURVEY §3.0);
  * the host thread only feeds raw uint8 tiles; augmentation + model +
    losses are one jitted step;
  * under a data mesh the same loop drives every replica (SPMD).
"""

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from uemda_tpu.config import PairConfig
from uemda_tpu.datasets.base import SegDataset, infinite_batches
from uemda_tpu.infer.evaluate import evaluate_dataset
from uemda_tpu.models import DeeplabV2, DeeplabV2Config
from uemda_tpu.models.port_torch import load_torch_state_dict, port_imagenet_backbone
from uemda_tpu.parallel import shard_batch, shard_pytree_replicated
from uemda_tpu.train.checkpoints import load_checkpoint, save_checkpoint
from uemda_tpu.train.lr import poly_warmup_schedule
from uemda_tpu.train.optim import make_optimizer
from uemda_tpu.train.state import TrainState, create_train_state
from uemda_tpu.train.steps import StageHParams


def resolve_model_name(model: str) -> str:
    name = str(model).lower()
    return "resnet50" if name == "resnet" else name


def build_model(cfg: PairConfig, pretrained: Optional[str] = None):
    """The one model config every reference tool uses (train_src.py:63-80);
    head/feature widths follow the backbone (2048 for resnet50/101)."""
    import dataclasses as _dc

    from uemda_tpu.models import ResNetEncoder
    from uemda_tpu.models.config import PPMConfig

    name = resolve_model_name(cfg.model)
    fc_dim = ResNetEncoder.out_channels(name)
    mcfg = DeeplabV2Config.uemda_default(
        num_classes=cfg.class_num, resnet_type=name, pretrained=pretrained
    )
    if fc_dim != 2048:
        mcfg = _dc.replace(
            mcfg,
            ppm=PPMConfig(num_classes=cfg.class_num, fc_dim=fc_dim),
            inchannels=fc_dim,
        )
    return DeeplabV2(mcfg)


def feat_channels_of(model) -> int:
    return model.config.inchannels


def init_variables(model, cfg: PairConfig, seed: int = 0):
    sample = jnp.ones((1, cfg.crop[0], cfg.crop[1], 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.key(seed)}, sample, train=False)
    )()
    pre = model.config.backbone.pretrained
    if pre:
        if pre.endswith((".pth", ".pt")):
            sd = load_torch_state_dict(pre)
            deep = model.config.backbone.resnet_type.endswith("v1c")
            variables = port_imagenet_backbone(sd, variables, deep_stem=deep)
        else:
            variables = load_checkpoint(pre, variables)
    return variables


def build_state(
    variables,
    cfg: PairConfig,
    stop_steps: int,
    freeze_at: int = 0,
    prototypes=None,
    balance_temp: float = 2.0,
    feat_channels: int = 2048,
    accum_steps: int = 1,
) -> TrainState:
    from uemda_tpu.train.optim import freeze_mask

    # with accumulation the schedule advances once per REAL update, so its
    # horizon is the number of updates, not micro-steps
    schedule = poly_warmup_schedule(
        cfg.learning_rate, -(-stop_steps // max(accum_steps, 1)), cfg.power
    )
    mask = (
        freeze_mask(variables["params"], freeze_at) if freeze_at > 0 else None
    )
    tx = make_optimizer(
        schedule, cfg.momentum, cfg.weight_decay, clip_norm=32.0,
        trainable_mask=mask, accum_steps=accum_steps,
    )
    return create_train_state(
        variables, tx, cfg.class_num, feat_channels=feat_channels,
        ignore_label=cfg.ignore_label, prototypes=prototypes,
        balance_temp=balance_temp,
    )


def variables_of(state: TrainState) -> Dict:
    return {"params": state.params, "batch_stats": state.batch_stats}


@dataclasses.dataclass
class LoopHooks:
    eval_every: int = 500
    log_every: int = 50
    eval_fn: Optional[Callable] = None  # (state) -> miou
    on_best: Optional[Callable] = None  # (state, step, miou)
    on_eval: Optional[Callable] = None  # (state, step, miou)
    # full-TrainState snapshot for exact resume (params + optimizer +
    # prototypes + balance/GHM statistics + step); written at every eval
    # cadence and at loop end. The reference loses all of this on restart
    # (SURVEY §5: model weights only).
    state_path: Optional[str] = None
    # failure detection: the axon tunnel (and real TPU runtimes) can die
    # mid-run, leaving every device readback hung forever. Metric/eval
    # readbacks run under this deadline; on expiry the loop raises
    # TimeoutError so an orchestrator can restart with --resume auto from
    # the last state snapshot instead of hanging. 0 disables. Unattended
    # drivers can tighten it via UEMDA_HANG_TIMEOUT_S (a hung tunnel then
    # costs minutes, not the conservative default) — env read at hook
    # construction so one process keeps one deadline.
    hang_timeout_s: float = dataclasses.field(
        default_factory=lambda: float(
            os.environ.get("UEMDA_HANG_TIMEOUT_S", 900.0)
        )
    )
    # K iterations per jitted call (lax.scan over K stacked batches): on
    # dispatch-latency-bound hosts this recovers the pure device rate
    # (68 -> 40 ms/step measured through the axon tunnel, PERF_NOTES.md).
    # Math, PRNG sequence and log/eval cadences are identical to K=1 —
    # chunks clamp at every boundary. Under --multihost the K process-local
    # chunks stack on host before global-array assembly (_stack_global).
    steps_per_call: int = 1


def _deadline(fn, timeout_s: float, what: str):
    """Run a device-readback closure under a wall-clock deadline. A hung
    runtime readback cannot be cancelled, so on expiry the (daemon) worker
    is abandoned and TimeoutError is raised to the caller — fail fast with
    the last checkpoint on disk rather than hang the training job."""
    if not timeout_s:
        return fn()
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=1)

    def work():
        try:
            q.put((True, fn()))
        except BaseException as e:  # noqa: BLE001 - forwarded
            q.put((False, e))

    t = threading.Thread(target=work, daemon=True)
    t.start()
    try:
        ok, val = q.get(timeout=timeout_s)
    except queue.Empty:
        raise TimeoutError(
            f"{what} exceeded {timeout_s:.0f}s — device runtime presumed "
            "dead; restart with --resume auto from the last state snapshot"
        ) from None
    if not ok:
        raise val
    return val


def _device_iter(iterator, mesh, depth: int = 2, host_only: bool = False):
    """Second prefetch stage: pull host batches and device_put (or
    mesh-shard) them on a worker thread so upload overlaps compute.

    Composes with the decode prefetch (datasets/prefetch.py) — the worker
    here is that stage's single consumer, so the queue handoff stays
    race-free.  ``host_only`` keeps batches on host (multi-host chunked
    path: the loop stacks K process-local batches BEFORE assembling the
    global array, so only the prefetch overlap is kept here)."""
    from uemda_tpu.datasets.prefetch import prefetch

    if host_only:
        def put(b):
            return b
    elif mesh is not None:
        def put(b):
            return shard_batch(mesh, b)
    else:
        def put(b):
            return jax.tree.map(jax.device_put, b)

    return prefetch((put(b) for b in iterator), depth=depth)


def _stack_batches(batches):
    """K device batches -> one pytree with a new leading K axis (device
    concat; small next to the K steps it feeds)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *batches)


def _stack_global(mesh, batches):
    """Multi-host chunked path: K PROCESS-LOCAL host batches -> one global
    (K, B_global, ...) tree with axis 1 sharded along 'data'. The stack
    happens on host BEFORE ``make_array_from_process_local_data`` — each
    process contributes its rows of all K chunks in one assembly, so the
    scanned multi-step sees exactly the batch sequence K=1 would have fed
    (closes VERDICT r2's silent K=1 fallback)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    return jax.tree.map(
        lambda *xs: jax.make_array_from_process_local_data(
            sharding, np.stack([np.asarray(x) for x in xs])
        ),
        *batches,
    )


# one multi-step jit per (step_fn, with_target) for the PROCESS lifetime:
# the gene-chunked trainers call run_training_loop once per regeneration
# round, and a fresh jit wrapper per round would retrace the K-step scan
# every time. Strong refs are intentional (a handful per process) — jitted
# step objects don't support weakrefs.
_MULTI_STEP_CACHE: Dict = {}


def _make_multi_step(step_fn, with_target: bool):
    """K training steps in ONE jitted call: scan over the stacked batches,
    per-step keys ``fold_in(key0, i0 + k)`` with a TRACED chunk start so
    every same-K chunk reuses one compilation — the key sequence is
    identical to the per-step loop. Returns the final state and the LAST
    step's metrics (what the boundary-aligned log would have read under
    K=1)."""
    import functools as _ft

    cached = _MULTI_STEP_CACHE.get((id(step_fn), with_target))
    if cached is not None:
        return cached[1]

    # the per-step fn is already jitted with donated state; inline its
    # underlying function so nested-jit donation warnings don't fire
    inner = getattr(step_fn, "__wrapped__", step_fn)

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def multi(state, bs, bt, key0, i0):
        def body(st, xs):
            k, b_s, b_t = xs
            sub = jax.random.fold_in(key0, i0 + k)
            if with_target:
                return inner(st, b_s, b_t, sub)
            return inner(st, b_s, sub)

        n = jax.tree.leaves(bs)[0].shape[0]
        state, ms = jax.lax.scan(body, state, (jnp.arange(n), bs, bt))
        return state, jax.tree.map(lambda a: a[-1], ms)

    _MULTI_STEP_CACHE[(id(step_fn), with_target)] = (step_fn, multi)
    return multi


def add_loop_flags(parser) -> None:
    """Shared trainer CLI flags consumed by :class:`LoopHooks`."""
    from uemda_tpu.utils.log import str2bool

    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="K iterations per jitted call (scan over K "
                             "stacked batches) — removes per-step dispatch "
                             "latency; math/PRNG/cadences identical to 1")
    parser.add_argument("--host-crop", type=str2bool, default=0,
                        help="crop each train sample to cfg.crop on the "
                             "host before upload instead of shipping the "
                             "full tile (4× less host→device traffic at "
                             "1024² tiles, 16× for stage-3 prob labels); "
                             "same augmentation law, but crop draws come "
                             "from a host stream so runs are only "
                             "bit-reproducible against the same flag")


def host_crop_of(args, cfg) -> object:
    """``cfg.crop`` if the trainer was launched with --host-crop, else None
    (what :func:`make_source_iter`/:func:`make_target_iter` expect)."""
    return cfg.crop if getattr(args, "host_crop", False) else None


def run_training_loop(
    state: TrainState,
    step_fn: Callable,
    source_iter,
    target_iter,
    stop_steps: int,
    logger,
    hooks: LoopHooks,
    mesh=None,
    rng_seed: int = 2333,
    profile_dir: Optional[str] = None,
    start_step: int = 0,
) -> TrainState:
    """Lock the run dir (when snapshotting), then run the loop.

    Two trainers on one run dir race the checkpoint files and interleave
    metrics.jsonl (observed r4: an orphaned driver chain vs its restart);
    the second fails fast with both pids named. A lock whose holder died
    is stolen, so --resume auto after a crash/timeout needs no cleanup."""
    run_lock = None
    if jax.process_index() == 0 and hooks.state_path:
        from uemda_tpu.train.checkpoints import RunDirLock

        run_lock = RunDirLock(os.path.dirname(hooks.state_path)).acquire()
    try:
        return _run_training_loop(
            state, step_fn, source_iter, target_iter, stop_steps, logger,
            hooks, mesh=mesh, rng_seed=rng_seed, profile_dir=profile_dir,
            start_step=start_step,
        )
    finally:
        if run_lock is not None:
            run_lock.release()


def _run_training_loop(
    state: TrainState,
    step_fn: Callable,
    source_iter,
    target_iter,
    stop_steps: int,
    logger,
    hooks: LoopHooks,
    mesh=None,
    rng_seed: int = 2333,
    profile_dir: Optional[str] = None,
    start_step: int = 0,
) -> TrainState:
    """The per-iteration loop shared by all trainers (train_src.py:108-165).

    ``profile_dir`` captures a jax.profiler device trace of steps 10-15
    (viewable in TensorBoard/XProf) — the observability the reference lacks
    (SURVEY §5: wall-clock logging only).

    Per-iteration PRNG keys are ``fold_in(key(seed), i)`` — stateless in the
    step index, so a resumed run (``start_step > 0``) replays the identical
    key sequence an uninterrupted run would have used."""
    key0 = jax.random.key(rng_seed)
    t0 = time.time()
    # host->device upload runs in a background thread (a second prefetch
    # stage wrapping the decode prefetch), so the transfer overlaps the
    # previous step's compute instead of sitting on the dispatch critical
    # path — the TPU analog of DataLoader pin_memory + non_blocking copies
    # the reference never uses (uemda/tools/train_src.py:120 blocks on
    # .cuda() per batch).  With a mesh this is also where batches shard.
    k_max = max(1, int(hooks.steps_per_call))
    # multi-host + chunking: keep batches on host so K process-local chunks
    # stack BEFORE global-array assembly (_stack_global); k==1 iterations
    # then shard on the main thread — the worker still overlaps the decode
    host_mode = k_max > 1 and jax.process_count() > 1
    source_iter = _device_iter(source_iter, mesh, host_only=host_mode)
    if target_iter is not None:
        target_iter = _device_iter(target_iter, mesh, host_only=host_mode)
    # multi-host: logging / metric readback / eval / checkpointing run on
    # process 0 only (the step itself is SPMD across all processes; eval and
    # saves are process-local, so skipping them elsewhere cannot desync any
    # collective)
    main = jax.process_index() == 0
    miou_max, iter_max = 0.0, 0
    # a resumed run must not let a worse model overwrite the best checkpoint:
    # best-so-far is persisted as best.json next to the state snapshot
    best_json = (
        os.path.join(os.path.dirname(hooks.state_path), "best.json")
        if hooks.state_path else None
    )

    def log_jsonl(record):
        """Machine-readable loss/mIoU curve next to the state snapshot."""
        if best_json:
            path = os.path.join(os.path.dirname(best_json), "metrics.jsonl")
            with open(path, "a") as f:
                f.write(json.dumps(record) + "\n")
    # (maybe_resume deletes best.json on a fresh start, so its presence here
    # means a resumed run or a later chunk of the same run)
    if best_json and os.path.exists(best_json):
        with open(best_json) as f:
            rec = json.load(f)
        miou_max, iter_max = rec.get("miou", 0.0), rec.get("step", 0)
    if mesh is not None:
        state = shard_pytree_replicated(mesh, state)
    profiling = False
    saver = None
    multi_step = (_make_multi_step(step_fn, target_iter is not None)
                  if k_max > 1 else None)
    # the profiler window is RELATIVE to where this loop starts, so a
    # resumed run (start_step > 0) still produces a trace instead of
    # silently arming a window it can never reach (which would also pin
    # the chunked path to K=1 forever). Runs shorter than 2 steps can't
    # fit a [start, stop) window — don't arm at all (an armed-but-never-
    # stopped trace leaks the profiler session and writes nothing).
    if profile_dir is not None and stop_steps - start_step < 2:
        logger.info("profiler needs >= 2 steps; skipping trace")
        profile_dir = None
    trace_start = start_step + min(10, max(stop_steps - start_step - 2, 0))
    trace_stop = start_step + min(15, max(stop_steps - start_step - 1, 1))
    i = start_step
    while i < stop_steps:
        if profile_dir is not None and i == trace_start:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        if profiling and i == trace_stop:
            # scalar readback, NOT block_until_ready: the axon tunnel does
            # not block in block_until_ready (CLAUDE.md gotcha) and a
            # truncated trace is worse than no trace
            float(jax.tree.leaves(state.params)[0].mean())
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {profile_dir}")
            profile_dir = None
            profiling = False
        k = 1
        if (multi_step is not None and i > 0
                and profile_dir is None and not profiling):
            # a full chunk runs only when it fits inside every log/eval/
            # stop boundary; otherwise fall back to per-step — so k is
            # always 1 or k_max (ONE scan compilation, no residue-shape
            # retraces), i always lands ON each boundary and the logged
            # metrics are that exact iteration's. i == 0 stays a single
            # step to keep the iter=1 first log; the profiler window
            # forces K=1 so its step markers hit (the trace then shows the
            # per-step dispatch path — a documented compromise).
            fit = min(stop_steps - i,
                      hooks.log_every - i % hooks.log_every,
                      hooks.eval_every - i % hooks.eval_every)
            if fit >= k_max:
                k = k_max
        if k > 1:
            stack = ((lambda b: _stack_global(mesh, b)) if host_mode
                     else _stack_batches)
            bs = stack([next(source_iter) for _ in range(k)])
            bt = (stack([next(target_iter) for _ in range(k)])
                  if target_iter is not None else None)
            state, metrics = multi_step(state, bs, bt, key0, i)
        else:
            batch_s = next(source_iter)
            batch_t = next(target_iter) if target_iter is not None else None
            if host_mode:
                batch_s = shard_batch(mesh, batch_s)
                if batch_t is not None:
                    batch_t = shard_batch(mesh, batch_t)
            sub = jax.random.fold_in(key0, i)
            if batch_t is not None:
                state, metrics = step_fn(state, batch_s, batch_t, sub)
            else:
                state, metrics = step_fn(state, batch_s, sub)
        i += k

        if main and (i == 1 or i % hooks.log_every == 0):
            m = _deadline(
                lambda: {k: float(v) for k, v in metrics.items()},
                hooks.hang_timeout_s, f"metric readback @ iter {i}",
            )
            msg = ", ".join(f"{k}={v:.4g}" for k, v in m.items())
            logger.info(f"iter={i}/{stop_steps}, {msg}")
            log_jsonl({"step": i, **m})

        if main and hooks.eval_fn is not None and (
            i % hooks.eval_every == 0 or i >= stop_steps
        ):
            if hooks.state_path:
                if saver is None:
                    from uemda_tpu.train.checkpoints import AsyncSaver

                    saver = AsyncSaver()
                # device->host fetch under the deadline; serialization and
                # disk IO continue on the saver thread while eval runs
                _deadline(
                    lambda: saver.save(hooks.state_path, state),
                    hooks.hang_timeout_s, f"state snapshot @ iter {i}",
                )
            miou = _deadline(
                lambda: hooks.eval_fn(state),
                hooks.hang_timeout_s, f"eval @ iter {i}",
            )
            if hooks.on_eval:
                hooks.on_eval(state, i, miou)
            if miou >= miou_max:
                miou_max, iter_max = miou, i
                if hooks.on_best:
                    hooks.on_best(state, i, miou)
                if best_json:
                    with open(best_json, "w") as f:
                        json.dump({"miou": miou_max, "step": iter_max}, f)
            logger.info(
                f"eval@{i}: mIoU={miou:.5f} "
                f"(best {miou_max:.5f} @ iter {iter_max})"
            )
            log_jsonl({"step": i, "miou": miou})
    if profiling:
        # belt-and-braces: never leave an open profiler session behind
        float(jax.tree.leaves(state.params)[0].mean())
        jax.profiler.stop_trace()
        logger.info("profiler trace closed at loop end")
    if main and hooks.state_path:
        def final_save():
            if saver is not None:
                saver.wait()  # drain in-flight snapshots before the final one
            save_checkpoint(hooks.state_path, state)

        # the final readback must fail fast too if the runtime died on the
        # very last step
        _deadline(final_save, hooks.hang_timeout_s, "final state snapshot")
    logger.info(f">>>> used {(time.time() - t0) / 3600:.3f} hours")
    return state


def maybe_resume(state: TrainState, run_dir: str, resume, logger):
    """Trainer ``--resume`` handling: ``auto`` restores
    ``<run_dir>/state_curr.msgpack`` if present, a path restores that file,
    falsy is a no-op. Returns ``(state, start_step, state_path)`` — pass
    ``state_path`` into ``LoopHooks`` so the loop keeps the snapshot fresh."""
    state_path = os.path.join(run_dir, "state_curr.msgpack")
    src = None
    if resume and resume != "auto":
        src = resume
    elif resume == "auto" and os.path.exists(state_path):
        src = state_path
    if src is None:
        # fresh start: clear stale per-run artifacts from an older run so
        # best-tracking resets and the loss curve isn't appended mid-file
        for stale in ("best.json", "metrics.jsonl"):
            p = os.path.join(run_dir, stale)
            if os.path.exists(p):
                os.remove(p)
        return state, 0, state_path
    state = load_checkpoint(src, state)
    start = int(state.step)
    logger.info(f"resumed full train state from {src} at step {start}")
    return state, start, state_path


def make_eval_hook(model, cfg: PairConfig, run_dir: str, logger,
                   tta: bool = False, test: bool = False, vis: bool = False):
    """Standard eval-on-val hook with curr/best checkpointing
    (train_src.py:151-163). ``vis=True`` additionally dumps palette PNGs per
    eval like the reference (utils/eval.py:51-53) — off by default, the
    1-core host pays ~10 ms/image for PNG encoding."""
    split = cfg.test if test else cfg.val
    dataset = SegDataset(
        cfg.meta, list(split.image_dir), list(split.mask_dir)[0]
    )

    def eval_fn(state: TrainState) -> float:
        variables = variables_of(state)
        if jax.process_count() > 1:
            # replicated global arrays -> host numpy so eval stays a
            # process-0-local computation (no implicit cross-host resharding)
            from uemda_tpu.parallel.multihost import fetch_local

            variables = fetch_local(variables)
        save_checkpoint(
            os.path.join(run_dir, f"{cfg.target_set}_curr.msgpack"),
            variables,
        )
        _, miou = evaluate_dataset(
            model, variables, dataset, split.mean, split.std,
            tile=cfg.crop, tta=tta, batch_size=split.batch_size, logger=logger,
            vis_dir=(
                os.path.join(run_dir, f"vis-{cfg.target_set}_curr")
                if vis else None
            ),
        )
        return miou

    def on_best(state: TrainState, step: int, miou: float):
        save_checkpoint(
            os.path.join(run_dir, f"{cfg.target_set}_best.msgpack"),
            variables_of(state),
        )
        save_checkpoint(
            os.path.join(run_dir, "prototypes_best.msgpack"),
            state.aligner.prototypes,
        )

    return eval_fn, on_best


def process_shard(batch_size: int):
    """Multi-host: this process's (start, size) slice of every global batch
    (parallel/multihost.py); None in single-process runs.  EVERY iterator
    that feeds a mesh-sharded train step must pass this to
    ``infinite_batches`` — the trainers' hand-built target iterators
    included — or shard_batch's multi-process branch assembles a duplicated,
    P-times-inflated global batch."""
    if jax.process_count() == 1:
        return None
    from uemda_tpu.parallel.multihost import local_batch_slice

    return local_batch_slice(batch_size)


_process_shard = process_shard  # internal alias


def make_source_iter(cfg: PairConfig, seed=0, skip=0, host_crop=None):
    from uemda_tpu.datasets.prefetch import prefetch

    ds = SegDataset(
        cfg.meta, list(cfg.source.image_dir), list(cfg.source.mask_dir)[0]
    )
    return prefetch(
        infinite_batches(ds, cfg.source.batch_size, seed=seed, skip_batches=skip,
                         process_shard=_process_shard(cfg.source.batch_size),
                         host_crop=host_crop)
    ), ds


def make_target_iter(
    cfg: PairConfig, label_type="none", mask_dir=None, read_sup=False, seed=1,
    skip=0, host_crop=None,
):
    from uemda_tpu.datasets.prefetch import prefetch

    ds = SegDataset(
        cfg.meta,
        list(cfg.target.image_dir),
        mask_dir if mask_dir is not None else list(cfg.target.mask_dir)[0],
        label_type=label_type,
        read_sup=read_sup,
    )
    return prefetch(
        infinite_batches(ds, cfg.target.batch_size, seed=seed, skip_batches=skip,
                         process_shard=_process_shard(cfg.target.batch_size),
                         host_crop=host_crop)
    ), ds


def default_hparams(cfg: PairConfig, **overrides) -> StageHParams:
    base = dict(
        class_num=cfg.class_num,
        ignore_label=cfg.ignore_label,
        crop=cfg.crop,
        src_mean=cfg.source.mean,
        src_std=cfg.source.std,
        tgt_mean=cfg.target.mean,
        tgt_std=cfg.target.std,
        cutoff_top=cfg.cutoff_top,
        cutoff_low=cfg.cutoff_low,
        max_segments=_max_segments_for(cfg),
        clamp_target=cfg.clamp_target,
    )
    base.update(overrides)
    return StageHParams(**base)


def _max_segments_for(cfg: PairConfig) -> int:
    # LSC region_size 16 => <= (h/16)*(w/16) ids + 1 boundary id, rounded up
    # for id-count jitter (superpixels.py:129-133). Ids are numbered over
    # the FULL image (generate_superpixels runs pre-crop), so when images
    # are larger than the crop (LoveDA: 1024^2 images, 512 crops) the bound
    # must come from the image size — a crop-sized bound would silently
    # drop high-id segments in the XLA segment reductions.
    h = max(cfg.crop[0], cfg.meta.size[0])
    w = max(cfg.crop[1], cfg.meta.size[1])
    return (h // 16) * (w // 16) + 32
