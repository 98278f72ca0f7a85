"""Worker for the 2-process CPU multi-host tests (tests/test_multihost.py).

Two modes:

* ``toy`` (default, 3 positional args): 2 virtual CPU devices per process ->
  4-device global mesh; draws the SAME global batch stream, decodes only its
  local_batch_slice, assembles global arrays via the production
  shard_batch/shard_pytree_replicated paths, and runs 3 SGD steps of a tiny
  least-squares model under jit (XLA inserts the cross-host gradient
  reduction from the shardings).

* ``ssl`` (VERDICT r2 items 3+4): the PRODUCTION trainer path end to end —
  build_model/build_state/make_source_iter/run_training_loop with the real
  ``make_ssl_step`` (64² resnet18, float32), including the process-0-only
  pseudo-generation barrier (infer/pseudo_gen.py) and the process-0-only
  eval + state-snapshot hooks, parametrized over ``steps_per_call`` so the
  multi-host chunk-stacking path (_stack_global) is what executes. The
  global mesh is always 2 devices (1 process x 2 local or 2 processes x 1
  local), so every configuration runs the same global math and the parent
  can compare fingerprints across process counts.

Prints a RESULT line the parent compares across processes and against the
single-process run.

Run: python tests/multihost_worker.py <coordinator> <num_processes> <pid>
     python tests/multihost_worker.py <coord> <nproc> <pid> ssl <data_root> <steps_per_call> <devices_per_proc>
"""

import os
import sys


def _force_devices(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def main_toy():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax = _force_devices(2)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from uemda_tpu.parallel.multihost import (
        fetch_local,
        init_multihost,
        is_main_process,
        local_batch_slice,
    )

    init_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_devices()
    assert jax.device_count() == 2 * nproc, jax.devices()
    assert is_main_process() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp

    from uemda_tpu.parallel import make_mesh, shard_batch, shard_pytree_replicated

    mesh = make_mesh()
    GB, D, C = 8, 16, 4
    rng = np.random.default_rng(0)  # identical stream on every process
    X = rng.normal(size=(GB, D)).astype(np.float32)
    Y = rng.normal(size=(GB, C)).astype(np.float32)
    start, size = local_batch_slice(GB)
    assert size == GB // nproc

    params = shard_pytree_replicated(mesh, {"w": jnp.zeros((D, C), jnp.float32)})
    batch = shard_batch(
        mesh, {"x": X[start : start + size], "y": Y[start : start + size]}
    )

    @jax.jit
    def step(p, b):
        def loss_fn(p):
            return jnp.mean((b["x"] @ p["w"] - b["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        new_p = jax.tree.map(lambda a, g: a - 0.1 * g, p, grads)
        return new_p, loss

    loss = None
    for _ in range(3):
        params, loss = step(params, batch)

    local = fetch_local(params)
    print(
        f"RESULT pid={pid} loss={float(loss):.8f} "
        f"wsum={float(np.abs(local['w']).sum()):.8f}",
        flush=True,
    )


def main_ssl():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    data_root, steps_per_call, dev_per_proc = (
        sys.argv[5], int(sys.argv[6]), int(sys.argv[7])
    )
    jax = _force_devices(dev_per_proc)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from uemda_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()

    from uemda_tpu.parallel.multihost import fetch_local, init_multihost

    if nproc > 1:
        init_multihost(coord, nproc, pid)
        assert jax.process_count() == nproc
    assert jax.device_count() == nproc * dev_per_proc

    import logging

    import numpy as np
    import jax.numpy as jnp

    from uemda_tpu.config import PairConfig, SplitConfig
    from uemda_tpu.datasets.base import SegDataset, infinite_batches
    from uemda_tpu.infer.pseudo_gen import generate_pseudo_labels
    from uemda_tpu.parallel import make_mesh
    from uemda_tpu.train.loop import (
        LoopHooks,
        build_model,
        build_state,
        default_hparams,
        init_variables,
        make_eval_hook,
        make_source_iter,
        maybe_resume,
        process_shard,
        run_training_loop,
        variables_of,
    )
    from uemda_tpu.train.steps import make_ssl_step

    HW = 64
    m, s = (128.0,) * 3, (64.0,) * 3
    tag = f"p{nproc}_k{steps_per_call}"
    cfg = PairConfig(
        name=f"mh_{tag}",
        datasets="IsprsDA",
        target_set="T",
        source=SplitConfig((f"{data_root}/src/img_dir/train",),
                           (f"{data_root}/src/ann_dir/train",), m, s, 4),
        target=SplitConfig((f"{data_root}/tgt/img_dir/train",),
                           (f"{data_root}/tgt/ann_dir/train",), m, s, 4),
        val=SplitConfig((f"{data_root}/tgt/img_dir/val",),
                        (f"{data_root}/tgt/ann_dir/val",), m, s, 2),
        test=SplitConfig((f"{data_root}/tgt/img_dir/val",),
                         (f"{data_root}/tgt/ann_dir/val",), m, s, 2),
        snapshot_dir=f"{data_root}/log_{tag}",
        model="resnet18",
        crop=(HW, HW),
    )
    run_dir = os.path.join(cfg.snapshot_dir, "ssl")
    os.makedirs(run_dir, exist_ok=True)
    logger = logging.getLogger(f"mh-ssl-{pid}")

    mesh = make_mesh()  # all global devices (always 2 across configurations)
    model = build_model(cfg)
    fc = model.config.inchannels
    variables = init_variables(model, cfg, seed=3)
    protos = np.random.default_rng(42).normal(size=(cfg.class_num, fc))
    state = build_state(
        variables, cfg, 6, prototypes=jnp.asarray(protos, jnp.float32),
        feat_channels=fc,
    )
    state, start_step, state_path = maybe_resume(state, run_dir, "", logger)

    # process-0-only pseudo-gen with the entry/release barrier (the sweep
    # itself is single-device in every configuration so its .npy artifacts
    # are identical across process counts)
    pseudo_dir = os.path.join(cfg.snapshot_dir, "pseudo_label")
    gen_ds = SegDataset(cfg.meta, list(cfg.target.image_dir), None,
                        label_type="none")
    generate_pseudo_labels(
        model, variables_of(state), gen_ds, cfg.target.mean, cfg.target.std,
        out_dir=pseudo_dir, tile=cfg.crop, tta=False, batch_size=2,
        compute_dtype="float32", mesh=None, keep_in_memory=False,
    )
    assert len(os.listdir(pseudo_dir)) == 4, os.listdir(pseudo_dir)

    hp = default_hparams(
        cfg, refine=True, refine_mode="l", target_loss="uvem",
        compute_dtype="float32",
        max_segments=(HW // 16) ** 2 + 8,
    )
    step_fn = make_ssl_step(model, hp)

    src_iter, _ = make_source_iter(cfg)
    tgt_ds = SegDataset(cfg.meta, list(cfg.target.image_dir), pseudo_dir,
                        label_type="prob", read_sup=False)
    tgt_iter = infinite_batches(
        tgt_ds, cfg.target.batch_size, seed=1,
        process_shard=process_shard(cfg.target.batch_size),
    )
    evals = []
    eval_fn, on_best = make_eval_hook(model, cfg, run_dir, logger)
    hooks = LoopHooks(
        eval_every=4, log_every=2, eval_fn=eval_fn, on_best=on_best,
        on_eval=lambda _s, i, miou: evals.append((i, miou)),
        state_path=state_path, steps_per_call=steps_per_call,
        hang_timeout_s=0,
    )
    state = run_training_loop(
        state, step_fn, src_iter, tgt_iter, 6, logger, hooks,
        mesh=mesh, rng_seed=11, start_step=start_step,
    )
    assert int(jnp.asarray(state.step).item()) == 6

    local = fetch_local({"params": state.params})
    fp = float(sum(np.abs(np.asarray(x)).sum()
                   for x in jax.tree.leaves(local["params"])))
    miou = evals[-1][1] if evals else float("nan")
    print(
        f"RESULT pid={pid} fp={fp:.6f} miou={miou:.6f} nevals={len(evals)}",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 4 and sys.argv[4] == "ssl":
        main_ssl()
    else:
        main_toy()
