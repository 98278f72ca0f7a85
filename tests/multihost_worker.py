"""Worker for the 2-process CPU multi-host test (tests/test_multihost.py).

Each process: 2 virtual CPU devices -> 4-device global mesh; draws the SAME
global batch stream, decodes only its local_batch_slice, assembles global
arrays via the production shard_batch/shard_pytree_replicated paths, and
runs 3 SGD steps of a tiny least-squares model under jit (XLA inserts the
cross-host gradient reduction from the shardings).  Prints a RESULT line the
parent compares across processes and against a single-process replay.

Run: python tests/multihost_worker.py <coordinator> <num_processes> <pid>
"""

import os
import sys


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

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


if __name__ == "__main__":
    main()
