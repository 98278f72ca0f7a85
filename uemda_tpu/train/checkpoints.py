"""Checkpointing: msgpack snapshots with step resume.

The reference saves bare ``state_dict`` .pth files per eval and hands state
between pipeline stages via the filesystem (``tools/train_src.py:151-163``);
optimizer state and EMA statistics are lost on restart. Here the FULL train
state (params, batch stats, optimizer buffers, prototypes, class-balance
frequencies, GHM bins, step) serializes through flax msgpack, so resume is
exact. Torch-format reference checkpoints load via
``uemda_tpu.models.port_torch``.
"""

import os
from typing import Any

import flax.serialization
import jax
import numpy as np


def _host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any) -> str:
    """Serialize any pytree (TrainState, variables dict, prototypes...)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = flax.serialization.to_bytes(_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template pytree with identical structure."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(target, data)


class AsyncSaver:
    """Background checkpoint writer: the device->host fetch happens on the
    caller's thread (it must complete before the state is donated to the
    next step), but serialization + disk IO run on a single worker thread so
    the training loop never blocks on the filesystem. ``wait()`` drains
    pending writes (call before reading the file or exiting)."""

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue()
        self._err = None

        def worker():
            while True:
                item = self._q.get()
                if item is None:
                    return
                path, host_tree = item
                try:
                    save_checkpoint(path, host_tree)
                except BaseException as e:  # noqa: BLE001 - surfaced on wait
                    self._err = e
                finally:
                    self._q.task_done()

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def save(self, path: str, state: Any):
        # surface an earlier write failure at the next snapshot cadence —
        # a run must not continue for hours believing snapshots exist
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put((path, _host(state)))

    def wait(self):
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def save_checkpoint_orbax(path: str, state: Any) -> str:
    """Orbax backend (ecosystem-standard layout: a checkpoint DIRECTORY with
    per-leaf storage + atomic finalization). Same content as the msgpack
    files; use for interop with orbax-based tooling."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _host(state), force=True)
    return path


def load_checkpoint_orbax(path: str, target: Any) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        # the template pytree (incl. flax.struct dataclasses) fixes the
        # structure; leaves come back as numpy arrays
        return ckptr.restore(os.path.abspath(path), item=_host(target))
