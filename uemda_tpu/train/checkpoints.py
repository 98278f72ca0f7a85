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
