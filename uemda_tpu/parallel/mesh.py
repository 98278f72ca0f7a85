"""Device mesh + sharding helpers.

The reference is single-GPU (``runs/uemda/run_2vaihingen.sh:1`` selects one
device; no torch.distributed anywhere). The TPU-native scaling story is SPMD
data parallelism over a 1-D ``jax.sharding.Mesh``:

  * batches are sharded along the leading axis (axis name 'data');
  * params/optimizer/aligner state are replicated;
  * jit + shardings let XLA insert the gradient/statistics all-reduces over
    ICI — including the cross-replica reduction of the prototype sums,
    class-frequency EMAs and GHM histograms that the reference kept on one
    GPU (SURVEY §2 parallelism table).

Works identically on a real TPU slice and on the virtual
``--xla_force_host_platform_device_count`` CPU mesh used in tests and the
driver's multi-chip dry run.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Put a host batch dict on device, sharded along the batch axis.

    Multi-process (pod slice): the caller holds only its PROCESS-LOCAL rows
    (the host pipeline is sharded per process — parallel/multihost.py), so
    the global array is assembled with make_array_from_process_local_data;
    single-process keeps the plain device_put."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_replicated(mesh: Mesh, tree):
    """Replicate train state over the mesh (every process passes an
    identical host copy in the multi-process case)."""
    if jax.process_count() > 1:
        sharding = replicate(mesh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), tree)
