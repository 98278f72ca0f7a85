"""Multi-host (pod-slice) runtime support.

The reference is strictly single-GPU (SURVEY §2 parallelism table: no
torch.distributed anywhere); its TPU-native scale-out story is SPMD data
parallelism over every chip of a pod slice.  Within one host that is just
``jit`` over a :func:`uemda_tpu.parallel.make_mesh`; this module adds the
pieces a MULTI-PROCESS run needs:

  * :func:`init_multihost` — ``jax.distributed.initialize`` wrapper (flags
    or the standard env vars / TPU auto-detection);
  * :func:`process_index` / :func:`process_count` / :func:`is_main_process`
    — guards so logging, checkpointing and eval run once, on process 0;
  * :func:`local_batch_slice` — which rows of the GLOBAL batch this process
    must decode (the host data pipeline is sharded per process: every
    process draws the same shuffle stream and decodes only its slice, so
    the global batch sequence — and therefore the math — is identical to a
    single-process run);
  * :func:`form_global_array` — assemble a process-local slice into a
    global ``jax.Array`` over the mesh
    (``jax.make_array_from_process_local_data``);
  * :func:`fetch_local` — pull a replicated global array tree back to host
    numpy for process-0 checkpointing/eval.

Single-process runs pass through all of these unchanged, so the training
loop has one code path.
"""

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Initialize the JAX distributed runtime.

    On Cloud TPU pod slices all arguments auto-detect; on CPU/GPU (or in the
    2-process CPU test) pass them explicitly or via the standard
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    environment variables."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    # Establish the cross-process collective context NOW, while every
    # process is at the same (cheap) point. The backend's context init has
    # its own short deadline (Gloo: 30 s per key exchange) — if the first
    # collective instead fires at a training-time barrier while a peer is
    # still inside a minutes-long XLA compile, that deadline trips and the
    # whole run dies (seen as a real flake in the 2-process CPU test under
    # host contention). One warm-up barrier here removes that window.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("uemda_init_multihost")


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this process's rows within every global batch.

    The global batch divides evenly across processes (asserted) so the
    contiguous per-process slices line up with a process-major 1-D device
    mesh — XLA then never moves batch rows between hosts."""
    n = process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by {n} processes"
    )
    local = global_batch_size // n
    return process_index() * local, local


def form_global_array(mesh, x: np.ndarray, sharding: Optional[NamedSharding] = None):
    """Process-local slice -> global jax.Array sharded over mesh's first axis.

    Single-process: equivalent to a sharded device_put."""
    if sharding is None:
        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def form_replicated_array(mesh, x):
    """Host value (identical on every process) -> fully-replicated global
    jax.Array."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def fetch_local(tree):
    """Replicated global array tree -> host numpy tree (process-local copy),
    for process-0 checkpointing / local eval."""
    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree.map(one, tree)


def add_multihost_flags(parser) -> None:
    """Shared trainer CLI flags (SURVEY §2 DP row: host pipeline sharded per
    process; process-0-only logging/checkpoint/eval)."""
    parser.add_argument(
        "--multihost", dest="multihost", type=int, default=0,
        help="initialize jax.distributed for a multi-process run "
             "(TPU pod slice auto-detects; otherwise set --coordinator/"
             "--num-processes/--process-id or the JAX_* env vars)")
    parser.add_argument("--coordinator", type=str,
                        default=os.environ.get("JAX_COORDINATOR_ADDRESS"))
    parser.add_argument("--num-processes", type=int,
                        default=_env_int("JAX_NUM_PROCESSES"))
    parser.add_argument("--process-id", type=int,
                        default=_env_int("JAX_PROCESS_ID"))


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def setup_multihost(args) -> bool:
    """Initialize from parsed trainer flags. Returns True when multi-host."""
    if not getattr(args, "multihost", 0):
        return False
    init_multihost(args.coordinator, args.num_processes, args.process_id)
    return True


def trainer_mesh(args, multihost: bool):
    """The one mesh-selection rule shared by every trainer CLI: multi-host
    spans every chip of every process; otherwise --num-devices > 1 selects a
    local data mesh and anything else runs single-device (mesh=None)."""
    from uemda_tpu.parallel import make_mesh

    if multihost:
        return make_mesh(None)
    return make_mesh(args.num_devices) if (args.num_devices or 0) > 1 else None
