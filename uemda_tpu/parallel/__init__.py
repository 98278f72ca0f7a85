from uemda_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_pytree_replicated,
)
