"""Train state: one pytree holding everything a step mutates.

The reference scatters mutable state across module attributes (model params,
``Aligner.prototypes``, ``ClassBalance.freq``, ``GHMLoss.acc_sum``, optimizer
buffers); here it is a single flax struct so the whole step is a pure
function (state, batch, rng) -> state — jittable, shardable, checkpointable.
"""

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp
import optax

from uemda_tpu.alignment.balance import ClassBalanceState, init_class_balance
from uemda_tpu.alignment.losses import GHMState, init_ghm
from uemda_tpu.alignment.prototypes import AlignerState, init_aligner


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    aligner: AlignerState
    balance_s: ClassBalanceState
    balance_t: ClassBalanceState
    ghm: GHMState
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def create_train_state(
    variables,
    tx: optax.GradientTransformation,
    class_num: int,
    feat_channels: int = 2048,
    proto_decay: float = 0.996,
    balance_decay: float = 0.99,
    balance_temp: float = 2.0,
    ignore_label: int = -1,
    prototypes: Optional[jnp.ndarray] = None,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        aligner=init_aligner(
            class_num, feat_channels, proto_decay, ignore_label, prototypes
        ),
        balance_s=init_class_balance(class_num, balance_decay, balance_temp),
        balance_t=init_class_balance(class_num, balance_decay, balance_temp),
        ghm=init_ghm(),
        tx=tx,
    )
