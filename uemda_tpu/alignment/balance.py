"""EMA class-frequency balancing as functional state.

Rebuilds ``ClassBalance`` (reference ``uemda/gast/balance.py:15-78``): an EMA
over per-batch class frequencies; per-pixel weights are
softmax((1-freq)/T) normalized by its max. The mutable ``freq`` tensor
becomes an explicit state value threaded through the step (and psum-reduced
across data-parallel replicas before the EMA — see
``uemda_tpu.parallel``).
"""

from typing import Tuple

import flax.struct
import jax.numpy as jnp

from uemda_tpu.ops.labels import index_to_onehot


@flax.struct.dataclass
class ClassBalanceState:
    freq: jnp.ndarray  # (C,)
    decay: float = flax.struct.field(pytree_node=False)
    temperature: float = flax.struct.field(pytree_node=False)


def init_class_balance(
    class_num: int, decay: float = 0.99, temperature: float = 0.5
) -> ClassBalanceState:
    return ClassBalanceState(
        freq=jnp.ones((class_num,), jnp.float32) / class_num,
        decay=decay,
        temperature=temperature,
    )


def _local_freq(label: jnp.ndarray, class_num: int, ignore_label: int) -> jnp.ndarray:
    """(balance.py:45-53) per-batch class frequency over valid pixels."""
    oh = index_to_onehot(label, class_num, ignore_label)  # (N, C)
    local_cnt = (label != ignore_label).sum().astype(jnp.float32)
    return oh.sum(axis=0) / (local_cnt + 1e-7)


def class_weights(state: ClassBalanceState) -> jnp.ndarray:
    """(balance.py:38-43) normalized softmax((1-freq)/T), max-normalized."""
    prob = jnp.exp(
        (1.0 - state.freq) / state.temperature
        - jnp.max((1.0 - state.freq) / state.temperature)
    )
    prob = prob / prob.sum()
    return prob / (prob.max() + 1e-7)


def class_balance_weight(
    state: ClassBalanceState,
    label: jnp.ndarray,
    ignore_label: int = -1,
) -> Tuple[jnp.ndarray, ClassBalanceState]:
    """Per-pixel weight + updated state (balance.py:27-36: ema FIRST, then
    the weight is computed from the updated frequencies)."""
    c = state.freq.shape[0]
    new_freq = state.decay * state.freq + (1.0 - state.decay) * _local_freq(
        label, c, ignore_label
    )
    new_state = state.replace(freq=new_freq)
    w_per_class = class_weights(new_state)  # (C,)
    oh = index_to_onehot(label, c, ignore_label)  # (N, C)
    weight = (oh * w_per_class[None, :]).sum(axis=1)  # (N,)
    return weight, new_state
