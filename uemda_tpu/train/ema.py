"""Exponential moving average of model parameters.

Rebuild of ``uemda/utils/ema.py:34-65`` (imported by the reference ssl
trainers but dormant): functional shadow-parameter EMA with apply/restore
expressed as pure pytree ops.
"""

from typing import Any, Tuple

import jax


def init_ema(params: Any) -> Any:
    return jax.tree.map(lambda p: p, params)


def update_ema(shadow: Any, params: Any, decay: float = 0.999) -> Any:
    return jax.tree.map(
        lambda s, p: decay * s + (1.0 - decay) * p, shadow, params
    )


def swap_in_ema(state_params: Any, shadow: Any) -> Tuple[Any, Any]:
    """Returns (params_to_use, backup) — the reference's apply/restore pair."""
    return shadow, state_params
