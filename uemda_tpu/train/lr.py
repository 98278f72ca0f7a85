"""Learning-rate schedule: linear warmup + poly decay.

Rebuilds ``lr_warmup``/``lr_poly``/``adjust_learning_rate`` (reference
``uemda/utils/tools.py:191-207``): lr = base * step/preheat during warmup,
then base * (1 - step/num_steps)^power. The reference sets
num_steps = 1.5 * stop_steps and preheat = stop_steps / 20
(``tools/train_src.py:55-56``).
"""

import jax.numpy as jnp


def poly_warmup_schedule(
    base_lr: float, stop_steps: int, power: float = 0.9,
    num_steps_factor: float = 1.5, preheat_frac: float = 1.0 / 20.0,
):
    num_steps = stop_steps * num_steps_factor
    preheat = int(stop_steps * preheat_frac)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(preheat, 1)
        poly = base_lr * (1.0 - step / num_steps) ** power
        return jnp.where(step < preheat, warm, poly)

    return schedule
