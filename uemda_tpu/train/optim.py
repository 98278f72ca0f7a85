"""Optimizer: SGD + momentum + weight decay + global-norm gradient clipping,
with torch-parity update order and stage freezing.

The reference trains with ``optim.SGD(lr, momentum=0.9, weight_decay=5e-4)``
after ``clip_grad_norm_(max_norm=32)`` (``tools/train_src.py:106-141``).
torch SGD applies weight decay to the (already clipped) gradient BEFORE the
momentum buffer — the optax chain below reproduces that ordering exactly:
clip -> add wd -> momentum trace -> scale by -lr.

Stage freezing (``uemda/resnet.py:119-130`` freeze_at) becomes an update
mask: frozen subtrees receive zero updates.
"""

from typing import Callable

import jax
import optax


FREEZE_SUBTREES = {
    # freeze_at levels -> encoder param subtrees (resnet.py:119-130)
    1: ["conv1", "bn1", "stem_conv1", "stem_bn1", "stem_conv2", "stem_bn2",
        "stem_conv3", "stem_bn3"],
    2: ["layer1"],
    3: ["layer2"],
    4: ["layer3"],
    5: ["layer4"],
}


def freeze_mask(params, freeze_at: int):
    """pytree of bools: True = trainable."""
    frozen_names = set()
    for lvl in range(1, freeze_at + 1):
        frozen_names.update(FREEZE_SUBTREES.get(lvl, []))

    def label(path, _):
        keys = [getattr(p, "key", None) for p in path]
        # only the stage subtree DIRECTLY under 'encoder' counts — block-
        # internal conv1/bn1 names must not match the stem's conv1/bn1
        if "encoder" in keys:
            i = keys.index("encoder")
            if i + 1 < len(keys) and keys[i + 1] in frozen_names:
                return False
        return True

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    clip_norm: float = 32.0,
    trainable_mask=None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """``accum_steps > 1`` accumulates that many micro-batch gradients and
    applies one SGD update on their mean (optax.MultiSteps) — an effective
    batch of ``accum_steps x batch`` in the same HBM footprint. Clipping,
    weight decay and the LR schedule all see the accumulated update, and the
    schedule advances once per real update (large-batch semantics; the
    reference has no equivalent)."""
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, trainable_mask),
            ),
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
