"""Optimizer + LR schedule parity vs torch SGD (clip -> wd -> momentum -> lr
ordering, train_src.py:106-141) and the reference poly/warmup formulas."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from uemda_tpu.train.lr import poly_warmup_schedule
from uemda_tpu.train.optim import freeze_mask, make_optimizer


def test_poly_warmup_matches_reference_formulas():
    stop = 4000
    sched = poly_warmup_schedule(1e-2, stop, power=0.9)
    num_steps = stop * 1.5
    preheat = stop // 20
    for it in [0, 1, 100, preheat - 1, preheat, 1000, 3999]:
        if it < preheat:
            want = 1e-2 * it / preheat  # lr_warmup (tools.py:195-196)
        else:
            want = 1e-2 * (1 - it / num_steps) ** 0.9  # lr_poly (tools.py:191-192)
        np.testing.assert_allclose(float(sched(it)), want, rtol=1e-6)


def test_sgd_chain_matches_torch_sgd():
    """3 steps of our optax chain vs torch SGD(momentum, weight_decay) after
    clip_grad_norm_, on identical params/grads."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) * 5 for _ in range(3)]
    lr, mom, wd, clip = 0.01, 0.9, 5e-4, 2.0

    # torch golden
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], max_norm=clip)
        opt.step()

    # ours
    tx = make_optimizer(lambda step: lr, momentum=mom, weight_decay=wd, clip_norm=clip)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_freeze_mask_zeroes_updates():
    params = {
        "encoder": {"conv1": {"kernel": jnp.ones((2,))},
                    "layer1": {"block0": {"conv1": {"kernel": jnp.ones((2,))}}},
                    "layer3": {"block0": {"conv1": {"kernel": jnp.ones((2,))}}}},
        "layer5": {"classifier": {"kernel": jnp.ones((2,))}},
    }
    mask = freeze_mask(params, freeze_at=2)
    assert mask["encoder"]["conv1"]["kernel"] is False
    assert mask["encoder"]["layer1"]["block0"]["conv1"]["kernel"] is False
    assert mask["encoder"]["layer3"]["block0"]["conv1"]["kernel"] is True
    assert mask["layer5"]["classifier"]["kernel"] is True

    tx = make_optimizer(lambda s: 0.1, trainable_mask=mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["encoder"]["conv1"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["layer5"]["classifier"]["kernel"]).sum()) > 0.0


def test_gradient_accumulation_matches_single_update():
    """k MultiSteps micro-updates on the SAME gradient == one plain update
    with that gradient (mean of k copies), and params stay frozen between
    real updates."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from uemda_tpu.train.optim import make_optimizer

    params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    grads = {"w": jnp.array([0.1, -0.2, 0.3, 0.4]), "b": jnp.array([0.5, -0.5])}
    sched = optax.constant_schedule(1e-2)

    plain = make_optimizer(sched)
    s0 = plain.init(params)
    upd, _ = plain.update(grads, s0, params)
    want = optax.apply_updates(params, upd)

    acc = make_optimizer(sched, accum_steps=3)
    s = acc.init(params)
    p = params
    for i in range(3):
        upd, s = acc.update(grads, s, p)
        p2 = optax.apply_updates(p, upd)
        if i < 2:  # no real update yet
            np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p["w"]))
        p = p2
    for k in params:
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(want[k]), rtol=1e-6)
