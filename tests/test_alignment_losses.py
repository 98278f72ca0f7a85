"""Loss zoo vs torch golden values (exact semantics of balance.py classes)."""

import numpy as np
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from uemda_tpu.alignment.losses import (
    cross_entropy_loss,
    focal_loss,
    ghm_loss,
    init_ghm,
    loss_calc,
    ohem_cross_entropy,
    ups_loss,
    uvem_loss,
)


def _rand_case(seed=0, b=2, h=16, w=16, c=6):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32) * 2
    labels = rng.integers(-1, c, size=(b, h, w)).astype(np.int32)
    return logits, labels


def _t(logits, labels):
    return (
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels).long(),
    )


def test_cross_entropy_mean_over_all():
    logits, labels = _rand_case()
    tl, ty = _t(logits, labels)
    want = tnf.cross_entropy(tl, ty, ignore_index=-1, reduction="none").mean()
    got = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ohem_matches_torch_selection():
    logits, labels = _rand_case(seed=1)
    tl, ty = _t(logits, labels)
    loss = tnf.cross_entropy(tl, ty, ignore_index=-1, reduction="none").view(-1)
    thresh = -torch.log(torch.tensor(0.7))
    n_min = ty[ty != -1].numel() // 5
    hard = loss[loss > thresh]
    if hard.numel() < n_min:
        hard, _ = loss.topk(n_min)
    want = hard.mean()
    got = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ohem_few_hard_pixels_falls_back_to_topk():
    # nearly-perfect predictions -> hard set smaller than n_min
    logits, labels = _rand_case(seed=2)
    labels = np.abs(labels)  # all valid
    logits = np.eye(6, dtype=np.float32)[labels] * 20.0
    logits[0, 0, 0] *= 0  # one uncertain pixel
    tl, ty = _t(logits, labels)
    loss = tnf.cross_entropy(tl, ty, ignore_index=-1, reduction="none").view(-1)
    thresh = -torch.log(torch.tensor(0.7))
    n_min = ty[ty != -1].numel() // 5
    hard = loss[loss > thresh]
    if hard.numel() < n_min:
        hard, _ = loss.topk(n_min)
    want = hard.mean()
    got = ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_focal_matches_torch():
    logits, labels = _rand_case(seed=3)
    tl, ty = _t(logits, labels)
    ce = tnf.cross_entropy(tl, ty, reduction="none", ignore_index=-1)
    pt = torch.exp(-ce)
    want = ((1 - pt) ** 2.0 * ce).mean()
    got = focal_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _torch_ghm(logits, labels, acc_sum, bins=30, momentum=0.99):
    """Golden GHM (balance.py:173-212)."""
    preds = torch.from_numpy(logits.reshape(-1, logits.shape[-1]))
    targets = torch.from_numpy(labels.reshape(-1)).long()
    n_classes = preds.size(1)
    probs = torch.softmax(preds, dim=1)
    lbl = targets.clone()
    lbl[lbl == -1] = n_classes
    onehot = tnf.one_hot(lbl, num_classes=n_classes + 1)[:, :-1]
    prob_y = torch.sum(probs * onehot, dim=1)
    g = torch.abs(prob_y - 1.0)
    g[targets == -1] = -1
    edges = torch.FloatTensor([x / bins for x in range(bins + 1)])
    edges[-1] += 1e-3
    hist = torch.histc(g, bins=bins, min=0, max=1)
    inds = torch.bucketize(g, edges)
    acc = momentum * torch.from_numpy(acc_sum) + (1 - momentum) * hist
    w = torch.zeros_like(g)
    w = torch.where((inds > 0) & (inds <= bins), 1.0 / acc[inds - 1], w)
    ce = tnf.cross_entropy(preds, targets, reduction="none", ignore_index=-1)
    loss = (ce * w).sum() / (torch.sum(targets != -1) + 1e-7)
    return float(loss), acc.numpy()


def test_ghm_matches_torch_including_state():
    logits, labels = _rand_case(seed=4)
    state = init_ghm(bins=30, momentum=0.99)
    acc = np.zeros(30, np.float32)
    for seed in (5, 6):
        logits, labels = _rand_case(seed=seed)
        want, acc = _torch_ghm(logits, labels, acc)
        got, state = ghm_loss(jnp.asarray(logits), jnp.asarray(labels), state)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(state.acc_sum), acc, rtol=1e-5)


def _soft_labels(seed, b=2, h=16, w=16, c=6):
    rng = np.random.default_rng(seed)
    raw = rng.standard_normal((b, h, w, c)).astype(np.float32)
    e = np.exp(raw - raw.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_uvem_matches_torch():
    logits, labels = _rand_case(seed=7)
    soft = _soft_labels(8)
    m, t, g = 0.2, 0.7, 4.0
    # golden (balance.py:356-394)
    preds = torch.from_numpy(logits.reshape(-1, 6))
    targets = torch.from_numpy(labels.reshape(-1)).long()
    lts = torch.from_numpy(soft.reshape(-1, 6))
    ce = tnf.cross_entropy(preds, targets, reduction="none", ignore_index=-1)
    u = torch.sum(-lts * torch.log(lts), dim=1)
    ce[u > t] = 0
    from tests.test_ops_uncertainty import _torch_uvem_weight

    w = torch.from_numpy(_torch_uvem_weight(u.numpy(), m, t, g))
    valid = torch.sum((u <= t) & (targets != -1))
    want = float((w * ce).sum() / (valid + 1e-7))
    got = uvem_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(soft), m, t, g)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_ups_matches_torch():
    logits, labels = _rand_case(seed=9)
    soft = _soft_labels(10)
    preds = torch.from_numpy(logits.reshape(-1, 6))
    targets = torch.from_numpy(labels.reshape(-1)).long()
    lts = torch.from_numpy(soft.reshape(-1, 6))
    ce = tnf.cross_entropy(preds, targets, reduction="none", ignore_index=-1)
    u = torch.sum(-lts * torch.log(lts), dim=1)
    ce[u > 0.7] = 0
    valid = torch.sum((u <= 0.7) & (targets != -1))
    want = float(ce.sum() / (valid + 1e-7))
    got = ups_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(soft))
    np.testing.assert_allclose(float(got), want, rtol=1e-4)


def test_loss_calc_multi_head_upsamples():
    rng = np.random.default_rng(11)
    p1 = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    p2 = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    labels = rng.integers(-1, 6, size=(1, 64, 64)).astype(np.int32)
    got = loss_calc(
        [jnp.asarray(p1), jnp.asarray(p2)],
        jnp.asarray(labels),
        lambda lg, lb: cross_entropy_loss(lg, lb),
        multi=True,
    )
    want = 0.0
    for p in (p1, p2):
        tp = tnf.interpolate(
            torch.from_numpy(p.transpose(0, 3, 1, 2)), (64, 64),
            mode="bilinear", align_corners=True,
        )
        want = want + tnf.cross_entropy(
            tp, torch.from_numpy(labels).long(), ignore_index=-1, reduction="none"
        ).mean()
    np.testing.assert_allclose(float(got), float(want) / 2, rtol=1e-4)


def _torch_gdp(logits, labels, acc_sum, bins=30, momentum=0.99):
    """Golden GDP (balance.py:241-300), no extra pixel weights."""
    preds = torch.from_numpy(logits.reshape(-1, logits.shape[-1]))
    targets = torch.from_numpy(labels.reshape(-1)).long()
    n_classes = preds.size(1)
    probs = torch.softmax(preds, dim=1)
    lbl = targets.clone()
    lbl[lbl == -1] = n_classes
    onehot = tnf.one_hot(lbl, num_classes=n_classes + 1)[:, :-1]
    prob_y = torch.sum(probs * onehot, dim=1)
    g = torch.abs(prob_y - 1.0)
    g[targets == -1] = -1
    edges = torch.FloatTensor([x / bins for x in range(bins + 1)])
    edges[-1] += 1e-3
    hist = torch.histc(g, bins=bins, min=0, max=1)
    hist = (hist + torch.flip(hist, dims=[0])) * 0.5
    inds = torch.bucketize(g, edges)
    acc = momentum * torch.from_numpy(acc_sum) + (1 - momentum) * hist
    dense = 1 - acc / (acc.sum() + 1e-7)
    dense = torch.where(acc != 0, dense, torch.zeros_like(acc))
    dense = dense / (dense.max() + 1e-7)
    w = torch.zeros_like(g)
    w = torch.where((inds > 0) & (inds <= bins), dense[inds - 1], w)
    ce = tnf.cross_entropy(preds, targets, reduction="none", ignore_index=-1)
    loss = (ce * w).sum() / (torch.sum(targets != -1) + 1e-7)
    return float(loss), acc.numpy()


def test_gdp_matches_torch_including_state():
    from uemda_tpu.alignment.losses import gdp_loss

    state = init_ghm(bins=30, momentum=0.99)
    acc = np.zeros(30, np.float32)
    for seed in (12, 13):
        logits, labels = _rand_case(seed=seed)
        want, acc = _torch_gdp(logits, labels, acc)
        got, state = gdp_loss(jnp.asarray(logits), jnp.asarray(labels), state)
        np.testing.assert_allclose(float(got), want, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(state.acc_sum), acc, rtol=1e-5)
