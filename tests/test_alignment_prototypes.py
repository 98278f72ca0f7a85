"""Aligner math vs torch/scipy golden values: pearson distance, prototype
EMA/avg init, margin losses, CORAL, PCL, class balance, whitening fixture."""

import numpy as np
import torch
import torch.nn.functional as tnf
from scipy import stats

import jax.numpy as jnp

from uemda_tpu.alignment.balance import class_balance_weight, init_class_balance
from uemda_tpu.alignment.coral import coral_loss
from uemda_tpu.alignment.pcl import prototype_contrastive_loss
from uemda_tpu.alignment.prototypes import (
    align_class,
    align_instance,
    compute_local_prototypes,
    init_aligner,
    init_avg,
    label_refine,
    pearson_dist,
    update_avg,
    update_prototype,
)
from uemda_tpu.alignment.whiten import class_ware_whitening_loss
from uemda_tpu.ops.labels import downscale_label


def test_pearson_dist_vs_scipy():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 64)).astype(np.float32)
    b = rng.standard_normal((3, 64)).astype(np.float32)
    got = np.asarray(pearson_dist(jnp.asarray(a), jnp.asarray(b)))
    for i in range(5):
        for j in range(3):
            r = stats.pearsonr(a[i], b[j]).statistic
            np.testing.assert_allclose(got[i, j], (1 - r) / 2, rtol=1e-3, atol=1e-4)


def test_coral_vs_torch():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((100, 32)).astype(np.float32)
    t = rng.standard_normal((120, 32)).astype(np.float32)
    ts, tt = torch.from_numpy(s), torch.from_numpy(t)
    xm = torch.mean(ts, 0, keepdim=True) - ts
    xc = xm.t() @ xm / (100 - 1)
    xmt = torch.mean(tt, 0, keepdim=True) - tt
    xct = xmt.t() @ xmt / (120 - 1)
    want = float(torch.sum((xc - xct) * (xc - xct)) / (4 * 32 * 32))
    got = float(coral_loss(jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pcl_vs_torch():
    rng = np.random.default_rng(2)
    proto = rng.standard_normal((6, 32)).astype(np.float32)
    feat = rng.standard_normal((50, 32)).astype(np.float32)
    labels = rng.integers(-1, 6, size=(50,)).astype(np.int32)
    tp = tnf.normalize(torch.from_numpy(proto), p=2, dim=1)
    tf_ = tnf.normalize(torch.from_numpy(feat), p=2, dim=1)
    tl = torch.from_numpy(labels).long()
    mask = tl != -1
    logits = tf_[mask] @ tp.t() / 8.0
    want = float(tnf.cross_entropy(logits, tl[mask]))
    got = float(
        prototype_contrastive_loss(
            jnp.asarray(proto), jnp.asarray(feat), jnp.asarray(labels), 8.0
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_local_prototypes_and_ema_update():
    rng = np.random.default_rng(3)
    c, k = 6, 16
    feat = rng.standard_normal((1, 4, 4, k)).astype(np.float32)
    label_down = rng.integers(-1, c, size=(1, 4, 4)).astype(np.int32)
    label_down[0, 0, :] = 2  # make sure class 2 is present
    global_proto = rng.standard_normal((c, k)).astype(np.float32)
    got = np.asarray(
        compute_local_prototypes(
            jnp.asarray(feat), jnp.asarray(label_down), jnp.asarray(global_proto), c
        )
    )
    flat_f = feat.reshape(-1, k)
    flat_y = label_down.reshape(-1)
    for cls in range(c):
        sel = flat_f[flat_y == cls]
        if len(sel) == 0:
            np.testing.assert_allclose(got[cls], global_proto[cls], rtol=1e-5)
        else:
            np.testing.assert_allclose(
                got[cls], sel.sum(0) / (len(sel) + 1e-7), rtol=1e-4, atol=1e-5
            )


def test_update_prototype_ema_and_init_avg():
    rng = np.random.default_rng(4)
    c, k = 6, 8
    state = init_aligner(c, k, decay=0.9)
    feat = rng.standard_normal((1, 4, 4, k)).astype(np.float32)
    label_full = np.full((1, 64, 64), 3, np.int32)  # uniform class 3
    new_state, label_down = update_prototype(state, jnp.asarray(feat), jnp.asarray(label_full), c)
    assert (np.asarray(label_down) == 3).all()
    mean3 = feat.reshape(-1, k).mean(0)
    np.testing.assert_allclose(np.asarray(new_state.prototypes[3]), 0.1 * mean3, rtol=1e-3, atol=1e-5)
    # classes absent fall back to (zero) global prototypes -> stay zero
    np.testing.assert_allclose(np.asarray(new_state.prototypes[0]), np.zeros(k), atol=1e-7)
    # avg init accumulates exact means
    st = init_aligner(c, k)
    st = update_avg(st, jnp.asarray(feat), jnp.asarray(label_full), c)
    st = update_avg(st, jnp.asarray(feat * 3), jnp.asarray(label_full), c)
    st = init_avg(st)
    np.testing.assert_allclose(np.asarray(st.prototypes[3]), 2 * mean3, rtol=1e-3, atol=1e-5)


def _torch_class_align(p1, p2, class_num, margin=0.3, hard_ratio=0.3):
    import math

    d = _torch_pearson(p1, p2)
    hard_num = min(math.ceil(hard_ratio * class_num), class_num - 1)
    eye_neg = 1 - torch.eye(class_num)
    hardest, _ = torch.topk(d * eye_neg, k=hard_num + 1, dim=1, largest=False)
    d_pos = torch.diag(d).unsqueeze(-1)
    d_neg = hardest[:, 1:]
    return float((d_pos - d_neg + margin).max(torch.tensor(1e-6)).mean())


def _torch_pearson(f1, f2, eps=1e-7):
    k = f1.shape[-1]
    c1 = f1 - f1.mean(dim=-1, keepdim=True)
    c2 = f2 - f2.mean(dim=-1, keepdim=True)
    cov = (c1.unsqueeze(1) * c2.unsqueeze(0)).sum(-1) / (k - 1 + eps)
    s1 = f1.std(dim=-1).unsqueeze(1)
    s2 = f2.std(dim=-1).unsqueeze(0)
    return (-cov / (s1 * s2 + eps) + 1.0) * 0.5


def test_align_class_vs_torch():
    rng = np.random.default_rng(5)
    c, k = 6, 16
    state = init_aligner(c, k)
    state = state.replace(prototypes=jnp.asarray(rng.standard_normal((c, k)), jnp.float32))
    feat = rng.standard_normal((4, 2, 2, k)).astype(np.float32)
    # block-constant labels so 16x16 cells survive the 0.75 majority vote
    label = np.kron(
        rng.integers(0, c, size=(4, 2, 2)), np.ones((16, 16), np.int64)
    ).astype(np.int32)
    got = float(align_class(state, jnp.asarray(feat), jnp.asarray(label), c))
    # golden
    ld = np.asarray(downscale_label(jnp.asarray(label), 16, c))
    proto = np.asarray(state.prototypes)

    def local(fe, lb):
        out = np.zeros((c, k), np.float32)
        for cls in range(c):
            sel = fe.reshape(-1, k)[lb.reshape(-1) == cls]
            n = len(sel)
            out[cls] = sel.sum(0) / (n + 1e-7) if n >= 1 else proto[cls]
        return torch.from_numpy(out)

    p1 = local(feat[:2], ld[:2])
    p2 = local(feat[2:], ld[2:])
    want = _torch_class_align(p1, p2, c)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_align_instance_runs_and_is_positive():
    rng = np.random.default_rng(6)
    c, k = 6, 16
    state = init_aligner(c, k)
    state = state.replace(prototypes=jnp.asarray(rng.standard_normal((c, k)), jnp.float32))
    feat = rng.standard_normal((2, 2, 2, k)).astype(np.float32)
    label = np.kron(
        rng.integers(0, c, size=(2, 2, 2)), np.ones((16, 16), np.int64)
    ).astype(np.int32)
    loss = float(align_instance(state, jnp.asarray(feat), jnp.asarray(label), c))
    assert loss > 0


def test_class_balance_vs_torch():
    rng = np.random.default_rng(7)
    c = 6
    state = init_class_balance(c, decay=0.9, temperature=0.5)
    label = rng.integers(-1, c, size=(2, 8, 8)).astype(np.int32)
    w, new_state = class_balance_weight(state, jnp.asarray(label))
    # golden (balance.py:27-53)
    lbl = torch.from_numpy(label).long()
    cnt = torch.sum((lbl != -1).float())
    l2 = lbl.clone()
    l2[l2 == -1] = c
    oh = tnf.one_hot(l2.view(-1), num_classes=c + 1)[:, :-1].float()
    local = oh.sum(0) / (cnt + 1e-7)
    freq = 0.9 * torch.ones(c) / c + 0.1 * local
    prob = torch.softmax((1 - freq) / 0.5, dim=0)
    prob = prob / (prob.max() + 1e-7)
    want_w = (oh * prob.unsqueeze(0)).sum(1)
    np.testing.assert_allclose(np.asarray(new_state.freq), freq.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), want_w.numpy(), rtol=1e-4, atol=1e-6)


def test_whitening_reference_fixture():
    """Hand-computable fixture from the reference smoke block
    (class_ware_whiten.py:68-80): expected loss 12.4375."""
    a = np.array(
        [[2, 1, 3, 0], [5, 6, 7, 8], [1, 2, 3, 4], [2, 3, 4, 5], [0, 1, 0, 1], [5, 1, 3, 1]],
        np.float32,
    )
    mask = np.array([1, 0, 0, 1, 0, 0], np.int32)
    # reference feeds (1, 4ch, 1, 6) features and (1, 1, 6) labels
    feats = a.reshape(1, 1, 6, 4)  # NHWC: B=1, h=1, w=6, K=4
    labels = mask.reshape(1, 1, 6)
    loss = float(
        class_ware_whitening_loss(jnp.asarray(feats), jnp.asarray(labels), [1, 2], groups=1)
    )
    np.testing.assert_allclose(loss, 12.4375, rtol=1e-5)


def test_update_prototype_by_target_matches_golden():
    """alignment.py:92-105: soft-label-weighted feature means, EMA'd."""
    from uemda_tpu.alignment.prototypes import update_prototype_by_target

    rng = np.random.default_rng(8)
    c, k, b, h, w = 4, 8, 2, 2, 2
    ho, wo = 8, 8
    state = init_aligner(c, k, decay=0.9)
    state = state.replace(
        prototypes=jnp.asarray(rng.standard_normal((c, k)), jnp.float32)
    )
    feat = rng.standard_normal((b, h, w, k)).astype(np.float32)
    raw = rng.standard_normal((b, ho, wo, c)).astype(np.float32)
    e = np.exp(raw)
    soft = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    new = update_prototype_by_target(state, jnp.asarray(feat), jnp.asarray(soft))

    tf_ = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    ts = torch.from_numpy(soft.transpose(0, 3, 1, 2))
    f_flat = tf_.permute(0, 2, 3, 1).reshape(-1, 1, k)
    s_down = tnf.interpolate(ts, size=(h, w), mode="bilinear", align_corners=True)
    s_flat = s_down.permute(0, 2, 3, 1).reshape(-1, c, 1)
    local = torch.mean(f_flat * s_flat, dim=0)  # (c, k)
    want = 0.1 * local.numpy() + 0.9 * np.asarray(state.prototypes)
    np.testing.assert_allclose(np.asarray(new.prototypes), want, rtol=1e-4, atol=1e-5)


def test_prototype_weight_for_pixels_matches_golden():
    """alignment.py:295-309."""
    from uemda_tpu.alignment.prototypes import prototype_weight_for_pixels

    rng = np.random.default_rng(9)
    c, k, b, h, w = 4, 8, 1, 2, 2
    ho, wo = 8, 8
    proto = rng.standard_normal((c, k)).astype(np.float32)
    state = init_aligner(c, k).replace(prototypes=jnp.asarray(proto))
    feat = rng.standard_normal((b, h, w, k)).astype(np.float32)
    label = rng.integers(-1, c, size=(b, ho, wo)).astype(np.int32)
    got = np.asarray(
        prototype_weight_for_pixels(state, jnp.asarray(feat), jnp.asarray(label), c)
    )

    tf_feat = torch.from_numpy(feat.reshape(-1, k))
    simi = 1.0 / _torch_pearson(tf_feat, torch.from_numpy(proto))
    simi = simi.view(b, h, w, c).permute(0, 3, 1, 2)
    simi = tnf.interpolate(simi, (ho, wo), mode="bilinear", align_corners=True)
    simi = torch.softmax(simi, dim=1)
    simi = simi / (simi.max(dim=1, keepdim=True)[0] + 1e-7)
    lbl = torch.from_numpy(label).long().clone()
    lbl[lbl == -1] = c
    oh = tnf.one_hot(lbl, num_classes=c + 1)[..., :-1].permute(0, 3, 1, 2).float()
    want = (simi * oh).sum(1).reshape(-1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
