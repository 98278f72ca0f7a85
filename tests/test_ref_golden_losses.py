"""Live-reference golden tests: loss zoo + alignment criteria.

Round-1 verdict item 2: instead of hand-derived goldens, these tests run the
ACTUAL reference classes (``/root/reference/uemda/gast/balance.py:81-457``,
``coral.py``, ``class_ware_whiten.py``, ``mmd.py``, ``loss.py``) on CPU torch
via tests/ref_oracle shims and assert our JAX rebuild matches their output
numerically.  Layouts: reference NCHW logits / our NHWC.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.ref_oracle import ref_import

from uemda_tpu.alignment import losses as L
from uemda_tpu.alignment.balance import (
    class_balance_weight,
    init_class_balance,
)
from uemda_tpu.alignment.coral import align_domain, coral_loss, coral_loss2
from uemda_tpu.alignment.mmd import mmd_linear, mmd_rbf
from uemda_tpu.alignment.pcl import prototype_contrastive_loss
from uemda_tpu.alignment.whiten import class_ware_whitening_loss
from uemda_tpu.ops.uncertainty import uvem_weight

balance = ref_import("uemda.gast.balance")
ref_coral = ref_import("uemda.gast.coral")
ref_whiten = ref_import("uemda.gast.class_ware_whiten")
ref_mmd = ref_import("uemda.gast.mmd")
ref_loss = ref_import("uemda.loss")

B, C, H, W = 2, 6, 8, 10


def _rng(seed=0):
    return np.random.default_rng(seed)


def make_batch(seed=0, ignore_frac=0.2):
    r = _rng(seed)
    logits = r.normal(size=(B, C, H, W)).astype(np.float32) * 2.0
    labels = r.integers(0, C, size=(B, H, W)).astype(np.int64)
    labels[r.random(size=labels.shape) < ignore_frac] = -1
    soft = r.random(size=(B, C, H, W)).astype(np.float32) + 1e-3
    soft = soft / soft.sum(axis=1, keepdims=True)
    return logits, labels, soft


def t(x):
    return torch.from_numpy(np.asarray(x))


def j_logits(logits_nchw):
    return jnp.asarray(np.transpose(logits_nchw, (0, 2, 3, 1)))


def close(ours, ref_val, rtol=2e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(ours, np.float64), float(ref_val), rtol=rtol, atol=atol
    )


# ----------------------------------------------------------------- CE / OHEM


def test_cross_entropy_matches_reference():
    logits, labels, _ = make_batch(1)
    ref = balance.CrossEntropy(ignore_label=-1)(t(logits), t(labels))
    ours = L.cross_entropy_loss(j_logits(logits), jnp.asarray(labels, jnp.int32))
    close(ours, ref)


def test_cross_entropy_with_class_balancer_matches_reference():
    logits, labels, _ = make_batch(2)
    balancer = balance.ClassBalance(class_num=C, ignore_label=-1, decay=0.9, temperature=0.5)
    ref = balance.CrossEntropy(ignore_label=-1, class_balancer=balancer)(
        t(logits), t(labels)
    )
    state = init_class_balance(C, decay=0.9, temperature=0.5)
    w, state = class_balance_weight(state, jnp.asarray(labels, jnp.int32))
    ours = L.cross_entropy_loss(
        j_logits(logits), jnp.asarray(labels, jnp.int32), pixel_weight=w
    )
    close(ours, ref)
    np.testing.assert_allclose(
        np.asarray(state.freq), balancer.freq.numpy(), rtol=1e-5, atol=1e-7
    )


@pytest.mark.parametrize("thresh", [0.7, 0.999])  # many-hard and few-hard regimes
def test_ohem_matches_reference(thresh):
    logits, labels, _ = make_batch(3)
    ref = balance.OhemCrossEntropy(ignore_label=-1, thresh=thresh)(t(logits), t(labels))
    ours = L.ohem_cross_entropy(
        j_logits(logits), jnp.asarray(labels, jnp.int32), thresh=thresh
    )
    close(ours, ref)


def test_focal_matches_reference():
    logits, labels, _ = make_batch(4)
    ref = balance.FocalLoss(gamma=2.0, ignore_label=-1)(t(logits), t(labels))
    ours = L.focal_loss(j_logits(logits), jnp.asarray(labels, jnp.int32), gamma=2.0)
    close(ours, ref)


# ----------------------------------------------------------------- GHM / GDP


@pytest.mark.parametrize("momentum", [0.0, 0.75])
def test_ghm_matches_reference_over_two_steps(momentum):
    ref_mod = balance.GHMLoss(bins=30, momentum=momentum, ignore_label=-1)
    state = L.init_ghm(bins=30, momentum=momentum)
    for seed in (5, 6):
        logits, labels, _ = make_batch(seed)
        ref = ref_mod(t(logits), t(labels))
        ours, state = L.ghm_loss(
            j_logits(logits), jnp.asarray(labels, jnp.int32), state
        )
        close(ours, ref)
    np.testing.assert_allclose(
        np.asarray(state.acc_sum), ref_mod.acc_sum.numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("class_balance", [False, True])
def test_gdp_matches_reference_over_two_steps(class_balance):
    ref_mod = balance.GDPLoss(
        bins=30, momentum=0.9, class_num=C, ignore_label=-1,
        class_balance=class_balance, temp=0.5,
    )
    state = L.init_ghm(bins=30, momentum=0.9)
    cb_state = init_class_balance(C, decay=0.99, temperature=0.5)
    for seed in (7, 8):
        logits, labels, _ = make_batch(seed)
        ref = ref_mod(t(logits), t(labels))
        pw = None
        n_terms = 1
        if class_balance:
            pw, cb_state = class_balance_weight(
                cb_state, jnp.asarray(labels, jnp.int32)
            )
            n_terms = 2
        ours, state = L.gdp_loss(
            j_logits(logits), jnp.asarray(labels, jnp.int32), state,
            pixel_weight=pw, n_weight_terms=n_terms,
        )
        close(ours, ref)


# ----------------------------------------------------------------- UPS / UVEM


def test_ups_matches_reference():
    logits, labels, soft = make_batch(9)
    ref = balance.UPSLoss(threshold=0.7, class_num=C, ignore_label=-1)(
        t(logits), t(labels), t(soft)
    )
    ours = L.ups_loss(
        j_logits(logits), jnp.asarray(labels, jnp.int32), j_logits(soft),
        threshold=0.7,
    )
    close(ours, ref)


@pytest.mark.parametrize("m,thr,gamma", [(0.2, 0.7, 4.0), (0.1, 0.7, 8.0), (0.0, 0.5, 2.0)])
def test_uvem_matches_reference(m, thr, gamma):
    logits, labels, soft = make_batch(10)
    ref = balance.UVEMLoss(
        m=m, threshold=thr, gamma=gamma, class_num=C, ignore_label=-1
    )(t(logits), t(labels), t(soft))
    ours = L.uvem_loss(
        j_logits(logits), jnp.asarray(labels, jnp.int32), j_logits(soft),
        m=m, threshold=thr, gamma=gamma,
    )
    close(ours, ref)


def test_uvem_weight_curve_matches_reference():
    ref_mod = balance.UVEMLoss(m=0.2, threshold=0.7, gamma=4.0, class_num=C)
    u = np.linspace(0.0, 1.6, 101).astype(np.float32)  # entropy range for C=6
    ref_w = ref_mod.get_weight(t(u)).numpy()
    ours = np.asarray(uvem_weight(jnp.asarray(u), 0.2, 0.7, 4.0))
    np.testing.assert_allclose(ours, ref_w, rtol=2e-5, atol=1e-6)


def test_uvem_with_class_balancer_matches_reference():
    logits, labels, soft = make_batch(11)
    balancer = balance.ClassBalance(class_num=C, ignore_label=-1, decay=0.95, temperature=0.5)
    ref = balance.UVEMLoss(
        m=0.2, threshold=0.7, gamma=4.0, class_balancer=balancer,
        class_num=C, ignore_label=-1,
    )(t(logits), t(labels), t(soft))
    state = init_class_balance(C, decay=0.95, temperature=0.5)
    w, state = class_balance_weight(state, jnp.asarray(labels, jnp.int32))
    ours = L.uvem_loss(
        j_logits(logits), jnp.asarray(labels, jnp.int32), j_logits(soft),
        m=0.2, threshold=0.7, gamma=4.0, pixel_weight=w,
    )
    close(ours, ref)


def test_loss_calc_uvem_multi_head_matches_reference():
    """Heads at stride-4 resolution -> align_corners=True upsample inside the
    reduction (balance.py:437-457)."""
    r = _rng(12)
    h1 = r.normal(size=(B, C, H // 2, W // 2)).astype(np.float32)
    h2 = r.normal(size=(B, C, H // 2, W // 2)).astype(np.float32)
    _, labels, soft = make_batch(12)
    ref_fn = balance.UVEMLoss(m=0.2, threshold=0.7, gamma=4.0, class_num=C)
    ref = balance.loss_calc_uvem(
        [t(h1), t(h2)], t(labels), t(soft), ref_fn, multi=True
    )
    ours = L.loss_calc_uvem(
        [j_logits(h1), j_logits(h2)],
        jnp.asarray(labels, jnp.int32),
        j_logits(soft),
        lambda p, y, s: L.uvem_loss(p, y, s, m=0.2, threshold=0.7, gamma=4.0),
    )
    close(ours, ref, rtol=5e-5)


# ------------------------------------------------------------- ClassBalance


def test_class_balance_ema_trajectory_matches_reference():
    ref_mod = balance.ClassBalance(class_num=C, ignore_label=-1, decay=0.9, temperature=0.5)
    state = init_class_balance(C, decay=0.9, temperature=0.5)
    for seed in range(3):
        _, labels, _ = make_batch(20 + seed)
        ref_w = ref_mod.get_class_weight_4pixel(t(labels).view(-1)).numpy()
        ours_w, state = class_balance_weight(state, jnp.asarray(labels, jnp.int32))
        np.testing.assert_allclose(np.asarray(ours_w), ref_w, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.freq), ref_mod.freq.numpy(), rtol=1e-5, atol=1e-7
    )


# ------------------------------------------------------------------- CORAL


@pytest.mark.parametrize("is_sqrt", [False, True])
def test_coral_matches_reference(is_sqrt):
    r = _rng(30)
    fs = r.normal(size=(64, 16)).astype(np.float32)
    ft = (r.normal(size=(64, 16)) * 1.5 + 0.3).astype(np.float32)
    ref = ref_coral.CoralLoss(is_sqrt=is_sqrt)(t(fs), t(ft))
    ours = coral_loss(jnp.asarray(fs), jnp.asarray(ft), is_sqrt=is_sqrt)
    close(ours, ref, rtol=1e-4)


def test_coral2_matches_reference():
    r = _rng(31)
    fs = r.normal(size=(48, 8)).astype(np.float32)
    ft = (r.normal(size=(48, 8)) * 0.5 - 0.2).astype(np.float32)
    ref = ref_coral.CoralLoss2()(t(fs), t(ft))
    ours = coral_loss2(jnp.asarray(fs), jnp.asarray(ft))
    close(ours, ref, rtol=1e-4)


def test_align_domain_matches_reference_aligner():
    alignment = ref_import("uemda.gast.alignment")
    r = _rng(32)
    fs = r.normal(size=(2, 8, 4, 5)).astype(np.float32)
    ft = (r.normal(size=(2, 8, 4, 5)) + 0.1).astype(np.float32)
    aligner = alignment.Aligner(logger=None, feat_channels=8, class_num=C)
    ref = aligner.align_domain(t(fs), t(ft))
    ours = align_domain(
        jnp.asarray(np.transpose(fs, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(ft, (0, 2, 3, 1))),
    )
    close(ours, ref, rtol=1e-4)


# ---------------------------------------------------------------- whitening


def test_class_ware_whitening_matches_reference():
    r = _rng(33)
    k, groups = 16, 4
    feats = r.normal(size=(2, k, 4, 6)).astype(np.float32)
    labels = r.integers(-1, C, size=(2, 4, 6)).astype(np.int64)
    labels[0, :2] = 5  # ensure a populated class and an empty one (class 4 maybe)
    ref = ref_whiten.ClassWareWhitening(class_ids=range(C), groups=groups)(
        t(feats), t(labels)
    )
    ours = class_ware_whitening_loss(
        jnp.asarray(np.transpose(feats, (0, 2, 3, 1))),
        jnp.asarray(labels, jnp.int32),
        class_ids=range(C),
        groups=groups,
    )
    close(ours, ref, rtol=1e-4)


# --------------------------------------------------------------------- MMD


def test_mmd_linear_matches_reference():
    r = _rng(34)
    fx = r.normal(size=(32, 12)).astype(np.float32)
    fy = (r.normal(size=(32, 12)) + 0.5).astype(np.float32)
    ref = ref_mmd.MMDLoss(kernel_type="linear")(t(fx), t(fy))
    close(mmd_linear(jnp.asarray(fx), jnp.asarray(fy)), ref, rtol=1e-4)


@pytest.mark.parametrize("fix_sigma", [None, 4.0])
def test_mmd_rbf_matches_reference(fix_sigma):
    r = _rng(35)
    fx = r.normal(size=(16, 12)).astype(np.float32)
    fy = (r.normal(size=(16, 12)) + 0.5).astype(np.float32)
    ref = ref_mmd.MMDLoss(kernel_type="rbf", fix_sigma=fix_sigma)(t(fx), t(fy))
    ours = mmd_rbf(jnp.asarray(fx), jnp.asarray(fy), fix_sigma=fix_sigma)
    close(ours, ref, rtol=1e-4)


# --------------------------------------------------------------------- PCL


def test_prototype_contrastive_loss_matches_reference():
    r = _rng(36)
    k = 16
    proto = r.normal(size=(C, k)).astype(np.float32)
    feat = r.normal(size=(B, k, 4, 5)).astype(np.float32)
    labels = r.integers(-1, C, size=(B, 4, 5)).astype(np.int64)
    tf = t(feat).requires_grad_(True)  # reference asserts feat.requires_grad
    ref = ref_loss.PrototypeContrastiveLoss(temperature=8.0, ignore_label=-1)(
        t(proto), tf, t(labels)
    )
    ours = prototype_contrastive_loss(
        jnp.asarray(proto),
        jnp.asarray(np.transpose(feat, (0, 2, 3, 1))),
        jnp.asarray(labels, jnp.int32),
        temperature=8.0,
    )
    close(ours, ref, rtol=2e-5)
