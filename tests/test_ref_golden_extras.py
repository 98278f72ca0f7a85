"""Live-reference golden tests: dormant/auxiliary reference modules.

Oracles (via tests/ref_oracle shims) for: TransNorm, DCA regularizers,
TripletLoss, PixelContrastLoss._contrastive, SAW, MSCLoss, cutmix/classmix/
mixup paste cores (randomness pinned on the torch side), and the small
tools.py losses (som/entropy/kld/bce).  Reference files:
``uemda/trans_norm.py``, ``uemda/dca_modules.py``, ``uemda/gast/triple.py``,
``uemda/gast/contrastive.py``, ``uemda/gast/SAW.py``,
``uemda/gast/MSCLoss.py``, ``uemda/utils/{cutmix,classmix,tools}.py``.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import ref_import

from uemda_tpu.alignment import dca
from uemda_tpu.alignment.contrastive import contrastive_anchors, triplet_loss
from uemda_tpu.alignment.extra_losses import (
    entropy_loss,
    kld_loss,
    mixup,
    som,
)
from uemda_tpu.alignment.msc import msc_loss
from uemda_tpu.alignment.saw import saw_loss
from uemda_tpu.models.trans_norm import TransNorm2d
from uemda_tpu.ops.mixing import box_mask, classmix_paste

ref_tn = ref_import("uemda.trans_norm")
ref_dca = ref_import("uemda.dca_modules")
ref_triple = ref_import("uemda.gast.triple")
ref_contrastive = ref_import("uemda.gast.contrastive")
ref_saw = ref_import("uemda.gast.SAW")
ref_msc = ref_import("uemda.gast.MSCLoss")
ref_cutmix = ref_import("uemda.utils.cutmix")
ref_classmix = ref_import("uemda.utils.classmix")
ref_tools = ref_import("uemda.utils.tools")


def _rng(seed=0):
    return np.random.default_rng(seed)


def t(x):
    return torch.from_numpy(np.asarray(x))


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def close(ours, ref, rtol=2e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(ours, np.float64),
        np.asarray(ref.detach().numpy() if torch.is_tensor(ref) else ref, np.float64),
        rtol=rtol,
        atol=atol,
    )


# ---------------------------------------------------------------- TransNorm


def test_trans_norm_train_and_eval_match_reference():
    C = 8
    r = _rng(0)
    ref_mod = ref_tn.TransNorm2d(C)
    with torch.no_grad():
        ref_mod.weight.copy_(t(r.random(C).astype(np.float32) + 0.5))
        ref_mod.bias.copy_(t(r.normal(size=C).astype(np.float32)))
        ref_mod.running_mean_source.copy_(t(r.normal(size=C).astype(np.float32)))
        ref_mod.running_mean_target.copy_(t(r.normal(size=C).astype(np.float32)))
        ref_mod.running_var_source.copy_(t(r.random(C).astype(np.float32) + 0.5))
        ref_mod.running_var_target.copy_(t(r.random(C).astype(np.float32) + 0.5))

    ours = TransNorm2d(C)
    # NOTE: copy the torch buffers — on the CPU backend jnp.asarray of a
    # torch .numpy() view is zero-copy, and the reference's train forward
    # updates its running stats IN PLACE, which would silently mutate our
    # input state mid-test.
    snap = lambda v: jnp.asarray(np.array(v.detach().numpy(), copy=True))
    variables = {
        "params": {
            "scale": snap(ref_mod.weight),
            "bias": snap(ref_mod.bias),
        },
        "batch_stats": {
            "mean_source": snap(ref_mod.running_mean_source),
            "mean_target": snap(ref_mod.running_mean_target),
            "var_source": snap(ref_mod.running_var_source),
            "var_target": snap(ref_mod.running_var_target),
        },
    }

    x = r.normal(size=(4, 5, 6, C)).astype(np.float32)

    # eval mode: target running stats + running-stat alpha
    ref_mod.eval()
    with torch.no_grad():
        ref_eval = ref_mod(nchw(x))
    our_eval = ours.apply(variables, jnp.asarray(x), train=False)
    close(our_eval, ref_eval.permute(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    # train mode: per-domain batch stats, shared affine, batch alpha; also
    # check the running-stat EMA update
    ref_mod.train()
    ref_train = ref_mod(nchw(x))
    our_train, mutated = ours.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    close(our_train, ref_train.permute(0, 2, 3, 1), rtol=1e-4, atol=1e-5)
    for ref_buf, key in [
        (ref_mod.running_mean_source, "mean_source"),
        (ref_mod.running_mean_target, "mean_target"),
        (ref_mod.running_var_source, "var_source"),
        (ref_mod.running_var_target, "var_target"),
    ]:
        close(mutated["batch_stats"][key], ref_buf, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- DCA


def _dca_inputs(seed, B=4, C=6, K=16, h=4, w=5, related=True):
    r = _rng(seed)
    p1 = r.normal(size=(B, h, w, C)).astype(np.float32)
    p2 = r.normal(size=(B, h, w, C)).astype(np.float32)
    feats = r.normal(size=(B, h, w, K)).astype(np.float32)
    if related:
        # correlate the two batch halves so the correlation diagonal is
        # positive (the reference's -log(diag) is NaN otherwise)
        feats[B // 2:] = feats[: B // 2] + 0.05 * r.normal(size=(B // 2, h, w, K))
        p1[B // 2:] = p1[: B // 2]
        p2[B // 2:] = p2[: B // 2]
    return p1, p2, feats


def test_dca_get_context_matches_reference():
    p1, _, feats = _dca_inputs(1, related=False)
    m = ref_dca.CategoryAlign_Module(num_classes=6, ignore_bg=True)
    probs = torch.softmax(nchw(p1), dim=1)
    ref = m.get_context(probs, nchw(feats))
    ours = dca.get_context(
        jax.nn.softmax(jnp.asarray(p1), -1), jnp.asarray(feats), ignore_bg=True
    )
    close(ours, ref, rtol=1e-4, atol=1e-5)


def test_dca_icr_matches_reference():
    p1, p2, feats = _dca_inputs(2)
    ref = ref_dca.ICR(
        [nchw(p1), nchw(p2), nchw(feats)], num_classes=6,
        multi_layer=True, ignore_bg=True,
    )
    ours = dca.icr(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(feats),
                   num_classes=6, ignore_bg=True)
    close(ours, ref, rtol=1e-4, atol=1e-5)


def test_dca_ccr_matches_reference():
    p1, p2, feats = _dca_inputs(3)
    q1, q2, featt = _dca_inputs(3)  # same seed -> correlated domains
    ref = ref_dca.CCR(
        [nchw(p1), nchw(p2), nchw(feats)],
        [nchw(q1), nchw(q2), nchw(featt)],
        num_classes=6, multi_layer=True, ignore_bg=True,
    )
    ours = dca.ccr(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(feats),
        jnp.asarray(q1), jnp.asarray(q2), jnp.asarray(featt),
        num_classes=6, ignore_bg=True,
    )
    close(ours, ref, rtol=1e-4, atol=1e-5)


def test_dca_mse_variants_match_reference():
    p1, p2, feats = _dca_inputs(4, related=False)
    q1, q2, featt = _dca_inputs(5, related=False)
    ref_i = ref_dca.MSE_intra([nchw(p1), nchw(p2), nchw(feats)],
                              multi_layer=True, ignore_bg=True)
    ours_i = dca.mse_intra(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(feats),
                           ignore_bg=True)
    close(ours_i, ref_i, rtol=1e-4, atol=1e-6)
    ref_c = ref_dca.MSE_cross(
        [nchw(p1), nchw(p2), nchw(feats)], [nchw(q1), nchw(q2), nchw(featt)],
        multi_layer=True, ignore_bg=True,
    )
    ours_c = dca.mse_cross(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(feats),
        jnp.asarray(q1), jnp.asarray(q2), jnp.asarray(featt), ignore_bg=True,
    )
    close(ours_c, ref_c, rtol=1e-4, atol=1e-6)


# ----------------------------------------------------------- triplet/supcon


def test_triplet_loss_matches_reference():
    r = _rng(6)
    feats = r.normal(size=(16, 8)).astype(np.float32)
    labels = r.integers(0, 4, size=(16,)).astype(np.int64)
    try:
        ref = ref_triple.TripletLoss(margin=0.3)(t(feats), t(labels))
    except TypeError:
        pytest.skip("reference TripletLoss uses the removed addmm_ overload")
    ours = triplet_loss(jnp.asarray(feats), jnp.asarray(labels), margin=0.3)
    close(ours, ref, rtol=1e-4, atol=1e-6)


def test_pixel_contrast_core_matches_reference():
    """The anchor-sampling stage is randomized (torch.randperm) so the oracle
    targets ``_contrastive`` on fixed sampled anchors."""
    r = _rng(7)
    A, V, K = 6, 4, 8
    feats = r.normal(size=(A, V, K)).astype(np.float32)
    labels = r.integers(0, 3, size=(A,)).astype(np.float32)
    ref = ref_contrastive.PixelContrastLoss()._contrastive(t(feats), t(labels))
    ours = contrastive_anchors(jnp.asarray(feats), jnp.asarray(labels))
    close(ours, ref, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------- SAW


def test_saw_matches_reference():
    r = _rng(8)
    C, K = 6, 24  # 4 groups
    feats = r.normal(size=(2, 5, 7, K)).astype(np.float32)
    cls = torch.nn.Conv2d(K, C, 1, bias=False)
    with torch.no_grad():
        cls.weight.copy_(t(r.normal(size=(C, K, 1, 1)).astype(np.float32)))
    ref = ref_saw.SAW(cls, selected_classes=list(range(C)), relax_denom=2.0)(
        nchw(feats)
    )
    ours = saw_loss(
        jnp.asarray(feats),
        jnp.asarray(cls.weight.detach().numpy()[:, :, 0, 0]),
        selected_classes=list(range(C)),
        relax_denom=2.0,
    )
    close(ours, ref, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------- MSC


def test_msc_matches_reference():
    r = _rng(9)
    N, D, CLS = 24, 8, 3
    src = r.normal(size=(N, D)).astype(np.float32)
    tgt = r.normal(size=(N, D)).astype(np.float32)
    labels = np.tile(np.arange(CLS), N // CLS).astype(np.int64)
    m = ref_msc.MSCLoss({"m": 3, "mu": 8, "k": 5})
    m.n_per_domain = N  # the reference sets this attribute externally
    ref = m(t(src), t(labels), t(tgt))
    ours = msc_loss(
        jnp.asarray(src), jnp.asarray(labels), jnp.asarray(tgt),
        num_classes=CLS, k=5, m=3, mu=8,
    )
    close(ours, ref, rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------- mixing cores


def test_cutmix_paste_matches_reference(monkeypatch):
    r = _rng(10)
    B, C, H, W = 2, 3, 16, 20
    ds = r.random(size=(B, H, W, C)).astype(np.float32)
    dt = r.random(size=(B, H, W, C)).astype(np.float32)
    ys = r.integers(0, 6, size=(B, H, W)).astype(np.int64)
    yt = r.integers(0, 6, size=(B, H, W)).astype(np.int64)
    lam, cx, cy = 0.4, 13.3, 6.7
    monkeypatch.setattr(np.random, "beta", lambda *a, **k: lam)
    monkeypatch.setattr(np.random, "uniform", lambda lo, hi: cx if hi == W else cy)
    _, _, ref_dt, ref_yt = ref_cutmix.cutmix(nchw(ds), t(ys), nchw(dt), t(yt))
    mask = box_mask((H, W), lam, cx, cy)
    our_dt = jnp.where(mask[None, :, :, None], jnp.asarray(ds), jnp.asarray(dt))
    our_yt = jnp.where(mask[None], jnp.asarray(ys), jnp.asarray(yt))
    close(our_dt, ref_dt.permute(0, 2, 3, 1))
    np.testing.assert_array_equal(np.asarray(our_yt), ref_yt.numpy())


def test_classmix_paste_matches_reference(monkeypatch):
    r = _rng(11)
    B, C, H, W, CLS = 2, 3, 16, 20, 6
    ds = r.random(size=(B, H, W, C)).astype(np.float32)
    dt = r.random(size=(B, H, W, C)).astype(np.float32)
    ys = r.integers(-1, CLS, size=(B, H, W)).astype(np.int64)
    yt = r.integers(-1, CLS, size=(B, H, W)).astype(np.int64)
    order = torch.tensor([4, 1, 5, 0, 2, 3])
    monkeypatch.setattr(torch, "randperm", lambda n: order[:n])
    _, _, ref_dt, ref_yt = ref_classmix.classmix(
        nchw(ds), t(ys), nchw(dt), t(yt), ratio=0.5, class_num=CLS,
        ignore_label=-1,
    )
    selected = jnp.zeros((CLS,)).at[jnp.asarray(order[: CLS // 2].numpy())].set(1.0)
    _, _, our_dt, our_yt = classmix_paste(
        selected, jnp.asarray(ds), jnp.asarray(ys, jnp.int32),
        jnp.asarray(dt), jnp.asarray(yt, jnp.int32), CLS,
    )
    close(our_dt, ref_dt.permute(0, 2, 3, 1))
    np.testing.assert_array_equal(np.asarray(our_yt), ref_yt.numpy())


# --------------------------------------------------------------- tools odds


def test_som_matches_reference():
    r = _rng(12)
    loss = (r.random(size=(100,)) * 2).astype(np.float32)
    ref = ref_tools.som(t(loss), ratio=0.5, reduction="mean")
    close(som(jnp.asarray(loss), ratio=0.5), ref)


def test_entropy_and_kld_losses_match_reference():
    r = _rng(13)
    B, C, H, W = 2, 6, 8, 10
    logits = r.normal(size=(B, H, W, C)).astype(np.float32)
    weight = (r.random(size=(B, H, W, 1)) > 0.3).astype(np.float32)
    ref_e = ref_tools.entropyloss(nchw(logits), nchw(weight))
    close(entropy_loss(jnp.asarray(logits), jnp.asarray(weight)), ref_e, rtol=1e-4)
    ref_k = ref_tools.kldloss(nchw(logits), nchw(weight))
    close(kld_loss(jnp.asarray(logits), jnp.asarray(weight)), ref_k, rtol=1e-4)


def test_mixup_core_matches_reference(monkeypatch):
    """Pin the row split and the permutation on the torch side and replay the
    same (perm, lam) through a jnp re-application of our mixup's where-mask."""
    r = _rng(14)
    B, C, H, W = 4, 3, 16, 16
    si = r.random(size=(B, H, W, C)).astype(np.float32)
    ti = r.random(size=(B, H, W, C)).astype(np.float32)
    sl = r.integers(0, 6, size=(B, H, W)).astype(np.int64)
    tl = r.integers(0, 6, size=(B, H, W)).astype(np.int64)
    perm = torch.tensor([2, 0, 3, 1])
    monkeypatch.setattr(torch, "randperm", lambda n: perm)
    monkeypatch.setattr(np.random, "beta", lambda *a: 0.6)
    rs_i, rs_l, rt_i, rt_l = ref_tools.mixup(nchw(si), t(sl), nchw(ti), t(tl))
    lam = int(0.6 * H)
    rows = jnp.arange(H)[None, :, None, None]
    cut = rows < lam
    p = jnp.asarray(perm.numpy())
    ti_p, tl_p = jnp.asarray(ti)[p], jnp.asarray(tl)[p]
    our_si = jnp.where(cut, jnp.asarray(si), ti_p)
    our_sl = jnp.where(cut[:, :, :, 0], jnp.asarray(sl), tl_p)
    our_ti = jnp.where(cut, ti_p, jnp.asarray(si))
    our_tl = jnp.where(cut[:, :, :, 0], tl_p, jnp.asarray(sl))
    close(our_si, rs_i.permute(0, 2, 3, 1))
    close(our_ti, rt_i.permute(0, 2, 3, 1))
    np.testing.assert_array_equal(np.asarray(our_sl), rs_l.numpy())
    np.testing.assert_array_equal(np.asarray(our_tl), rt_l.numpy())
