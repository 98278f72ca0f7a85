"""Auxiliary components: C++ superpixels, discriminators/MMD, TransNorm,
mixing ops, DCA regularizers, param EMA, triplet/pixel-contrast, converters."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from uemda_tpu.alignment.contrastive import pixel_contrast_loss, triplet_loss
from uemda_tpu.alignment.dca import ccr, get_context, icr
from uemda_tpu.models.discriminator import (
    DeeplabV2MMD,
    FCDiscriminator,
    PixelDiscriminator,
    mmd_linear,
)
from uemda_tpu.models.trans_norm import TransNorm2d
from uemda_tpu.ops.mixing import classmix, cutmix, cutmix_inbatch
from uemda_tpu.train.ema import init_ema, update_ema


def test_superpixels_cpp_roundtrip():
    from uemda_tpu.superpixels import superpixels_with_shrink

    rng = np.random.default_rng(0)
    lbl = np.kron(rng.integers(0, 6, (4, 4)), np.ones((16, 16), int))
    palette = np.linspace(40, 215, 6)[:, None] * np.array([[1.0, 0.8, 0.6]])
    img = np.clip(palette[lbl] + rng.normal(0, 5, lbl.shape + (3,)), 0, 255)
    n, labels, shrunk = superpixels_with_shrink(
        img.astype(np.uint8), region_size=16, iterations=10
    )
    assert labels.shape == (64, 64)
    assert 4 <= n <= 64
    assert shrunk.max() == 16  # boundary id = (64/16)^2
    # shrunk interiors keep their original label
    interior = shrunk != 16
    assert (shrunk[interior] == labels[interior]).all()
    # every pixel adjacent to a label change within win 3 is boundary
    assert (shrunk[:, 15] == 16).any()


def test_mixing_ops_paste_consistently():
    rng = np.random.default_rng(1)
    img_s = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    img_t = jnp.zeros((2, 32, 32, 3))
    lab_s = jnp.ones((2, 32, 32), jnp.int32) * 2
    lab_t = jnp.zeros((2, 32, 32), jnp.int32)
    _, _, mixed_img, mixed_lab = cutmix(jax.random.key(0), img_s, lab_s, img_t, lab_t)
    pasted = np.asarray(mixed_lab[0]) == 2
    np.testing.assert_allclose(
        np.asarray(mixed_img[0])[pasted], np.asarray(img_s[0])[pasted]
    )
    _, _, ci, cl = classmix(
        jax.random.key(1), img_s, lab_s, img_t, lab_t, class_num=6
    )
    sel = np.asarray(cl[0]) == 2
    if sel.any():  # class 2 selected -> all pixels pasted (uniform label)
        assert sel.all()
        np.testing.assert_allclose(np.asarray(ci), np.asarray(img_s))
    d, t = cutmix_inbatch(jax.random.key(2), img_s, lab_s)
    assert d.shape == img_s.shape


def test_discriminators_shapes():
    x = jnp.ones((2, 64, 64, 6))
    d = FCDiscriminator()
    v = d.init(jax.random.key(0), x)
    out = d.apply(v, x)
    assert out.shape == (2, 2, 2, 1)
    pd = PixelDiscriminator(ndf=64, num_classes=1)
    v = pd.init(jax.random.key(0), jnp.ones((2, 8, 8, 32)))
    out = pd.apply(v, jnp.ones((2, 8, 8, 32)))
    assert out.shape == (2, 8, 8, 2)


def test_mmd_model_and_loss():
    from uemda_tpu.models.config import BackboneConfig

    m = DeeplabV2MMD(
        backbone=BackboneConfig(resnet_type="resnet18"),
        num_classes=6,
        inchannels=512,
    )
    x = jnp.ones((2, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, x, train=False)
    (logits, feat), _ = m.apply(
        v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.key(1)}
    )
    assert logits.shape == (2, 64, 64, 6)
    assert feat.shape == (2, 512 // 8)
    assert float(mmd_linear(feat, feat * 2)) >= 0


def test_transnorm_train_eval():
    tn = TransNorm2d(8)
    x = jnp.concatenate(
        [jnp.ones((2, 4, 4, 8)), jnp.ones((2, 4, 4, 8)) * 3.0], axis=0
    )
    v = tn.init(jax.random.key(0), x, train=True)
    y, mut = tn.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    # source/target stats diverge
    ms = np.asarray(mut["batch_stats"]["mean_source"])
    mt = np.asarray(mut["batch_stats"]["mean_target"])
    assert (mt > ms).all()
    y_eval = tn.apply(
        {"params": v["params"], "batch_stats": mut["batch_stats"]}, x, train=False
    )
    assert np.isfinite(np.asarray(y_eval)).all()


def test_dca_regularizers():
    rng = np.random.default_rng(2)
    p1 = jnp.asarray(rng.standard_normal((4, 4, 4, 6)), jnp.float32)
    p2 = jnp.asarray(rng.standard_normal((4, 4, 4, 6)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((4, 4, 4, 16)), jnp.float32)
    li = float(icr(p1, p2, f, 6))
    lc = float(ccr(p1, p2, f, p1, p2, f * 1.1, 6))
    assert np.isfinite(li) and np.isfinite(lc)
    # context vs torch golden
    probs = jax.nn.softmax(p1, -1)
    ctx = np.asarray(get_context(probs, f))
    tp = torch.from_numpy(np.asarray(probs).transpose(0, 3, 1, 2))
    tf_ = torch.from_numpy(np.asarray(f).transpose(0, 3, 1, 2))
    b, c, h, w = tp.shape
    k = tf_.shape[1]
    tpv = tp.reshape(b, c, 1, h * w)
    tfv = tf_.reshape(b, 1, k, h * w)
    want = (tfv * tpv).sum(-1) / tpv.sum(-1)
    want = torch.nn.functional.normalize(want, dim=1).numpy()
    np.testing.assert_allclose(ctx, want, rtol=1e-3, atol=1e-4)


def test_triplet_and_pixel_contrast():
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((12, 8)), jnp.float32)
    labels = jnp.asarray(np.repeat([0, 1, 2], 4), jnp.int32)
    lt = float(triplet_loss(feats, labels))
    assert lt >= 0
    f = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, (2, 64)), jnp.int32)
    p = jnp.asarray(rng.integers(0, 3, (2, 64)), jnp.int32)
    lp = float(
        pixel_contrast_loss(f, y, p, jax.random.key(0), num_classes=3, n_view=8)
    )
    assert np.isfinite(lp)


def test_ema_update():
    params = {"w": jnp.ones((3,))}
    shadow = init_ema(params)
    shadow = update_ema(shadow, {"w": jnp.zeros((3,))}, decay=0.9)
    np.testing.assert_allclose(np.asarray(shadow["w"]), 0.9)


def test_converter_tiling_and_lut():
    from uemda_tpu.datasets.convert import clip_boxes, color_mask_to_ids

    boxes = clip_boxes(1024, 1024, 512)
    assert len(boxes) == 4 and boxes[0] == (0, 0, 512, 512)
    boxes = clip_boxes(900, 900, 512)  # border tiles shift inward
    assert (388, 388, 900, 900) in boxes
    mask = np.zeros((2, 3, 3), np.uint8)
    mask = np.array(
        [[[255, 255, 255], [0, 0, 255], [255, 0, 0]]], np.uint8
    )  # white, blue, red
    ids = color_mask_to_ids(mask)
    assert ids[0, 0] == 1  # white -> 1
    assert ids[0, 2] == 2  # red (clutter LUT slot) -> 2
    assert ids[0, 1] == 0  # blue -> 6 -> merged to 0 (reference quirk)


def test_mmd_rbf_vs_torch():
    from uemda_tpu.alignment.mmd import mmd_linear, mmd_rbf

    rng = np.random.default_rng(4)
    s = rng.standard_normal((10, 8)).astype(np.float32)
    t = rng.standard_normal((12, 8)).astype(np.float32)
    # torch golden (mmd.py:24-58)
    ts, tt = torch.from_numpy(s), torch.from_numpy(t)
    total = torch.cat([ts, tt], 0)
    t0 = total.unsqueeze(0).expand(22, 22, 8)
    t1 = total.unsqueeze(1).expand(22, 22, 8)
    l2 = ((t0 - t1) ** 2).sum(2)
    bw = torch.sum(l2) / (22 * 22 - 22) / (2.0 ** (5 // 2))
    kern = sum(torch.exp(-l2 / (bw * 2.0 ** i)) for i in range(5))
    want = float(
        kern[:10, :10].mean() + kern[10:, 10:].mean()
        - kern[:10, 10:].mean() - kern[10:, :10].mean()
    )
    got = float(mmd_rbf(jnp.asarray(s), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # linear
    delta = ts.float().mean(0) - tt.float().mean(0)
    np.testing.assert_allclose(
        float(mmd_linear(jnp.asarray(s), jnp.asarray(t))),
        float(delta.dot(delta) / 8), rtol=1e-5,
    )


def test_saw_and_msc_run():
    from uemda_tpu.alignment.msc import msc_loss
    from uemda_tpu.alignment.saw import saw_loss

    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)
    wts = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    l = float(saw_loss(feats, wts, selected_classes=[0, 1, 2, 3]))
    assert np.isfinite(l) and l >= 0
    s = jnp.asarray(rng.standard_normal((20, 8)), jnp.float32)
    sl = jnp.asarray(rng.integers(0, 3, 20), jnp.int32)
    t = jnp.asarray(rng.standard_normal((15, 8)), jnp.float32)
    lm = float(msc_loss(s, sl, t, num_classes=3))
    assert np.isfinite(lm) and lm >= 0


def test_domain_balance(tmp_path):
    from uemda_tpu.alignment.domain_balance import examples_cnt, get_target_weight
    from uemda_tpu.datasets.base import SegDataset
    from uemda_tpu.datasets.meta import IsprsDA
    from uemda_tpu.datasets.synthetic import make_synthetic_dataset

    img_dir, ann_dir = make_synthetic_dataset(str(tmp_path), IsprsDA, 3, 1, hw=32)
    ds = SegDataset(IsprsDA, img_dir, ann_dir)
    cnt, ratio = examples_cnt(ds)
    assert cnt == 3 * 32 * 32 and ratio == 1.0
    np.testing.assert_allclose(get_target_weight(100, 1.0, 50, 1.0), 0.5, rtol=1e-6)
    assert get_target_weight(50, 1.0, 100, 1.0) == 1.0


def test_extra_losses_vs_torch():
    from uemda_tpu.alignment.extra_losses import (
        entropy_loss,
        kld_loss,
        mixup,
        som,
    )

    rng = np.random.default_rng(6)
    # som: mean of top-half entries (tools.py:291-302)
    loss_vec = jnp.asarray(rng.random(10), jnp.float32)
    top = np.sort(np.asarray(loss_vec))[::-1][:5]
    np.testing.assert_allclose(
        float(som(loss_vec, 0.5)), top.sum() / ((top != 0).sum() + 1e-6), rtol=1e-5
    )
    # entropy/kld vs torch formulas (tools.py:376-398)
    logits = rng.standard_normal((2, 4, 4, 6)).astype(np.float32)
    weight = rng.random((2, 4, 4, 1)).astype(np.float32)
    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    twt = torch.from_numpy(weight.transpose(0, 3, 1, 2))
    logp = torch.log_softmax(tl, dim=1)
    ent = -torch.softmax(tl, 1) * twt * logp
    want_e = float(ent.sum() / (twt > 0).sum())
    np.testing.assert_allclose(
        float(entropy_loss(jnp.asarray(logits), jnp.asarray(weight))),
        want_e, rtol=1e-5,
    )
    want_k = float((-1 / 6 * twt * logp).sum() / (twt > 0).sum())
    np.testing.assert_allclose(
        float(kld_loss(jnp.asarray(logits), jnp.asarray(weight))), want_k, rtol=1e-5
    )
    # mixup keeps image/label rows in lockstep
    s_img = jnp.asarray(np.broadcast_to(np.arange(8, dtype=np.float32)[None, :, None, None], (2, 8, 8, 3)).copy())
    t_img = s_img + 100
    s_lab = jnp.asarray(np.broadcast_to(np.arange(8)[None, :, None], (2, 8, 8)).copy().astype(np.int32))
    t_lab = s_lab + 100
    ns_img, ns_lab, nt_img, nt_lab = mixup(jax.random.key(0), s_img, s_lab, t_img, t_lab)
    np.testing.assert_allclose(np.asarray(ns_img[..., 0]), np.asarray(ns_lab).astype(np.float32))
    np.testing.assert_allclose(np.asarray(nt_img[..., 0]), np.asarray(nt_lab).astype(np.float32))


def test_fc_discriminator_local_and_mmd_eval():
    from uemda_tpu.models.discriminator import DeeplabV2MMD, FCDiscriminatorLocal
    from uemda_tpu.models.config import BackboneConfig

    d = FCDiscriminatorLocal(ndf=16)
    x = jnp.ones((1, 32, 32, 6 + 64))
    v = d.init(jax.random.key(0), x)
    out = d.apply(v, x)
    # 3 stride-2 convs + classifier stride-2 -> 2x2, then x32 upsample
    assert out.shape == (1, 64, 64, 1)

    m = DeeplabV2MMD(
        backbone=BackboneConfig(resnet_type="resnet18"), num_classes=6,
        inchannels=512,
    )
    xi = jnp.ones((1, 64, 64, 3))
    v = m.init({"params": jax.random.key(0)}, xi, train=False)
    prob = m.apply(v, xi, train=False)
    assert prob.shape == (1, 64, 64, 6)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-4)


def test_spixelnet_and_alt_superpixels():
    from uemda_tpu.superpixels.alt import grid_superpixels, slic_on_projection
    from uemda_tpu.superpixels.spixelnet import SpixelNet

    m = SpixelNet()
    v = m.init({"params": jax.random.key(0)}, jnp.ones((1, 64, 64, 3)), train=False)
    out = m.apply(v, jnp.ones((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 9)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)

    g = grid_superpixels((64, 64), 16)
    assert g.max() == 15 and g.shape == (64, 64)
    rng = np.random.default_rng(0)
    n, labels = slic_on_projection(
        rng.integers(0, 255, (64, 64, 3)).astype(np.uint8),
        rng.integers(0, 3, (64, 64)), iterations=5,
    )
    assert labels.shape == (64, 64) and n >= 1
