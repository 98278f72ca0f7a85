"""label_refine views vs a torch golden re-derivation (alignment.py:194-293)."""

import numpy as np
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from uemda_tpu.alignment.prototypes import init_aligner, label_refine

EPS = 1e-7
C, K, B = 4, 16, 2
H, W = 2, 2  # feature resolution
HO, WO = 8, 8  # label resolution


def _torch_pearson(f1, f2):
    k = f1.shape[-1]
    c1 = f1 - f1.mean(dim=-1, keepdim=True)
    c2 = f2 - f2.mean(dim=-1, keepdim=True)
    cov = (c1.unsqueeze(1) * c2.unsqueeze(0)).sum(-1) / (k - 1 + EPS)
    s1 = f1.std(dim=-1).unsqueeze(1)
    s2 = f2.std(dim=-1).unsqueeze(0)
    return (-cov / (s1 * s2 + EPS) + 1.0) * 0.5


def _case(seed=0):
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal((B, H, W, K)).astype(np.float32)
    proto = rng.standard_normal((C, K)).astype(np.float32)
    preds = [rng.standard_normal((B, H, W, C)).astype(np.float32) for _ in range(2)]
    raw = rng.standard_normal((B, HO, WO, C)).astype(np.float32)
    e = np.exp(raw - raw.max(-1, keepdims=True))
    soft = (e / e.sum(-1, keepdims=True)).astype(np.float32)
    sup = rng.integers(0, 3, size=(B, HO, WO)).astype(np.int32)
    sup[:, 0, 0] = 3  # boundary id = max id
    return feat, proto, preds, soft, sup


def _golden(feat, proto, preds, soft, sup, mode, temp=2.0):
    tf_feat = torch.from_numpy(feat.reshape(-1, K))
    tproto = torch.from_numpy(proto)
    tsoft = torch.from_numpy(soft.transpose(0, 3, 1, 2))
    weight = 0
    if mode in ("all", "p"):
        simi = 1.0 / _torch_pearson(tf_feat, tproto)
        simi = simi.view(B, H, W, C).permute(0, 3, 1, 2)
        simi = tnf.interpolate(simi, (HO, WO), mode="bilinear", align_corners=True)
        pw = torch.softmax(simi, dim=1)
        pw = pw / (pw.max(dim=1, keepdim=True)[0] + EPS)
        weight = weight + pw
    if mode in ("all", "l"):
        x1 = tnf.interpolate(
            torch.from_numpy(preds[0].transpose(0, 3, 1, 2)), (HO, WO),
            mode="bilinear", align_corners=True)
        x2 = tnf.interpolate(
            torch.from_numpy(preds[1].transpose(0, 3, 1, 2)), (HO, WO),
            mode="bilinear", align_corners=True)
        lw = (torch.softmax(x1 / temp, 1) + torch.softmax(x2 / temp, 1)) * 0.5
        lw = lw / (lw.max(dim=1, keepdim=True)[0] + EPS)
        weight = weight + lw
    if mode in ("all", "s"):
        tsup = torch.from_numpy(sup).long().reshape(B, -1, 1)
        cnt = tsup.max()
        ignored = (tsup == cnt).reshape(B, HO, WO, 1).permute(0, 3, 1, 2).repeat(1, C, 1, 1)
        flat_soft = tsoft.permute(0, 2, 3, 1).reshape(B, -1, C)
        pooled = torch.full((B, int(cnt) + 1, C), -float("inf"))
        for b in range(B):
            for n in range(HO * WO):
                s = int(tsup[b, n, 0])
                pooled[b, s] = torch.maximum(pooled[b, s], flat_soft[b, n])
        gathered = torch.gather(pooled, 1, tsup.repeat(1, 1, C))
        prob_pixel = gathered.reshape(B, HO, WO, C).permute(0, 3, 1, 2)
        prob_pixel = torch.softmax(prob_pixel / temp, dim=1)
        sw = prob_pixel / (prob_pixel.max(dim=1, keepdim=True)[0] + EPS)
        if mode == "all":
            weight = torch.where(ignored, weight, weight * sw)
        else:
            weight = torch.where(ignored, torch.ones_like(sw), sw)
    out = weight * tsoft
    out = out / (out.sum(dim=1, keepdim=True) + EPS)
    return out.permute(0, 2, 3, 1).numpy()


def test_label_refine_views_match_golden():
    feat, proto, preds, soft, sup = _case()
    state = init_aligner(C, K, prototypes=jnp.asarray(proto))
    for mode in ("p", "l", "s", "all"):
        want = _golden(feat, proto, preds, soft, sup, mode)
        got = np.asarray(
            label_refine(
                state,
                jnp.asarray(soft),
                jnp.asarray(feat),
                [jnp.asarray(p) for p in preds],
                sup=jnp.asarray(sup),
                mode=mode,
                temp=2.0,
                max_segments=8,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4), mode


def test_label_refine_neighbor_view_runs():
    feat, proto, preds, soft, sup = _case(seed=1)
    state = init_aligner(C, K, prototypes=jnp.asarray(proto))
    out = np.asarray(
        label_refine(
            state,
            jnp.asarray(soft),
            jnp.asarray(feat),
            [jnp.asarray(p) for p in preds],
            mode="n",
            topk=3,
        )
    )
    assert out.shape == soft.shape
    np.testing.assert_allclose(out.sum(-1), np.ones((B, HO, WO)), atol=1e-4)


def test_label_refine_neighbor_view_matches_golden():
    """'n' view vs torch re-derivation (alignment.py:260-286)."""
    feat, proto, preds, soft, sup = _case(seed=2)
    state = init_aligner(C, K, prototypes=jnp.asarray(proto))
    topk = 3
    got = np.asarray(
        label_refine(
            state, jnp.asarray(soft), jnp.asarray(feat),
            [jnp.asarray(p) for p in preds], mode="n", temp=2.0, topk=topk,
        )
    )

    tf_feat = torch.from_numpy(feat.reshape(-1, K))
    tsoft = torch.from_numpy(soft.transpose(0, 3, 1, 2))
    simi = 1.0 / (torch.cdist(tf_feat, tf_feat) + 1e-7)
    _, topk_idx = torch.topk(simi, k=topk + 1, dim=-1)
    proto_simi = 1.0 / _torch_pearson(tf_feat, torch.from_numpy(proto))
    hard = torch.argmax(proto_simi.view(B, H, W, C).permute(0, 3, 1, 2), dim=1)
    label_repeat = hard.reshape(-1, 1).repeat(1, topk)
    topk_cls = torch.gather(label_repeat, 0, topk_idx[:, 1:])
    import torch.nn.functional as F

    onehot = F.one_hot(topk_cls, num_classes=C)
    importance = torch.ones(1, topk, 1)
    for i in range(topk):
        importance[0][i][0] = 1 - i / topk
    cls_num = torch.sum(onehot * importance, dim=1)
    ratio = cls_num / (cls_num.sum(-1, keepdim=True) + 1e-7)
    w = torch.softmax(ratio / 2.0, dim=-1)
    w = w / (1e-7 + w.max(dim=1, keepdim=True)[0])
    w = w.reshape(B, H, W, C).permute(0, 3, 1, 2)
    w = tnf.interpolate(w, (HO, WO), mode="bilinear", align_corners=True)
    out = w * tsoft
    out = (out / (out.sum(1, keepdim=True) + 1e-7)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, out, rtol=2e-3, atol=2e-4)
