"""Live-reference golden tests: the Aligner / prototype machinery.

Runs the ACTUAL reference ``uemda.gast.alignment.Aligner`` (with a real
torch-scatter shim — see tests/ref_oracle) and ``pseudo_generation`` on CPU
torch, and asserts our functional JAX rebuild reproduces every method:
pearson distance, prototype EMA/averaging, class/instance margin losses,
all label_refine views (prototype/prediction/superpixel/neighbor),
superpixel_expand, DownscaleLabel, per-pixel prototype weights, and both
pseudo-selection rules.  Reference: ``uemda/gast/alignment.py:24-509``,
``uemda/gast/pseudo_generation.py:24-93``.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.ref_oracle import ref_import

from uemda_tpu.alignment import prototypes as P
from uemda_tpu.ops.labels import downscale_label, index_to_onehot
from uemda_tpu.ops.pseudo import pseudo_selection, pseudo_selection_threshold
from uemda_tpu.ops.segment import superpixel_expand

alignment = ref_import("uemda.gast.alignment")
pseudo_gen = ref_import("uemda.gast.pseudo_generation")

B, C, K = 2, 6, 16
h, w = 4, 5  # feature resolution
H, W = h * 16, w * 16  # full resolution
N_SUP = 20  # superpixel ids 0..19, boundary id = 20


def _rng(seed=0):
    return np.random.default_rng(seed)


def t(x):
    return torch.from_numpy(np.asarray(x))


def nchw(x):  # numpy NHWC -> torch NCHW
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def make_aligner(proto=None, decay=0.999):
    a = alignment.Aligner(
        logger=None, feat_channels=K, class_num=C, ignore_label=-1, decay=decay
    )
    if proto is not None:
        a.prototypes = t(proto)
    return a


def make_inputs(seed=0):
    r = _rng(seed)
    feat = r.normal(size=(B, h, w, K)).astype(np.float32)
    label = r.integers(0, C, size=(B, H, W)).astype(np.int64)
    # big ignored patch + big uniform patches so downscale has non-trivial cells
    label[:, :32, :32] = -1
    label[:, 32:, :48] = r.integers(0, C)
    soft = r.random(size=(B, H, W, C)).astype(np.float32) + 1e-3
    soft = soft / soft.sum(axis=-1, keepdims=True)
    preds = [r.normal(size=(B, h, w, C)).astype(np.float32) for _ in range(2)]
    sup = r.integers(0, N_SUP, size=(B, H, W)).astype(np.int64)
    sup[:, ::16, :] = N_SUP  # boundary-shrunk pixels carry the max id
    proto = r.normal(size=(C, K)).astype(np.float32)
    return feat, label, soft, preds, sup, proto


def close(ours, ref, rtol=3e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(ours, np.float64),
        np.asarray(ref.detach().numpy() if torch.is_tensor(ref) else ref, np.float64),
        rtol=rtol,
        atol=atol,
    )


# ------------------------------------------------------------------ basics


def test_pearson_dist_matches_reference():
    feat, _, _, _, _, proto = make_inputs(0)
    a = make_aligner()
    ref = a._pearson_dist(t(feat.reshape(-1, K)), t(proto))
    ours = P.pearson_dist(jnp.asarray(feat.reshape(-1, K)), jnp.asarray(proto))
    close(ours, ref)


def test_index2onehot_matches_reference():
    _, label, _, _, _, _ = make_inputs(1)
    a = make_aligner()
    ref = a._index2onehot(t(label))
    ours = index_to_onehot(jnp.asarray(label, jnp.int32), C)
    close(ours, ref.float())


def test_downscale_label_matches_reference():
    _, label, _, _, _, _ = make_inputs(2)
    a = make_aligner()
    ref = a.downscale_gt(t(label)).squeeze(1)  # (B, h, w)
    ours = downscale_label(jnp.asarray(label, jnp.int32), 16, C)
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


# -------------------------------------------------------------- prototypes


def test_update_prototype_matches_reference():
    feat, label, _, _, _, proto = make_inputs(3)
    a = make_aligner(proto, decay=0.99)
    ref_down = a.update_prototype(nchw(feat), t(label))
    st = P.init_aligner(C, K, decay=0.99, prototypes=proto)
    st, our_down = P.update_prototype(st, jnp.asarray(feat), jnp.asarray(label, jnp.int32), C)
    np.testing.assert_array_equal(np.asarray(our_down), ref_down.squeeze(1).numpy())
    close(st.prototypes, a.prototypes, rtol=1e-4)
    # second step continues the EMA identically
    feat2, label2, _, _, _, _ = make_inputs(4)
    a.update_prototype(nchw(feat2), t(label2))
    st, _ = P.update_prototype(st, jnp.asarray(feat2), jnp.asarray(label2, jnp.int32), C)
    close(st.prototypes, a.prototypes, rtol=1e-4)


def test_update_avg_init_avg_matches_reference():
    a = make_aligner()
    st = P.init_aligner(C, K)
    for seed in (5, 6):
        feat, label, _, _, _, _ = make_inputs(seed)
        a.update_avg(nchw(feat), t(label))
        st = P.update_avg(st, jnp.asarray(feat), jnp.asarray(label, jnp.int32), C)

    class _L:  # silent logger for init_avg's info calls
        def info(self, *_):
            pass

    a.logger = _L()
    a.init_avg()
    st = P.init_avg(st)
    close(st.prototypes, a.prototypes, rtol=1e-4, atol=1e-5)


def test_update_prototype_bytarget_matches_reference():
    feat, _, soft, _, _, proto = make_inputs(7)
    a = make_aligner(proto, decay=0.95)
    a.update_prototype_bytarget(nchw(feat), nchw(soft))
    st = P.init_aligner(C, K, decay=0.95, prototypes=proto)
    st = P.update_prototype_by_target(st, jnp.asarray(feat), jnp.asarray(soft))
    close(st.prototypes, a.prototypes, rtol=1e-4, atol=1e-6)


# ------------------------------------------------------------ margin losses


def test_align_class_matches_reference():
    feat, label, _, _, _, proto = make_inputs(8)
    feat_t, label_t, _, _, _, _ = make_inputs(9)
    a = make_aligner(proto)
    st = P.init_aligner(C, K, prototypes=proto)
    ref = a.align_class(nchw(feat), t(label))
    ours = P.align_class(st, jnp.asarray(feat), jnp.asarray(label, jnp.int32), C)
    close(ours, ref, rtol=1e-4)
    ref2 = a.align_class(nchw(feat), t(label), nchw(feat_t), t(label_t))
    ours2 = P.align_class(
        st, jnp.asarray(feat), jnp.asarray(label, jnp.int32), C,
        jnp.asarray(feat_t), jnp.asarray(label_t, jnp.int32),
    )
    close(ours2, ref2, rtol=1e-4)


def test_align_instance_matches_reference():
    feat, label, _, _, _, proto = make_inputs(10)
    feat_t, label_t, _, _, _, _ = make_inputs(11)
    a = make_aligner(proto)
    st = P.init_aligner(C, K, prototypes=proto)
    ref = a.align_instance(nchw(feat), t(label), nchw(feat_t), t(label_t))
    ours = P.align_instance(
        st, jnp.asarray(feat), jnp.asarray(label, jnp.int32), C,
        jnp.asarray(feat_t), jnp.asarray(label_t, jnp.int32),
    )
    close(ours, ref, rtol=1e-4)


# ------------------------------------------------------------- label refine


@pytest.mark.parametrize("mode", ["p", "l", "s", "n", "all"])
def test_label_refine_matches_reference(mode):
    feat, _, soft, preds, sup, proto = make_inputs(12)
    a = make_aligner(proto)
    ref = a.label_refine(
        t(sup).unsqueeze(1), nchw(feat), [nchw(p) for p in preds], nchw(soft),
        refine=True, mode=mode, temp=2.0,
    )
    ours = P.label_refine(
        P.init_aligner(C, K, prototypes=proto),
        jnp.asarray(soft),
        jnp.asarray(feat),
        [jnp.asarray(p) for p in preds],
        sup=jnp.asarray(sup, jnp.int32),
        mode=mode,
        temp=2.0,
        max_segments=N_SUP + 1,
    )
    close(ours, ref.permute(0, 2, 3, 1), rtol=2e-4, atol=2e-6)


def test_label_refine_single_head_matches_reference():
    feat, _, soft, preds, sup, proto = make_inputs(13)
    a = make_aligner(proto)
    ref = a.label_refine(
        t(sup).unsqueeze(1), nchw(feat), nchw(preds[0]), nchw(soft),
        refine=True, mode="l", temp=2.0,
    )
    ours = P.label_refine(
        P.init_aligner(C, K, prototypes=proto),
        jnp.asarray(soft), jnp.asarray(feat), jnp.asarray(preds[0]),
        sup=jnp.asarray(sup, jnp.int32), mode="l", temp=2.0,
        max_segments=N_SUP + 1,
    )
    close(ours, ref.permute(0, 2, 3, 1), rtol=2e-4, atol=2e-6)


def test_prototype_weight_for_pixels_matches_reference():
    feat, label, _, _, _, proto = make_inputs(14)
    a = make_aligner(proto)
    ref = a.get_prototype_weight_4pixel(nchw(feat), t(label), temp=2.0)
    ours = P.prototype_weight_for_pixels(
        P.init_aligner(C, K, prototypes=proto),
        jnp.asarray(feat), jnp.asarray(label, jnp.int32), C,
    )
    close(ours, ref, rtol=2e-4, atol=2e-6)


# -------------------------------------------------------------- superpixels


def test_superpixel_expand_matches_reference():
    _, label, _, _, sup, _ = make_inputs(15)
    a = make_aligner()
    hard = np.where(label < 0, -1, label)
    ref = a.superpixel_expand(t(hard), t(sup).unsqueeze(1))
    ours = superpixel_expand(
        jnp.asarray(hard, jnp.int32), jnp.asarray(sup, jnp.int32), C, N_SUP + 1
    )
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


# ---------------------------------------------------------- pseudo selection


@pytest.mark.parametrize("cutoffs", [(0.8, 0.6), (0.5, 0.9)])
def test_pseudo_selection_matches_reference(cutoffs):
    top, low = cutoffs
    r = _rng(16)
    probs = r.random(size=(B, C, H, W)).astype(np.float32)
    probs = probs / probs.sum(axis=1, keepdims=True)
    ref = pseudo_gen.pseudo_selection(t(probs), top, low, return_type="tensor")
    ours = pseudo_selection(
        jnp.asarray(np.transpose(probs, (0, 2, 3, 1))), top, low
    )
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


@pytest.mark.parametrize("cutoffs", [(0.8, 0.6), (0.5, 0.9)])
def test_pseudo_selection1_matches_reference(cutoffs):
    top, low = cutoffs
    r = _rng(17)
    probs = r.random(size=(B, C, H, W)).astype(np.float32)
    probs = probs / probs.sum(axis=1, keepdims=True)
    ref = pseudo_gen.pseudo_selection1(t(probs), top, low, return_type="tensor")
    ours = pseudo_selection_threshold(
        jnp.asarray(np.transpose(probs, (0, 2, 3, 1))), top, low
    )
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())
