"""Serving fast path (uemda_tpu/infer/fastpath.py): the folded/restructured
eval forward must match ``DeeplabV2.apply(train=False)`` — the reference eval
surface (``uemda/models/Encoder.py:144-155``) — up to float reassociation.

Covers: BN folding, space-to-depth stem, fused dual head, instance-norm
restructure, space-to-batch dilated layer4, grouped ResNeXt convs, and the
opt-in int8 head/stage quantization.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from uemda_tpu.infer.fastpath import make_serving_fn
from uemda_tpu.models import DeeplabV2, DeeplabV2Config


def _init(resnet_type, hw=64, seed=0, is_ins_norm=True, use_ppm=True,
          multi_layer=True, cascade=False):
    import dataclasses

    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type=resnet_type)
    cfg = dataclasses.replace(
        cfg, is_ins_norm=is_ins_norm, use_ppm=use_ppm,
        multi_layer=multi_layer, cascade=cascade,
    )
    model = DeeplabV2(cfg)
    x = jax.random.normal(jax.random.key(seed + 1), (2, hw, hw, 3))
    variables = model.init({"params": jax.random.key(seed)}, x, train=False)
    ref = np.asarray(
        jax.jit(lambda v, y: model.apply(v, y, train=False))(variables, x)
    )
    return model, variables, x, ref


@pytest.mark.parametrize("resnet_type", ["resnet50", "resnet18"])
@pytest.mark.parametrize("s2b", [False, True])
def test_fastpath_f32_parity(resnet_type, s2b):
    model, variables, x, ref = _init(resnet_type)
    fn, params = make_serving_fn(
        model, variables, dtype=jnp.float32, s2b_layer4=s2b
    )
    got = np.asarray(jax.jit(fn)(params, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.999


def test_fastpath_grouped_resnext():
    model, variables, x, ref = _init("resnext50_32x4d", hw=32, seed=3)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_without_instance_norm():
    model, variables, x, ref = _init("resnet18", hw=32, seed=4,
                                     is_ins_norm=False)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_int8_heads_and_stages_close():
    model, variables, x, ref = _init("resnet18", hw=64, seed=5)
    fn, params = make_serving_fn(
        model, variables, dtype=jnp.float32, heads_int8=True,
        int8_stages=(3, 4),
    )
    got = np.asarray(jax.jit(fn)(params, x))
    # probabilities stay valid and close to the exact forward
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)
    assert np.abs(got - ref).mean() < 0.02


def test_fastpath_int8_all_stages_close():
    """int8 on EVERY backbone stage (the serving mode behind
    --int8-stages 1,2,3,4 / serving_gate's fastpath_int8cal_all) stays a
    valid, close distribution; quality is gated on real checkpoints by
    tools/serving_gate.py (runs/tpu_results/full_synth_schedule.md)."""
    model, variables, x, ref = _init("resnet18", hw=64, seed=5)
    fn, params = make_serving_fn(
        model, variables, dtype=jnp.float32, heads_int8=True,
        int8_stages=(1, 2, 3, 4),
    )
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)
    assert np.abs(got - ref).mean() < 0.03


def test_fastpath_aspp_head_parity():
    model, variables, x, ref = _init("resnet18", hw=32, seed=9, use_ppm=False)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_v1c_deep_stem_parity():
    model, variables, x, ref = _init("resnet50_v1c", hw=32, seed=7)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_single_head_parity():
    """multi_layer=False: one cls_pred head, plain softmax eval
    (Encoder.py:156-165)."""
    model, variables, x, ref = _init("resnet18", hw=32, seed=11,
                                     multi_layer=False)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("use_ppm", [True, False])
def test_fastpath_cascade_parity(use_ppm):
    """cascade: head1 on c4, head2 on c5 (Encoder.py:131-143)."""
    model, variables, x, ref = _init("resnet18", hw=32, seed=12,
                                     cascade=True, use_ppm=use_ppm)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_int8_calibrated_scales_match_dynamic_on_calib_batch():
    """Calibrating on batch X and serving X must track the dynamic-amax
    outputs closely (the static scale matches the dynamic one up to
    eager-vs-jit reduction reassociation, which perturbs int8 rounding)."""
    from uemda_tpu.infer.fastpath import build_fastpath, calibrate_act_scales

    model, variables, x, ref = _init("resnet18", hw=32, seed=13)
    fp, params = build_fastpath(model, variables, dtype=jnp.float32, int8=True)
    dyn = np.asarray(jax.jit(fp.apply)(params, x))
    cal_params = calibrate_act_scales(fp.meta, params, [x])
    cal = np.asarray(jax.jit(fp.apply)(cal_params, x))
    np.testing.assert_allclose(cal.sum(-1), 1.0, atol=1e-3)
    assert np.abs(cal - dyn).mean() < 5e-3
    assert np.abs(cal - ref).mean() < 0.02  # still close to the exact fwd
    # and the scales really are embedded
    leaves_with_a = []

    def walk(t):
        if isinstance(t, dict):
            if "a" in t and "wq" in t:
                leaves_with_a.append(t)
            for v in t.values():
                walk(v)
        elif isinstance(t, list):
            for v in t:
                walk(v)

    walk(cal_params)
    assert len(leaves_with_a) > 0


def test_fastpath_fused_stem_parity():
    """Fused Pallas stem conv + maxpool (ops/pallas_stem.py) through the
    full serving forward vs the standard apply (resnet50, 7x7 stem)."""
    model, variables, x, ref = _init("resnet50", hw=64, seed=9)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32,
                                 fused_stem=True)
    assert "stem_fused" in params
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_fused_stem_falls_back_when_not_div4():
    """H, W divisible by 2 but not 4: the W-pair packing cannot run; the
    forward silently uses the plain stem + maxpool and stays exact."""
    model, variables, _, _ = _init("resnet50", hw=64, seed=10)
    x = jax.random.normal(jax.random.key(42), (1, 30, 30, 3))
    ref = np.asarray(model.apply(variables, x, train=False))
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32,
                                 fused_stem=True)
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_fused_stem_ignored_for_deep_stem():
    """v1c deep stems keep the XLA path: fused_stem must be a no-op."""
    model, variables, x, ref = _init("resnet50_v1c", hw=32, seed=11)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32,
                                 fused_stem=True)
    assert "stem_fused" not in params
    got = np.asarray(jax.jit(fn)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fastpath_rejects_odd_input_sizes():
    model, variables, _, _ = _init("resnet18", hw=32, seed=8)
    fn, params = make_serving_fn(model, variables, dtype=jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fn(params, jnp.zeros((1, 33, 33, 3)))


def test_fastpath_bf16_matches_standard_bf16_closely():
    """The production serving dtype: fastpath bf16 vs standard bf16 apply
    (both round through bf16; outputs should agree at bf16 noise level)."""
    model, variables, x, ref = _init("resnet18", hw=32, seed=6)
    fn, params = make_serving_fn(model, variables, dtype=jnp.bfloat16)
    got = np.asarray(jax.jit(fn)(params, x.astype(jnp.bfloat16)))
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=2e-2)
    assert np.abs(got - ref).mean() < 0.03
