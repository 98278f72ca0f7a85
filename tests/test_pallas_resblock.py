"""Parity tests for the fused identity-bottleneck Pallas kernel
(ops/pallas_resblock.py) against the XLA composition it replaces
(infer/fastpath._block_forward), in interpret mode on the CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.ops.pallas_resblock import bottleneck_identity_pallas


def _xla_block(x, w1, b1, w2, b2, w3, b3, dil=1):
    """The exact composition fastpath._conv/_block_forward executes: conv
    output in the serving dtype (f32 accumulation internal to XLA), bias
    cast to that dtype and added after."""
    def conv(h, w, b, pad, d=1):
        y = jax.lax.conv_general_dilated(
            h, w.astype(h.dtype), (1, 1), ((pad, pad), (pad, pad)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(h.dtype)
    y = jax.nn.relu(conv(x, w1, b1, 0))
    y = jax.nn.relu(conv(y, w2, b2, dil, dil))
    y = conv(y, w3, b3, 0)
    return jax.nn.relu(y + x)


def _make(seed, b=2, h=16, w=16, cin=32, cmid=8, dtype=jnp.float32):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(b, h, w, cin)), dtype)
    w1 = jnp.asarray(r.normal(size=(1, 1, cin, cmid)) * 0.2, dtype)
    w2 = jnp.asarray(r.normal(size=(3, 3, cmid, cmid)) * 0.2, dtype)
    w3 = jnp.asarray(r.normal(size=(1, 1, cmid, cin)) * 0.2, dtype)
    b1 = jnp.asarray(r.normal(size=(cmid,)), jnp.float32)
    b2 = jnp.asarray(r.normal(size=(cmid,)), jnp.float32)
    b3 = jnp.asarray(r.normal(size=(cin,)), jnp.float32)
    return x, w1, b1, w2, b2, w3, b3


def test_single_band_matches_xla():
    args = _make(0)
    ref = _xla_block(*args)
    out = bottleneck_identity_pallas(*args, band_rows=16)  # n_bands == 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_multi_band_halo_matches_xla():
    args = _make(1)
    ref = _xla_block(*args)
    for rows in (8, 4):  # 2 and 4 bands — exercises first/interior/last DMA
        out = bottleneck_identity_pallas(*args, band_rows=rows)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_dilated_matches_xla():
    """dilation=2 (DeeplabV2's layer4 plan): 2-row halo, +-2 column shifts;
    single-band, band==dil edge, and interior-band cases."""
    args = _make(4)
    ref = _xla_block(*args, dil=2)
    for rows in (16, 8, 2):
        out = bottleneck_identity_pallas(*args, band_rows=rows, dilation=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_rounding_matches_xla_epilogue():
    """In the serving dtype (bf16) the kernel must follow fastpath._conv's
    rounding: conv output rounded to bf16 BEFORE the dtype-cast bias add and
    residual add. Tolerance covers only the 3x3 f32 tap-order (~1 ulp)."""
    args = _make(3, dtype=jnp.bfloat16)
    ref = _xla_block(*args)
    out = bottleneck_identity_pallas(*args, band_rows=8)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1.6e-2, atol=1.6e-2,
    )


def test_serving_forward_fused_stages_parity():
    """build_serving_params(fused_stages=(1, 2)) must produce the exact same
    eval output as the plain fold on a small DeeplabV2."""
    from uemda_tpu.infer.fastpath import build_serving_params, serving_forward
    from uemda_tpu.models import BackboneConfig, DeeplabV2, DeeplabV2Config
    from uemda_tpu.models.config import PPMConfig

    cfg = DeeplabV2Config(
        backbone=BackboneConfig(resnet_type="resnet50", output_stride=16),
        multi_layer=True, use_ppm=True,
        ppm=PPMConfig(num_classes=6, fc_dim=2048),
        inchannels=2048, num_classes=6, is_ins_norm=True,
    )
    model = DeeplabV2(cfg)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.ones((1, 32, 32, 3)), train=False
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 32, 32, 3)), jnp.float32
    )
    meta0, p0 = build_serving_params(model, variables, dtype=jnp.float32,
                                     s2b_layer4=False)
    meta1, p1 = build_serving_params(model, variables, dtype=jnp.float32,
                                     s2b_layer4=False, fused_stages=(1, 2))
    ref = serving_forward(meta0, p0, x)
    out = serving_forward(meta1, p1, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
