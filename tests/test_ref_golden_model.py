"""Live-reference golden test: the ACTUAL reference Deeplabv2 end to end.

Round-1 verdict item 2 asked for the real ``uemda.models.Encoder.Deeplabv2``
(imported via the ever/torch_scatter shims in tests/ref_oracle) as the
oracle: randomize its weights, port the state dict through
``models/port_torch.port_deeplabv2``, and compare our flax model's forward
against the reference's — eval mode (averaged softmax at input resolution,
``Encoder.py:152-155``) and train mode ``(x1, x2, feat)`` (``:144-151``).

This validates the weight-port naming contract against the reference's real
module tree (not our independent torch re-implementation), plus dilation
surgery, instance norm, PPM heads, and bilinear resize semantics.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import ref_import

from uemda_tpu.models import DeeplabV2, DeeplabV2Config
from uemda_tpu.models.port_torch import port_deeplabv2

Encoder = ref_import("uemda.models.Encoder")

C = 6
HW = 64


def build_reference(multi_layer=True, use_ppm=True, is_ins_norm=True):
    torch.manual_seed(0)
    model = Encoder.Deeplabv2(
        dict(
            backbone=dict(
                resnet_type="resnet50",
                output_stride=16,
                pretrained=False,
            ),
            multi_layer=multi_layer,
            cascade=False,
            use_ppm=use_ppm,
            ppm=dict(num_classes=C, use_aux=False, fc_dim=2048),
            inchannels=2048,
            num_classes=C,
            is_ins_norm=is_ins_norm,
        )
    )
    # randomize every parameter AND the BN running stats so the port is
    # checked against non-default values
    gen = torch.Generator().manual_seed(7)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            r = torch.rand(v.shape, generator=gen) * 0.2 - 0.1
            if k.endswith("running_var"):
                r = r.abs() + 0.5
            sd[k] = r
    model.load_state_dict(sd)
    model.eval()
    return model


def port_to_flax(model, use_ppm=True, multi_layer=True):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return port_deeplabv2(sd, use_ppm=use_ppm, multi_layer=multi_layer)


@pytest.fixture(scope="module")
def ref_and_ours():
    ref_model = build_reference()
    variables = port_to_flax(ref_model)
    cfg = DeeplabV2Config.uemda_default(num_classes=C)
    ours = DeeplabV2(cfg)
    return ref_model, ours, variables


def test_eval_forward_matches_reference(ref_and_ours):
    ref_model, ours, variables = ref_and_ours
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, HW, HW, 3)).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = jax.jit(lambda v, a: ours.apply(v, a, train=False))(
        variables, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.transpose(ref.numpy(), (0, 2, 3, 1)),
        rtol=1e-4,
        atol=2e-5,
    )


def test_train_forward_matches_reference(ref_and_ours, monkeypatch):
    """Train-mode (x1, x2, feat) parity. Dropout masks cannot match across
    frameworks, so dropout is disabled on BOTH sides (torch: module .eval();
    flax: identity patch) — the test checks batch-stat BN, heads and feat."""
    ref_model, ours, variables = ref_and_ours
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, HW, HW, 3)).astype(np.float32)
    ref_model.train()
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.eval()
    try:
        with torch.no_grad():
            r1, r2, rfeat = ref_model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    finally:
        ref_model.eval()
    import flax.linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__", lambda self, x, *a, **k: x
    )
    (o1, o2, ofeat), _ = jax.jit(
        lambda v, a: ours.apply(v, a, train=True, mutable=["batch_stats"])
    )(variables, jnp.asarray(x))
    for ref_t, our_t in [(r1, o1), (r2, o2), (rfeat, ofeat)]:
        # batch-stat BN accumulates in a different order across frameworks;
        # observed max drift ~2e-3 on the head logits at 64^2
        np.testing.assert_allclose(
            np.asarray(our_t),
            np.transpose(ref_t.numpy(), (0, 2, 3, 1)),
            rtol=5e-3,
            atol=5e-3,
        )
