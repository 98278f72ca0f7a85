"""Live-reference golden tests: the backbone zoo through the REAL
``uemda.resnet.ResNetEncoder`` (ever shim), covering the variants the
Deeplabv2 end-to-end oracle (test_ref_golden_model.py) does not reach:
resnet18 (BasicBlock, OS32), resnet50 at OS8 (double dilation surgery),
ResNeXt grouped convs, and the v1c deep stem.  Reference:
``uemda/_resnets.py:32-344``, ``uemda/resnet.py:44-207``.

Plus the domain-balance oracle (``uemda/gast/domain_balance.py``).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_oracle import ref_import

from uemda_tpu.models import BackboneConfig, ResNetEncoder
from uemda_tpu.models.port_torch import port_resnet_backbone

ref_resnet = ref_import("uemda.resnet")
ref_resnets = ref_import("uemda._resnets")
ref_db = ref_import("uemda.gast.domain_balance")

# the reference registers only resnet18/34/50/101 (resnet.py:18-21); add the
# other zoo factories the same way for the oracle
from ever.core import registry  # noqa: E402  (shim, installed by ref_import)

for name in ("resnext50_32x4d", "resnet50_v1c"):
    registry.MODEL.register(name, getattr(ref_resnets, name))


VARIANTS = [
    ("resnet18", 32),
    # BasicBlock at OS16/8: the surgery dilates conv2 of the FIRST block to
    # the full stage dilate while conv1 keeps dilate//2 (resnet.py:192-207)
    # — a per-conv asymmetry Bottleneck (single 3x3) never shows
    ("resnet18", 16),
    ("resnet34", 8),
    ("resnet50", 8),
    ("resnext50_32x4d", 16),
    ("resnet50_v1c", 16),
]


def _randomize(model: torch.nn.Module, seed: int):
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            r = torch.rand(v.shape, generator=gen) * 0.2 - 0.1
            if k.endswith("running_var"):
                r = r.abs() + 0.5
            sd[k] = r
    model.load_state_dict(sd)


@pytest.mark.parametrize("name,os_", VARIANTS)
def test_encoder_pyramid_matches_reference(name, os_):
    ref = ref_resnet.ResNetEncoder(
        dict(resnet_type=name, output_stride=os_, pretrained=False)
    )
    _randomize(ref, seed=hash(name) % 1000)
    ref.eval()

    sd = {
        k[len("resnet."):]: v.detach().numpy()
        for k, v in ref.state_dict().items()
        if k.startswith("resnet.")
    }
    params, stats = port_resnet_backbone(sd, deep_stem="v1c" in name)
    ours = ResNetEncoder(
        BackboneConfig(resnet_type=name, output_stride=os_)
    )
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_pyr = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    our_pyr = jax.jit(lambda v, a: ours.apply(v, a, False))(
        variables, jnp.asarray(x)
    )
    assert len(our_pyr) == len(ref_pyr) == 4
    for rt, ot in zip(ref_pyr, our_pyr):
        np.testing.assert_allclose(
            np.asarray(ot),
            np.transpose(rt.numpy(), (0, 2, 3, 1)),
            rtol=1e-4,
            atol=2e-5,
        )


# ------------------------------------------------------------ domain balance


def test_get_target_weight_matches_reference():
    from uemda_tpu.alignment.domain_balance import get_target_weight

    for cnt_s, r_s, cnt_t, r_t in [(100, 0.9, 80, 0.5), (10, 0.2, 500, 0.9)]:
        assert get_target_weight(cnt_s, r_s, cnt_t, r_t) == pytest.approx(
            ref_db.get_target_weight(cnt_s, r_s, cnt_t, r_t)
        )


def test_examples_cnt_matches_reference():
    from uemda_tpu.alignment.domain_balance import examples_cnt

    rng = np.random.default_rng(4)
    labels = rng.integers(-1, 6, size=(5, 16, 16)).astype(np.int64)

    class _DS:  # our side: dataset protocol (item -> {"label": ...})
        def __len__(self):
            return len(labels)

        def item(self, i):
            return {"label": labels[i]}

    loader = [(None, {"cls": torch.from_numpy(labels[i : i + 1])})
              for i in range(len(labels))]
    ref_cnt, ref_ratio = ref_db.examples_cnt(loader)
    cnt, ratio = examples_cnt(_DS())
    assert cnt == pytest.approx(ref_cnt)
    assert ratio == pytest.approx(ref_ratio)
