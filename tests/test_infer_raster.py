"""Spatially-sharded whole-raster inference vs the single-device slide
predictor on the same zero-padded raster (uemda_tpu/infer/raster.py).

The sharded path is bit-equivalent to running the slide predictor over the
padded raster for every row < Hp - halo; the plan guarantees H <= Hp - halo,
so the cropped outputs must agree exactly (float32, CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.infer.raster import RasterPlan, make_raster_predictor
from uemda_tpu.infer.slide import make_predictor
from uemda_tpu.parallel.mesh import make_mesh

from tests.test_infer_slide import StubModel


def _golden(plan, img_hw, raster, tta=False):
    """Single-device slide over the zero-padded raster, cropped back."""
    h, w = img_hw
    padded = np.zeros((plan.hp, plan.wp, 3), np.float32)
    padded[:h, :w] = raster
    fn = make_predictor(
        StubModel(), (plan.th, plan.tw), (plan.hp, plan.wp), tta=tta,
        compute_dtype="float32",
    )
    probs = np.asarray(fn({}, jnp.asarray(padded)[None]))[0]
    return probs[:h, :w]


def test_raster_plan_geometry():
    plan = RasterPlan((6000, 6000), (512, 512), 0.5, 8)
    assert plan.stride == 256 and plan.halo == 256
    assert plan.band_h % plan.stride == 0
    assert plan.hp == 8 * plan.band_h and plan.hp >= 6000 + plan.halo
    assert plan.local_ys[0] == 0 and plan.local_ys[-1] == plan.band_h - plan.stride
    # count canvas is positive everywhere a window lands
    cnt = plan.count_canvas()
    assert cnt[: plan.band_h].min() >= 1.0


def test_raster_matches_single_device_slide():
    mesh = make_mesh(4)
    rng = np.random.default_rng(3)
    h, w = 90, 52
    raster = rng.random((h, w, 3)).astype(np.float32)
    plan = RasterPlan((h, w), (16, 16), 0.5, 4)
    assert h <= plan.hp - plan.halo
    fn = make_raster_predictor(
        StubModel(), mesh, (h, w), tile=(16, 16), compute_dtype="float32",
        window_chunk=3, return_probs=True,
    )
    got = np.asarray(fn({}, jnp.asarray(raster)))
    want = _golden(plan, (h, w), raster)
    assert got.shape == want.shape == (h, w, StubModel.C)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_raster_tta_and_preds():
    mesh = make_mesh(2)
    rng = np.random.default_rng(4)
    h, w = 40, 23
    raster = rng.random((h, w, 3)).astype(np.float32)
    plan = RasterPlan((h, w), (16, 16), 0.5, 2)
    fn = make_raster_predictor(
        StubModel(), mesh, (h, w), tile=(16, 16), compute_dtype="float32",
        window_chunk=2, tta=True,
    )
    got = np.asarray(fn({}, jnp.asarray(raster)))
    want = _golden(plan, (h, w), raster, tta=True).argmax(-1)
    assert got.dtype == np.int32 and got.shape == (h, w)
    np.testing.assert_array_equal(got, want)


def test_raster_single_device_mesh_degenerates():
    mesh = make_mesh(1)
    rng = np.random.default_rng(5)
    h, w = 30, 16
    raster = rng.random((h, w, 3)).astype(np.float32)
    plan = RasterPlan((h, w), (16, 16), 0.5, 1)
    fn = make_raster_predictor(
        StubModel(), mesh, (h, w), tile=(16, 16), compute_dtype="float32",
        window_chunk=1, return_probs=True,
    )
    got = np.asarray(fn({}, jnp.asarray(raster)))
    want = _golden(plan, (h, w), raster)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_raster_low_overlap_no_wrap_contamination():
    """overlap=0.25 (stride > halo): the last device's beyond-grid windows
    and the wrapped forward halo must not leak into kept rows (code-review
    finding; previously only overlap=0.5 was exercised, where the
    contaminated rows happened to be cropped)."""
    mesh = make_mesh(2)
    rng = np.random.default_rng(6)
    # H chosen so kept rows reach close to Hp - halo
    h, w = 110, 40
    plan = RasterPlan((h, w), (16, 16), 0.25, 2)
    assert plan.stride == 12 and plan.halo == 4
    fn = make_raster_predictor(
        StubModel(), mesh, (h, w), tile=(16, 16), overlap=0.25,
        compute_dtype="float32", window_chunk=3, return_probs=True,
    )
    raster = rng.random((h, w, 3)).astype(np.float32)
    got = np.asarray(fn({}, jnp.asarray(raster)))
    # golden: single-device slide at the same overlap over the padded raster
    padded = np.zeros((plan.hp, plan.wp, 3), np.float32)
    padded[:h, :w] = raster
    gfn = make_predictor(
        StubModel(), (16, 16), (plan.hp, plan.wp), overlap=0.25,
        compute_dtype="float32",
    )
    want = np.asarray(gfn({}, jnp.asarray(padded)[None]))[0][:h, :w]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_raster_fastpath_compose_matches_standard():
    """FastpathModel through the sharded raster path (serving combo):
    folded params replicate over the mesh, the predictor skips the
    blanket downcast (params_precast), and predictions match the
    standard model's raster pass."""
    from uemda_tpu.infer.fastpath import build_fastpath
    from uemda_tpu.infer.raster import raster_predict
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    mesh = make_mesh(4)
    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type="resnet18")
    model = DeeplabV2(cfg)
    raster = np.random.default_rng(9).random((64, 32, 3)).astype(np.float32) * 255
    variables = model.init(
        {"params": jax.random.key(1)}, jnp.ones((1, 16, 16, 3)), train=False
    )
    kw = dict(tile=(16, 16), compute_dtype="float32", window_chunk=2)
    ref = np.asarray(raster_predict(
        model, variables, raster, (128.0,) * 3, (64.0,) * 3, mesh, **kw
    ))
    fp_model, fp_params = build_fastpath(model, variables, dtype=jnp.float32)
    got = np.asarray(raster_predict(
        fp_model, fp_params, raster, (128.0,) * 3, (64.0,) * 3, mesh, **kw
    ))
    assert (got == ref).mean() > 0.99  # argmax ties may flip on reassociation


def test_raster_predict_convenience_and_int8_compose():
    """raster_predict normalizes + runs; Int8Model composes with the
    sharded raster path (serving combo)."""
    from uemda_tpu.infer.quant import Int8Model
    from uemda_tpu.infer.raster import raster_predict
    from uemda_tpu.models import DeeplabV2, DeeplabV2Config

    mesh = make_mesh(2)
    cfg = DeeplabV2Config.uemda_default(num_classes=6, resnet_type="resnet18")
    model = DeeplabV2(cfg)
    raster = np.random.default_rng(8).random((40, 24, 3)).astype(np.float32) * 255
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.ones((1, 16, 16, 3)), train=False
    )
    preds = np.asarray(raster_predict(
        Int8Model(model), variables, raster, (128.0,) * 3, (64.0,) * 3, mesh,
        tile=(16, 16), compute_dtype="float32", window_chunk=2,
    ))
    assert preds.shape == (40, 24) and preds.dtype == np.int32
    assert set(np.unique(preds)) <= set(range(6))
