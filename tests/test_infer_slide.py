"""Sliding-window + TTA predictor vs a numpy golden of the reference loop
(tools.py:61-97 pre_slide, :132-152 tta_predict) using a stub model."""

import numpy as np

import jax.numpy as jnp

from uemda_tpu.infer.slide import make_predictor, window_grid


class StubModel:
    """Orientation- and content-sensitive deterministic 'model':
    channel c = shifted input mean + a horizontal ramp (so TTA views differ)."""

    C = 4

    def apply(self, variables, x, train=False):
        assert not train
        b, h, w, _ = x.shape
        ramp = jnp.linspace(0.0, 1.0, w)[None, None, :, None]
        base = x.mean(axis=-1, keepdims=True) + ramp
        chans = [base * (c + 1) for c in range(self.C)]
        logits = jnp.concatenate(chans, axis=-1)
        e = jnp.exp(logits - logits.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)


def _stub_np(x):
    b, h, w, _ = x.shape
    ramp = np.linspace(0.0, 1.0, w)[None, None, :, None]
    base = x.mean(-1, keepdims=True) + ramp
    logits = np.concatenate([base * (c + 1) for c in range(StubModel.C)], -1)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _golden_pre_slide(image, tile=(8, 8), tta=False):
    """Reference pre_slide semantics in numpy."""
    b, h, w, _ = image.shape
    coords = window_grid((h, w), tile)
    full = np.zeros((b, h, w, StubModel.C), np.float64)
    count = np.zeros((b, h, w, 1), np.float64)
    th, tw = tile
    for (y1, x1) in coords:
        win = image[:, y1 : y1 + th, x1 : x1 + tw]
        if tta:
            acc = 0
            for flip in (False, True):
                v = win[:, :, ::-1] if flip else win
                for k in range(4):
                    aug = np.rot90(v, k=k, axes=(1, 2))
                    out = _stub_np(aug)
                    out = np.rot90(out, k=-k, axes=(1, 2))
                    if flip:
                        out = out[:, :, ::-1]
                    acc = acc + out
            pred = acc / 8
        else:
            pred = _stub_np(win)
        full[:, y1 : y1 + th, x1 : x1 + tw] += pred
        count[:, y1 : y1 + th, x1 : x1 + tw] += 1
    return full / count


def test_window_grid_matches_reference_arithmetic():
    # 1024² with 512 tiles, ½ overlap -> 3x3 windows (tools.py:66-67)
    assert len(window_grid((1024, 1024), (512, 512))) == 9
    # degenerate single window for 512² IsprsDA tiles
    assert window_grid((512, 512), (512, 512)) == [(0, 0)]
    # non-divisible: last window clamped to the border
    g = window_grid((20, 20), (8, 8))
    assert (12, 12) in g and max(y for y, _ in g) == 12


def test_slide_predict_matches_golden():
    rng = np.random.default_rng(0)
    img = rng.random((2, 20, 20, 3)).astype(np.float32)
    fn = make_predictor(StubModel(), (8, 8), (20, 20), tta=False, compute_dtype="float32")
    got = np.asarray(fn({}, jnp.asarray(img)))
    want = _golden_pre_slide(img, (8, 8), tta=False)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_slide_tta_matches_golden():
    rng = np.random.default_rng(1)
    img = rng.random((2, 12, 12, 3)).astype(np.float32)
    fn = make_predictor(StubModel(), (8, 8), (12, 12), tta=True, compute_dtype="float32")
    got = np.asarray(fn({}, jnp.asarray(img)))
    want = _golden_pre_slide(img, (8, 8), tta=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # probabilities stay normalized after stitch + TTA mean
    np.testing.assert_allclose(got.sum(-1), np.ones((2, 12, 12)), rtol=1e-4)
