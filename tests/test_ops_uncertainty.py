"""UVEM weight curve vs an independent torch re-derivation of
balance.py:396-423, plus analytic spot values."""

import numpy as np
import torch

import jax.numpy as jnp

from uemda_tpu.ops.uncertainty import pixel_entropy, uvem_weight


def _torch_uvem_weight(u, m, threshold, gamma):
    unce_ = torch.from_numpy(u).clone()
    weight_left_ = torch.ones_like(unce_)
    if m > 0:
        weight_left = torch.where((unce_ <= m) & (unce_ >= 0), unce_, weight_left_)
        weight_left = (-1 / (m**2)) * (weight_left - m) ** 2 + 1
        weight_left = torch.clamp(weight_left, min=0.0, max=1.0)
        weight_left_ = weight_left ** (1.0 / gamma)
    weight_right_ = torch.zeros_like(unce_)
    if m < threshold:
        weight_right = torch.zeros_like(unce_)
        weight_right = torch.where(
            (unce_ > m) & (unce_ <= threshold), unce_, weight_right
        )
        weight_right = (-1 / ((threshold - m) ** 2)) * (weight_right - m) ** 2 + 1
        weight_right = torch.clamp(weight_right, min=0.0, max=1.0)
        weight_right_ = weight_right ** (1.0 / gamma)
    weight = torch.where(unce_ <= m, weight_left_, weight_right_)
    weight = torch.where(unce_ >= threshold, torch.zeros_like(unce_), weight)
    return weight.numpy()


def test_uvem_weight_matches_reference_curve():
    u = np.linspace(0.0, 1.8, 181).astype(np.float32)
    for m, t, g in [(0.2, 0.7, 4.0), (0.0, 0.7, 1.0), (0.5, 0.7, 8.0), (0.2, 0.7, 1.0)]:
        want = _torch_uvem_weight(u, m, t, g)
        got = np.asarray(uvem_weight(jnp.asarray(u), m, t, g))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_uvem_weight_analytic_values():
    # peak at u = m is exactly 1; zero at u >= threshold
    got = np.asarray(uvem_weight(jnp.asarray([0.2, 0.7, 0.9]), 0.2, 0.7, 4.0))
    np.testing.assert_allclose(got, [1.0, 0.0, 0.0], atol=1e-6)


def test_pixel_entropy():
    p = np.array([[0.5, 0.5], [1.0, 0.0]], np.float32)
    got = np.asarray(pixel_entropy(jnp.asarray(p)))
    np.testing.assert_allclose(got, [np.log(2.0), 0.0], rtol=1e-6, atol=1e-6)
