"""pseudo_selection vs a torch golden re-derivation of the reference rule
(pseudo_generation.py:59-93)."""

import numpy as np
import torch

import jax.numpy as jnp

from uemda_tpu.ops.pseudo import pseudo_selection


def _torch_pseudo_selection(mask, cutoff_top=0.8, cutoff_low=0.6, ignore_label=-1):
    mask = torch.from_numpy(mask)  # (b, c, h, w)
    bs, c, h, w = mask.shape
    mask = mask.view(bs, c, -1)
    mask_max, _ = mask.max(-1, keepdim=True)
    mask_max = mask_max * cutoff_top
    mask_max = mask_max.max(torch.tensor([cutoff_low]))
    pseudo_gt = (mask > mask_max).float()
    ambiguous = (pseudo_gt.sum(1, keepdim=True) != 1).float()
    out = pseudo_gt.argmax(dim=1, keepdim=True)
    out[ambiguous == 1] = ignore_label
    return out.view(bs, h, w).numpy()


def test_pseudo_selection_matches_reference_rule():
    rng = np.random.default_rng(42)
    logits = rng.standard_normal((2, 6, 16, 16)).astype(np.float32) * 3
    probs = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    want = _torch_pseudo_selection(probs)
    got = np.asarray(
        pseudo_selection(jnp.asarray(probs.transpose(0, 2, 3, 1)), 0.8, 0.6, -1)
    )
    np.testing.assert_array_equal(got, want)


def test_pseudo_selection_confident_pixel_kept():
    # one pixel with prob ~1.0 for class 2 must survive
    probs = np.full((1, 4, 4, 6), 1 / 6, np.float32)
    probs[0, 1, 1] = 0.01
    probs[0, 1, 1, 2] = 0.95
    got = np.asarray(pseudo_selection(jnp.asarray(probs)))
    assert got[0, 1, 1] == 2
    # uniform pixels are ambiguous or below threshold -> ignored
    assert got[0, 0, 0] == -1


def _torch_pseudo_selection1(mask, cutoff_top=0.8, cutoff_low=0.6, ignore_label=-1):
    """Golden for the alternative rule (pseudo_generation.py:24-56)."""
    mask = torch.from_numpy(mask)
    bs, c, h, w = mask.shape
    mask = mask.view(bs, c, -1)
    class_threshold = mask.max(-1, keepdim=True)[0] * cutoff_top
    min_threshold = cutoff_low * torch.ones_like(class_threshold)
    class_threshold = class_threshold.max(min_threshold).permute(0, 2, 1)
    probs, label = torch.max(mask, dim=1)
    onehot = torch.nn.functional.one_hot(label, num_classes=c)
    pixel_threshold = torch.sum(class_threshold * onehot, dim=-1)
    label[probs < pixel_threshold] = ignore_label
    return label.view(bs, h, w).numpy()


def test_pseudo_selection_threshold_matches_reference_rule():
    from uemda_tpu.ops.pseudo import pseudo_selection_threshold

    rng = np.random.default_rng(17)
    logits = rng.standard_normal((2, 6, 8, 8)).astype(np.float32) * 3
    probs = torch.softmax(torch.from_numpy(logits), dim=1).numpy()
    want = _torch_pseudo_selection1(probs)
    got = np.asarray(
        pseudo_selection_threshold(jnp.asarray(probs.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_array_equal(got, want)
