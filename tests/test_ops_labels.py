"""Label ops: one-hot-with-ignore and majority downscale vs torch golden."""

import numpy as np
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from uemda_tpu.ops.labels import downscale_label, index_to_onehot


def _torch_downscale(label, scale, n_classes, ignore_label=-1, min_ratio=0.75):
    """Golden implementation of DownscaleLabel semantics (alignment.py:484-509)."""
    label = torch.from_numpy(label).clone()
    label[label == ignore_label] = n_classes
    out = tnf.one_hot(label.long(), num_classes=n_classes + 1).permute(0, 3, 1, 2)
    out = tnf.avg_pool2d(out.float(), kernel_size=scale)
    max_ratio, out = torch.max(out, dim=1, keepdim=True)
    out[out == n_classes] = ignore_label
    out[max_ratio < min_ratio] = ignore_label
    return out.squeeze(1).numpy()


def test_downscale_label_matches_torch():
    rng = np.random.default_rng(0)
    label = rng.integers(-1, 6, size=(2, 64, 64)).astype(np.int32)
    # inject large uniform patches so some cells pass the 0.75 ratio test
    label[0, :32, :32] = 3
    label[1, 16:48, 16:48] = -1
    got = np.asarray(downscale_label(jnp.asarray(label), 16, 6, -1, 0.75))
    want = _torch_downscale(label, 16, 6)
    np.testing.assert_array_equal(got, want)


def test_index_to_onehot_ignore_rows_are_zero():
    label = np.array([[[0, 1], [-1, 5]]], dtype=np.int32)
    oh = np.asarray(index_to_onehot(jnp.asarray(label), 6))
    assert oh.shape == (4, 6)
    np.testing.assert_array_equal(oh[0], np.eye(6)[0])
    np.testing.assert_array_equal(oh[1], np.eye(6)[1])
    np.testing.assert_array_equal(oh[2], np.zeros(6))
    np.testing.assert_array_equal(oh[3], np.eye(6)[5])
