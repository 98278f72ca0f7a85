"""Confusion-matrix metrics vs sklearn-free numpy golden values."""

import numpy as np

import jax.numpy as jnp

from uemda_tpu.ops.metrics import (
    PixelMetricSummary,
    confusion_matrix,
    iou_per_class,
)


def test_confusion_matrix_counts_and_ignore():
    y_true = np.array([0, 0, 1, 2, -1, 1], np.int32)
    y_pred = np.array([0, 1, 1, 2, 0, 0], np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 3))
    want = np.array([[1, 1, 0], [1, 1, 0], [0, 0, 1]])
    np.testing.assert_array_equal(cm, want)


def test_iou_and_summary_with_ignored_class():
    cm = np.array([[5, 1, 0], [2, 8, 0], [0, 0, 4]], np.float64)
    iou = iou_per_class(cm)
    np.testing.assert_allclose(iou, [5 / 8, 8 / 11, 1.0])
    summ = PixelMetricSummary(3, ["bg", "a", "b"], ignore_labels=[0]).summarize(cm)
    assert summ["class_names"] == ["a", "b"]
    np.testing.assert_allclose(summ["miou"], np.round((8 / 11 + 1.0) / 2, 5))
    assert "mean" in PixelMetricSummary(3).format_table(
        PixelMetricSummary(3).summarize(cm)
    )
