"""Dataset evaluation: batched slide inference + on-device confusion matrix.

Rebuilds ``evaluate`` (reference ``uemda/utils/eval.py:14-56``): the reference
walks the val split at batch 1, pulls predictions to CPU per image and feeds
a numpy metric. Here images are processed in device-sized batches through the
jitted slide predictor and the (C, C) confusion matrix accumulates on device;
only the final matrix crosses to host. IsprsDA drops class 0 from means
(``eval.py:16-17``).
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.base import SegDataset, sequential_batches
from uemda_tpu.datasets.prefetch import prefetch
from uemda_tpu.infer.slide import make_predictor
from uemda_tpu.ops.metrics import PixelMetricSummary, confusion_matrix
from uemda_tpu.utils.viz import VisualizeSegmm


def device_batches(dataset, batch_size, mesh=None, depth: int = 2,
                   decode_workers: int = 1):
    """Stream ``(indices, images_on_device, n_valid, label_np)`` with decode,
    batch-padding and the host->device copy done in a background thread so
    transfer overlaps the previous batch's compute (double buffering). The
    reference instead blocks on a synchronous ``.cuda()`` per batch
    (``uemda/utils/eval.py:40``).

    With a mesh the batch is rounded up to a multiple of the device count
    (the shared invariant for sharding the leading axis).
    ``decode_workers``: per-batch thread-pool decode (multi-core hosts)."""
    import jax

    if mesh is not None:
        n_dev = int(mesh.devices.size)
        batch_size = max(batch_size, n_dev)
        batch_size -= batch_size % n_dev

    def gen():
        for indices, batch in sequential_batches(
            dataset, batch_size, decode_workers=decode_workers
        ):
            # keep the decoded uint8 — normalize casts to f32 on device,
            # so the transfer ships 4x fewer bytes
            images = np.asarray(batch["image"])
            n = images.shape[0]
            if n < batch_size:
                pad = batch_size - n
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
                )
            if mesh is not None:
                from uemda_tpu.parallel import shard_batch

                images = shard_batch(mesh, images)
            else:
                images = jax.device_put(images)
            yield indices, images, n, batch.get("label")

    return prefetch(gen(), depth=depth)


def collect_calib_batches(dataset, batch_size, mean, std, n,
                          tile: Optional[Tuple[int, int]] = None):
    """First ``n`` normalized batches for int8 activation-scale calibration
    (``infer.fastpath.calibrate_act_scales``), cropped to ``tile``.

    Serving always runs tile-sized forwards through the slide predictor, so
    calibration must see the same shapes — a monolithic whole-image forward
    would blow HBM on big rasters and reject odd sizes. Iterates the plain
    sequential reader (not ``device_batches``: breaking out of its prefetch
    generator would strand the worker thread holding device batches)."""
    if n <= 0:
        return []
    import jax

    out = []
    for _, batch in sequential_batches(dataset, batch_size):
        images = np.asarray(batch["image"])  # uint8; normalize casts on device
        if tile is not None:
            th = min(tile[0], images.shape[1]) // 2 * 2
            tw = min(tile[1], images.shape[2]) // 2 * 2
            images = images[:, :th, :tw]
        out.append(normalize(jax.device_put(images), mean, std))
        if len(out) >= n:
            break
    return out


def evaluate_dataset(
    model,
    variables,
    dataset: SegDataset,
    mean,
    std,
    tile: Tuple[int, int] = (512, 512),
    tta: bool = False,
    batch_size: int = 8,
    vis_dir: Optional[str] = None,
    compute_dtype: str = "bfloat16",
    logger=None,
    mesh=None,
    decode_workers: int = 1,
):
    """``mesh``: optional data mesh — images shard across chips, variables
    replicate; XLA partitions the whole slide+TTA program (the multi-chip
    eval the single-GPU reference cannot express).
    ``decode_workers``: host-side decode thread pool (multi-core hosts)."""
    meta = dataset.meta
    if mesh is not None:
        from uemda_tpu.parallel import shard_pytree_replicated

        variables = shard_pytree_replicated(mesh, variables)
    hw = None
    predictor = None
    cm = jnp.zeros((meta.num_classes, meta.num_classes), jnp.int32)
    viz = VisualizeSegmm(vis_dir, meta.palette) if vis_dir else None

    for indices, images, n, label_np in device_batches(
        dataset, batch_size, mesh, decode_workers=decode_workers
    ):
        if predictor is None or images.shape[1:3] != hw:
            hw = images.shape[1:3]
            predictor = make_predictor(
                model, tile, hw, tta=tta, compute_dtype=compute_dtype
            )
        # eval transforms = normalize only (configs EVAL pipelines)
        images = normalize(images, mean, std)
        probs = predictor(variables, images)[:n]
        pred = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        label = jnp.asarray(label_np)
        cm = cm + confusion_matrix(label, pred, meta.num_classes)
        if viz is not None:
            pred_host = np.asarray(pred)
            for j, idx in enumerate(indices):
                fname = dataset.filename(idx).replace("tif", "png")
                viz(pred_host[j], fname)

    summary = PixelMetricSummary(
        meta.num_classes,
        class_names=meta.class_names,
        ignore_labels=list(meta.eval_ignore_labels),
    ).summarize(np.asarray(cm))
    if logger is not None:
        logger.info("\n" + PixelMetricSummary(
            meta.num_classes,
            class_names=meta.class_names,
            ignore_labels=list(meta.eval_ignore_labels),
        ).format_table(summary))
    return summary, summary["miou"]
