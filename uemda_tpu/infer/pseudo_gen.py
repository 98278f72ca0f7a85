"""Batched pseudo-label generation over the target split.

Rebuilds ``gener_target_pseudo`` (reference
``uemda/gast/pseudo_generation.py:96-155``): the reference loops the target
set at batch 1, runs slide + 8 sequential TTA forwards per window and writes
a torch ``.pt`` per image. Here the whole split streams through the jitted
batched slide+TTA predictor; probabilities are returned in host RAM (fp16)
and/or written as ``.npy`` files for the stage-3 prob-label dataset. A color
visualization of the mined hard labels can be dumped like the reference's
``_color`` dir.
"""

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.base import SegDataset
from uemda_tpu.datasets.io import save_prob
from uemda_tpu.infer.evaluate import device_batches
from uemda_tpu.infer.slide import make_predictor
from uemda_tpu.ops.pseudo import pseudo_selection
from uemda_tpu.utils.viz import VisualizeSegmm


def generate_pseudo_labels(
    model, variables, dataset: SegDataset, mean, std, **kwargs
) -> Dict[str, np.ndarray]:
    """Multi-host-aware entry — see :func:`_generate_pseudo_labels_local`
    for the sweep itself and all keyword arguments.

    Multi-host runs: the sweep executes on PROCESS 0 ONLY (device_batches +
    the host-side prob readback are process-local; a cross-host mesh would
    assemble duplicated batches and yield non-addressable outputs), with a
    barrier so every process sees the written labels (shared filesystem)
    before the stage-3 loader starts. The release barrier runs in a
    ``finally`` so a sweep failure surfaces as the real exception on every
    process instead of a distributed heartbeat timeout."""
    import jax as _jax

    if _jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from uemda_tpu.parallel.multihost import fetch_local, is_main_process

        if not is_main_process():
            multihost_utils.sync_global_devices("uemda_pseudo_gen")
            return {}
        try:
            kwargs["mesh"] = None  # process-local sweep on the local chips
            return _generate_pseudo_labels_local(
                model, fetch_local(variables), dataset, mean, std, **kwargs
            )
        finally:
            # release the non-main processes waiting at the entry barrier
            multihost_utils.sync_global_devices("uemda_pseudo_gen")
    return _generate_pseudo_labels_local(
        model, variables, dataset, mean, std, **kwargs
    )


def _generate_pseudo_labels_local(
    model,
    variables,
    dataset: SegDataset,
    mean,
    std,
    out_dir: Optional[str] = None,
    tile: Tuple[int, int] = (512, 512),
    tta: bool = True,
    batch_size: int = 4,
    cutoff_top: float = 0.8,
    cutoff_low: float = 0.6,
    color_dir: Optional[str] = None,
    keep_in_memory: bool = True,
    compute_dtype: str = "bfloat16",
    logger=None,
    mesh=None,
    fastpath: bool = False,
) -> Dict[str, np.ndarray]:
    """Returns {filename: (H, W, C) fp16 probs} (if keep_in_memory) and/or
    writes ``<out_dir>/<filename>.npy`` per image.

    With ``mesh``, the batched slide+TTA pass shards images across chips —
    the in-memory multi-chip replacement for the reference's per-image loop
    + disk round-trip (pseudo_generation.py:96-155).

    ``fastpath`` folds the variables into the serving fast path
    (infer/fastpath.py, exact math) for the sweep — worth it because this
    pass runs slide + 8 TTA views over the full target split; logs and
    falls back to the standard apply when the fold is unusable (odd tile
    sizes, unexpected checkpoint structure)."""
    meta = dataset.meta
    if fastpath:
        try:
            if tile[0] % 2 or tile[1] % 2:
                # serving_forward's space-to-depth stem would reject the
                # odd tile at trace time, deep inside the jitted predictor —
                # fail here so the fallback actually runs
                raise ValueError(f"odd tile size {tile} not fastpath-able")
            from uemda_tpu.infer.fastpath import build_fastpath

            model, variables = build_fastpath(
                model, variables, dtype=jnp.dtype(compute_dtype)
            )
        except Exception as e:  # noqa: BLE001 — any unusable checkpoint
            # structure (TypeError/AttributeError/IndexError from a non-
            # DeeplabV2 params tree) must fall back, not crash the sweep
            if logger is not None:
                logger.info(f"fastpath unavailable ({e!r}); using standard apply")
    if mesh is not None:
        from uemda_tpu.parallel import shard_pytree_replicated

        variables = shard_pytree_replicated(mesh, variables)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    viz = VisualizeSegmm(color_dir, meta.palette) if color_dir else None
    predictor = None
    hw = None
    result: Dict[str, np.ndarray] = {}

    for indices, images, n, _ in device_batches(dataset, batch_size, mesh):
        if predictor is None or images.shape[1:3] != hw:
            hw = images.shape[1:3]
            predictor = make_predictor(
                model, tile, hw, tta=tta, compute_dtype=compute_dtype
            )
        images = normalize(images, mean, std)
        probs = predictor(variables, images)[:n]  # (n, H, W, C) f32
        hard = None
        if viz is not None:
            hard = np.asarray(
                pseudo_selection(probs, cutoff_top, cutoff_low, meta.ignore_label)
            )
        probs_host = np.asarray(probs, dtype=np.float16)
        for j, idx in enumerate(indices):
            fname = dataset.filename(idx)
            if keep_in_memory:
                result[fname] = probs_host[j]
            if out_dir:
                save_prob(os.path.join(out_dir, fname), probs_host[j])
            if viz is not None:
                viz(hard[j], fname.replace(".tif", ".png"))
    if logger is not None:
        logger.info(
            f"pseudo labels generated for {len(dataset)} images"
            + (f" -> {out_dir}" if out_dir else " (in memory)")
        )
    return result
