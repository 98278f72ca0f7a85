"""Dataset objects: file pairing + batch assembly (host side).

TPU-first split of responsibilities vs the reference ``BaseData``/``DALoader``
(``uemda/datasets/basedata.py``, ``uemda/datasets/daLoader.py``): the host
only globs, decodes (cached) and stacks raw uint8 tiles; all augmentation
(crop/flip/rot90/normalize) happens on device inside the jitted step
(``uemda_tpu.datasets.augment``). An infinite shuffled iterator replaces
ever's ``Iterator`` wrapper (``tools/train_src.py:20``).
"""

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np

from uemda_tpu.datasets.io import (
    RamCache,
    list_images,
    mask_path_for,
    read_image,
    read_mask,
    read_prob,
    read_sup,
    sup_path_for,
)
from uemda_tpu.datasets.meta import DatasetMeta


@dataclasses.dataclass
class SegDataset:
    """A split: images (+ optional hard masks, soft-prob masks, superpixels)."""

    meta: DatasetMeta
    image_dir: object  # str or list[str]
    mask_dir: object = None  # str, list[str], or None
    label_type: str = "id"  # 'id' | 'prob' | 'none'
    read_sup: bool = False
    cache: Optional[RamCache] = None

    def __post_init__(self):
        assert self.label_type in ("id", "prob", "none")
        self.image_paths = list_images(self.image_dir)
        if not self.image_paths:
            raise FileNotFoundError(f"no images under {self.image_dir}")
        mask_dirs = (
            self.mask_dir
            if isinstance(self.mask_dir, (list, tuple))
            else [self.mask_dir]
        )
        self.mask_dir_single = next((m for m in mask_dirs if m), None)
        if self.cache is None:
            self.cache = RamCache()

    def __len__(self):
        return len(self.image_paths)

    def filename(self, idx: int) -> str:
        import os

        return os.path.basename(self.image_paths[idx])

    def item(self, idx: int) -> Dict[str, np.ndarray]:
        path = self.image_paths[idx]
        # images ship as the decoded uint8 — 4x less host->device transfer
        # than the reference's f32 tensors (daLoader collate); the cast to
        # f32 happens on device in augment.normalize (exact for 0-255)
        out: Dict[str, np.ndarray] = {"image": self.cache.get(path, read_image)}
        if self.label_type == "id" and self.mask_dir_single:
            mp = mask_path_for(path, self.mask_dir_single)
            out["label"] = self.cache.get(
                mp,
                lambda p: read_mask(
                    p, self.meta.offset, self.meta.num_classes, self.meta.ignore_label
                ),
            )
        elif self.label_type == "prob" and self.mask_dir_single:
            mp = mask_path_for(path, self.mask_dir_single)
            base = mp.rsplit(".", 1)[0] if mp.endswith((".npy", ".pt")) else mp
            out["prob"] = self.cache.get(base, read_prob)
        if self.read_sup:
            out["sup"] = self.cache.get(sup_path_for(path), read_sup)
        return out

    def batch(self, indices) -> Dict[str, np.ndarray]:
        items = [self.item(int(i)) for i in indices]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _host_crop_batch(dataset, indices, u, crop_hw) -> Dict[str, np.ndarray]:
    """Assemble a batch with each sample's spatial arrays pre-cropped on the
    host to ``crop_hw`` at offsets mapped from uniforms ``u`` (B, 2).

    The slice is a numpy view of the RamCache'd decode; ``np.stack`` makes
    the only copy. Samples must be at least crop-sized — the device path
    has the same precondition (its dynamic_slice cannot grow an array), so
    this raises the error early with the offending file named."""
    ch, cw = crop_hw
    items = []
    for j, i in enumerate(indices):
        it = dataset.item(int(i))
        h, w = it["image"].shape[:2]
        if h < ch or w < cw:
            raise ValueError(
                f"--host-crop: sample {dataset.filename(int(i))} is "
                f"{h}x{w}, smaller than the crop {ch}x{cw}; tiles must be "
                f">= the crop (the device crop has the same precondition)"
            )
        # floor(u * (range + 1)), clamped — the uniform-offset law the
        # device crop draws from jax.random.randint(0, range + 1)
        top = min(int(u[j, 0] * (h - ch + 1)), h - ch)
        left = min(int(u[j, 1] * (w - cw + 1)), w - cw)
        items.append(
            {k: v[top : top + ch, left : left + cw] for k, v in it.items()}
        )
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def infinite_batches(
    dataset: SegDataset,
    batch_size: int,
    seed: int = 0,
    drop_last: bool = True,
    skip_batches: int = 0,
    process_shard=None,
    host_crop=None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled epoch-cycling batch iterator (DALoader semantics:
    RandomSampler + drop_last=True, ``daLoader.py:38-55``).

    ``skip_batches`` fast-forwards the shuffle stream without decoding —
    a resumed run (``--resume``) replays the exact batch sequence an
    uninterrupted run would have seen from that step.

    ``process_shard=(start, size)``: multi-host data sharding — every
    process draws the SAME global shuffle stream (same seed) but decodes
    only rows [start, start+size) of each global batch, so the global batch
    sequence is bit-identical to a single-process run
    (parallel/multihost.local_batch_slice).

    ``host_crop=(ch, cw)``: pre-crop every sample on the host before it
    ships, instead of shipping the full tile and cropping on device — at
    the LoveDA geometry (1024² tiles → 512² crops) this cuts host→device
    batch bytes 4× (16× for the stage-3 fp16 prob labels). The jitted
    step's device crop degenerates to the identity on an already-crop-sized
    batch, so no step change is needed; flips/rot90 still run on device.
    Offsets are drawn per (seed, batch index, row) — stateless, so resume
    fast-forward and multi-host row slicing replay identical crops (rows
    are drawn for the GLOBAL batch before ``process_shard`` slicing)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    skipped = 0
    b_index = 0
    while True:
        perm = rng.permutation(n)
        stop = (n // batch_size) * batch_size if drop_last else n
        for i in range(0, max(stop, batch_size), batch_size):
            this_b, b_index = b_index, b_index + 1
            if skipped < skip_batches:
                skipped += 1
                continue
            idx = perm[i : i + batch_size]
            if len(idx) < batch_size:
                idx = np.concatenate([idx, perm[: batch_size - len(idx)]])
            u = (
                np.random.default_rng((seed, 9157, this_b)).random((len(idx), 2))
                if host_crop is not None
                else None
            )
            if process_shard is not None:
                start, size = process_shard
                idx = idx[start : start + size]
                if u is not None:
                    u = u[start : start + size]
            if u is None:
                yield dataset.batch(idx)
            else:
                yield _host_crop_batch(dataset, idx, u, host_crop)


def sequential_batches(dataset: SegDataset, batch_size: int = 1,
                       decode_workers: int = 1):
    """Eval-order iterator (SequentialSampler, batch 1 in the reference).

    ``decode_workers > 1`` decodes the items of each batch on a thread pool
    — PNG/TIFF decompression releases the GIL, so on a multi-core serving
    host the decode stops serializing the pipeline (this 1-core dev host
    shows no gain; the knob exists for deployment, VERDICT r2 item 7)."""
    ex = None
    if decode_workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(decode_workers)
    try:
        for i in range(0, len(dataset), batch_size):
            idx = list(range(i, min(i + batch_size, len(dataset))))
            if ex is None:
                yield idx, dataset.batch(idx)
            else:
                items = list(ex.map(lambda j: dataset.item(int(j)), idx))
                yield idx, {
                    k: np.stack([it[k] for it in items]) for k in items[0]
                }
    finally:
        if ex is not None:
            ex.shutdown(wait=False)


def kfold_indices(n: int, k: int = 10, fold: int = 0, seed: int = 2333):
    """Deterministic k-fold split (train_idx, val_idx) — the equivalent of
    ever's CrossValSamplerGenerator behind DALoader's CV config
    (``daLoader.py:38-48``; disabled in all shipped configs via i=-1)."""
    if fold < 0:
        return np.arange(n), np.arange(0)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, k)
    val = folds[fold % k]
    train = np.concatenate([f for j, f in enumerate(folds) if j != fold % k])
    return train, val
