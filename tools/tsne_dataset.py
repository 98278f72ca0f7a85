"""t-SNE feature-space visualization over dataset splits.

Rebuild of reference ``tools/tsne_dataset.py:73-304`` / ``tsne_img.py``:
sample stride-16 features (and their majority labels) from source/target
splits through a checkpointed model, embed with t-SNE and save a per-class
colored scatter — the figure used to inspect domain alignment quality.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from uemda_tpu.config import load_config
from uemda_tpu.datasets.augment import normalize
from uemda_tpu.datasets.base import SegDataset, sequential_batches
from uemda_tpu.ops.labels import downscale_label
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def sample_features(model, variables, dataset, mean, std, max_images=32,
                    samples_per_image=64, seed=0):
    """Returns (features (N, K), labels (N,)) sampled at stride 16."""
    rng = np.random.default_rng(seed)
    fwd = jax.jit(
        lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(0)},
        )[0]
    )
    feats, labels = [], []
    for indices, batch in sequential_batches(dataset, 1):
        if indices[0] >= max_images:
            break
        x = normalize(jnp.asarray(batch["image"]), mean, std)
        _, _, feat = fwd(variables, x)
        lab = np.asarray(
            downscale_label(
                jnp.asarray(batch["label"]), 16, dataset.meta.num_classes
            )
        )[0]
        f = np.asarray(feat[0], np.float32).reshape(-1, feat.shape[-1])
        l = lab.reshape(-1)
        keep = np.flatnonzero(l >= 0)
        if len(keep) == 0:
            continue
        sel = rng.choice(keep, size=min(samples_per_image, len(keep)), replace=False)
        feats.append(f[sel])
        labels.append(l[sel])
    return np.concatenate(feats), np.concatenate(labels)


def main():
    parser = argparse.ArgumentParser(description="t-SNE of deep features.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--out", type=str, default="tsne.png")
    parser.add_argument("--max-images", type=int, default=32)
    parser.add_argument("--perplexity", type=float, default=30.0)
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    variables = load_checkpoint(args.ckpt_path, variables)

    src_ds = SegDataset(cfg.meta, list(cfg.source.image_dir), list(cfg.source.mask_dir)[0])
    tgt_ds = SegDataset(cfg.meta, list(cfg.target.image_dir), list(cfg.target.mask_dir)[0])
    fs, ls = sample_features(model, variables, src_ds, cfg.source.mean,
                             cfg.source.std, args.max_images)
    ft, lt = sample_features(model, variables, tgt_ds, cfg.target.mean,
                             cfg.target.std, args.max_images)

    from sklearn.manifold import TSNE

    emb = TSNE(
        n_components=2, perplexity=args.perplexity, init="pca", random_state=0
    ).fit_transform(np.concatenate([fs, ft]))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_src = len(fs)
    colors = np.asarray(cfg.meta.palette, np.float32).reshape(-1, 3) / 255.0
    fig, ax = plt.subplots(figsize=(8, 8))
    for dom, (e, l, marker) in enumerate(
        [(emb[:n_src], ls, "o"), (emb[n_src:], lt, "^")]
    ):
        for c in range(cfg.meta.num_classes):
            sel = l == c
            if sel.any():
                ax.scatter(e[sel, 0], e[sel, 1], s=6, marker=marker,
                           color=colors[c],
                           label=f"{'S' if dom == 0 else 'T'}:{cfg.meta.class_names[c]}")
    ax.legend(fontsize=7, ncol=2)
    ax.set_title(f"t-SNE features {cfg.name} ({os.path.basename(args.ckpt_path)})")
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
