"""t-SNE of a single image's stride-16 features (reference ``tools/
tsne_img.py`` counterpart): pixels colored by ground-truth class, one
figure per image."""

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
from uemda_tpu.datasets.io import read_image, read_mask
from uemda_tpu.ops.labels import downscale_label
from uemda_tpu.train.checkpoints import load_checkpoint
from uemda_tpu.train.loop import build_model, init_variables
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser(description="t-SNE of one image.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--ckpt-path", type=str, required=True)
    parser.add_argument("--image-path", type=str, required=True)
    parser.add_argument("--mask-path", type=str, default=None)
    parser.add_argument("--out", type=str, default="tsne_img.png")
    args = parser.parse_args()

    cfg = load_config(args.config_path)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    variables = load_checkpoint(args.ckpt_path, variables)

    img = read_image(args.image_path).astype(np.float32)[None]
    x = normalize(jnp.asarray(img), cfg.val.mean, cfg.val.std)
    _, _, feat = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.key(0)},
    )[0]
    f = np.asarray(feat[0], np.float32).reshape(-1, feat.shape[-1])

    mask_path = args.mask_path or args.image_path.replace(
        "img_dir", "ann_dir"
    ).replace("images_png", "masks_png")
    labels = None
    if os.path.exists(mask_path):
        gt = read_mask(mask_path, cfg.meta.offset, cfg.meta.num_classes)
        labels = np.asarray(
            downscale_label(jnp.asarray(gt[None]), 16, cfg.meta.num_classes)
        )[0].reshape(-1)

    from sklearn.manifold import TSNE

    emb = TSNE(n_components=2, init="pca", random_state=0).fit_transform(f)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    colors = np.asarray(cfg.meta.palette, np.float32).reshape(-1, 3) / 255.0
    fig, ax = plt.subplots(figsize=(7, 7))
    if labels is None:
        ax.scatter(emb[:, 0], emb[:, 1], s=4)
    else:
        for c in range(cfg.meta.num_classes):
            sel = labels == c
            if sel.any():
                ax.scatter(emb[sel, 0], emb[sel, 1], s=4, color=colors[c],
                           label=cfg.meta.class_names[c])
        ax.legend(fontsize=8)
    ax.set_title(os.path.basename(args.image_path))
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(args.out)


if __name__ == "__main__":
    main()
