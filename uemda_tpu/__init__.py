"""uemda_tpu — TPU-native framework for uncertainty-aware domain-adaptive
remote-sensing segmentation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the UemDA reference
(StuLiu/UemDA, IEEE TGRS 2024): ResNet + dual-head DeepLab-v2/PSP segmentation,
3-stage domain adaptation (source-supervised + CORAL, prototype contrastive
alignment with multi-view pseudo-label refinement, UVEM self-training), batched
sliding-window/TTA inference, and device-resident pseudo-label mining —
designed for SPMD execution over TPU meshes rather than single-GPU loops.

Layout convention: images are NHWC, labels are (B, H, W) int32 with -1 ignore.

Quick start::

    from uemda_tpu.config import load_config
    from uemda_tpu.train.loop import build_model, init_variables
    cfg = load_config("2vaihingen")
    model = build_model(cfg)
    variables = init_variables(model, cfg)
"""

__version__ = "0.1.0"

__all__ = ["config", "datasets", "models", "ops", "alignment", "train",
           "infer", "parallel", "superpixels", "utils"]
