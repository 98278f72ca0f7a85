"""Port torch checkpoints into uemda_tpu flax variables.

Two checkpoint families are supported:

1. torchvision ImageNet ResNet state dicts (keys ``conv1.weight``,
   ``layer1.0.conv1.weight``, ...) — the weights the reference downloads at
   model build (``uemda/_resnets.py:230-238``). Ported into the encoder
   subtree for pretrained initialization.
2. Full reference Deeplabv2 state dicts (keys ``encoder.resnet.*``,
   ``layer5.*``/``layer6.*``, ``cls_pred.*``) as saved by the reference
   trainers (``tools/train_src.py:152-158``) — ported into the whole model
   for cross-framework mIoU parity evaluation.

Conventions: torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O);
torch BN weight/bias -> flax scale/bias params, running_mean/var ->
batch_stats. Grouped (ResNeXt) convs keep the same transpose — flax expects
(kh, kw, in/groups, out) which matches torch's (out, in/groups, kh, kw).

This module is torch-free at import time: state dicts are accepted as
``{name: numpy array}`` (use ``load_torch_state_dict`` to read a .pth).
"""

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _bn_entries(flat_prefix: Tuple[str, ...], torch_prefix: str, sd, params, stats):
    """Map one torch BN module into params(scale,bias)+batch_stats(mean,var)."""
    _set(params, flat_prefix + ("bn", "scale"), sd[torch_prefix + ".weight"])
    _set(params, flat_prefix + ("bn", "bias"), sd[torch_prefix + ".bias"])
    _set(stats, flat_prefix + ("bn", "mean"), sd[torch_prefix + ".running_mean"])
    _set(stats, flat_prefix + ("bn", "var"), sd[torch_prefix + ".running_var"])


_BLOCK_CONV = re.compile(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$")
_BLOCK_BN = re.compile(r"^layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)$")
_BLOCK_DS = re.compile(r"^layer(\d)\.(\d+)\.downsample\.(0|1)\.(weight|bias|running_mean|running_var)$")


def port_resnet_backbone(
    sd: Dict[str, np.ndarray], deep_stem: bool = False
) -> Tuple[Dict, Dict]:
    """torchvision-style resnet state dict -> (params, batch_stats) trees for
    ``ResNetEncoder`` (without the 'encoder' wrapper level)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if deep_stem:
        # v1c stems are stored as stem.{0,3,6} convs and stem.{1,4,7} bns
        for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)]):
            _set(params, (f"stem_conv{i+1}", "kernel"), _conv(sd[f"stem.{ci}.weight"]))
            _bn_entries((f"stem_bn{i+1}",), f"stem.{bi}", sd, params, stats)
    else:
        _set(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
        _bn_entries(("bn1",), "bn1", sd, params, stats)

    for key, val in sd.items():
        m = _BLOCK_CONV.match(key)
        if m:
            l, b, k = m.groups()
            _set(
                params,
                (f"layer{l}", f"block{b}", f"conv{k}", "kernel"),
                _conv(val),
            )
            continue
        m = _BLOCK_BN.match(key)
        if m and key.endswith(".weight"):
            l, b, k, _ = m.groups()
            _bn_entries(
                (f"layer{l}", f"block{b}", f"bn{k}"),
                f"layer{l}.{b}.bn{k}",
                sd,
                params,
                stats,
            )
            continue
        m = _BLOCK_DS.match(key)
        if m:
            l, b, idx, leaf = m.groups()
            if idx == "0":
                _set(
                    params,
                    (f"layer{l}", f"block{b}", "ds_conv", "kernel"),
                    _conv(val),
                )
            elif leaf == "weight":
                _bn_entries(
                    (f"layer{l}", f"block{b}", "ds_bn"),
                    f"layer{l}.{b}.downsample.1",
                    sd,
                    params,
                    stats,
                )
    return params, stats


def _port_ppm_head(sd, torch_prefix: str, pool_scales=(1, 2, 3, 6)):
    """Reference PPMBilinear module names (Encoder.py:8-41):
    ppm.{i}.1 conv / ppm.{i}.2 bn; conv_last.0 conv / .1 bn / .4 classifier."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, scale in enumerate(pool_scales):
        _set(
            params,
            (f"ppm{scale}_conv", "kernel"),
            _conv(sd[f"{torch_prefix}.ppm.{i}.1.weight"]),
        )
        _bn_entries((f"ppm{scale}_bn",), f"{torch_prefix}.ppm.{i}.2", sd, params, stats)
    _set(params, ("last_conv", "kernel"), _conv(sd[f"{torch_prefix}.conv_last.0.weight"]))
    _bn_entries(("last_bn",), f"{torch_prefix}.conv_last.1", sd, params, stats)
    _set(params, ("classifier", "kernel"), _conv(sd[f"{torch_prefix}.conv_last.4.weight"]))
    _set(params, ("classifier", "bias"), sd[f"{torch_prefix}.conv_last.4.bias"])
    return params, stats


def _port_aspp_head(sd, torch_prefix: str, dilations=(6, 12, 18, 24)):
    params: Dict[str, Any] = {}
    for i, d in enumerate(dilations):
        _set(
            params,
            (f"aspp_d{d}", "kernel"),
            _conv(sd[f"{torch_prefix}.conv2d_list.{i}.weight"]),
        )
        _set(params, (f"aspp_d{d}", "bias"), sd[f"{torch_prefix}.conv2d_list.{i}.bias"])
    return params, {}


def port_deeplabv2(
    sd: Dict[str, np.ndarray],
    use_ppm: bool = True,
    multi_layer: bool = True,
    deep_stem: bool = False,
) -> Dict[str, Dict]:
    """Full reference Deeplabv2 state dict -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    enc_sd = {
        k[len("encoder.resnet."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.resnet.")
    }
    enc_params, enc_stats = port_resnet_backbone(enc_sd, deep_stem=deep_stem)
    params: Dict[str, Any] = {"encoder": enc_params}
    stats: Dict[str, Any] = {"encoder": enc_stats}

    head_names = ("layer5", "layer6") if multi_layer else ("cls_pred",)
    for hn in head_names:
        if not any(k.startswith(hn + ".") for k in sd):
            continue
        if use_ppm:
            hp, hs = _port_ppm_head(sd, hn)
        else:
            hp, hs = _port_aspp_head(sd, hn)
        params[hn] = hp
        if hs:
            stats[hn] = hs
    return {"params": params, "batch_stats": stats}


def _conv_back(w: np.ndarray) -> np.ndarray:
    """flax kernel (kh, kw, I, O) -> torch conv weight (O, I, kh, kw)."""
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def _bn_back(out: Dict[str, np.ndarray], torch_prefix: str, p: Dict, s: Dict):
    out[torch_prefix + ".weight"] = np.asarray(p["bn"]["scale"], np.float32)
    out[torch_prefix + ".bias"] = np.asarray(p["bn"]["bias"], np.float32)
    out[torch_prefix + ".running_mean"] = np.asarray(s["bn"]["mean"], np.float32)
    out[torch_prefix + ".running_var"] = np.asarray(s["bn"]["var"], np.float32)
    out[torch_prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet_backbone(
    enc_params: Dict, enc_stats: Dict, deep_stem: bool = False
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_resnet_backbone`: encoder (params, batch_stats)
    trees -> torchvision-style state dict names."""
    out: Dict[str, np.ndarray] = {}
    if deep_stem:
        for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)]):
            out[f"stem.{ci}.weight"] = _conv_back(
                enc_params[f"stem_conv{i + 1}"]["kernel"]
            )
            _bn_back(out, f"stem.{bi}", enc_params[f"stem_bn{i + 1}"],
                     enc_stats[f"stem_bn{i + 1}"])
    else:
        out["conv1.weight"] = _conv_back(enc_params["conv1"]["kernel"])
        _bn_back(out, "bn1", enc_params["bn1"], enc_stats["bn1"])

    for lname, ltree in enc_params.items():
        if not lname.startswith("layer"):
            continue
        for bname, btree in ltree.items():
            b = bname[len("block"):]
            tp = f"{lname}.{b}"
            for sub, stree in btree.items():
                if sub.startswith("conv"):
                    out[f"{tp}.{sub}.weight"] = _conv_back(stree["kernel"])
                elif sub.startswith("bn"):
                    _bn_back(out, f"{tp}.{sub}", stree,
                             enc_stats[lname][bname][sub])
                elif sub == "ds_conv":
                    out[f"{tp}.downsample.0.weight"] = _conv_back(stree["kernel"])
                elif sub == "ds_bn":
                    _bn_back(out, f"{tp}.downsample.1", stree,
                             enc_stats[lname][bname][sub])
    return out


def export_deeplabv2(
    variables: Dict,
    use_ppm: bool = True,
    deep_stem: bool = False,
    pool_scales=(1, 2, 3, 6),
    dilations=(6, 12, 18, 24),
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`port_deeplabv2`: model variables -> a state dict in
    the reference's module names (``encoder.resnet.*``, ``layer5/layer6`` or
    ``cls_pred``), loadable by the reference's Deeplabv2 for two-way
    migration. Round-trip ``port_deeplabv2(export_deeplabv2(v)) == v``."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for k, v in export_resnet_backbone(
        params["encoder"], stats.get("encoder", {}), deep_stem=deep_stem
    ).items():
        out["encoder.resnet." + k] = v

    for hn in ("layer5", "layer6", "cls_pred"):
        if hn not in params:
            continue
        hp, hs = params[hn], stats.get(hn, {})
        if use_ppm:
            for i, scale in enumerate(pool_scales):
                out[f"{hn}.ppm.{i}.1.weight"] = _conv_back(
                    hp[f"ppm{scale}_conv"]["kernel"]
                )
                _bn_back(out, f"{hn}.ppm.{i}.2", hp[f"ppm{scale}_bn"],
                         hs[f"ppm{scale}_bn"])
            out[f"{hn}.conv_last.0.weight"] = _conv_back(hp["last_conv"]["kernel"])
            _bn_back(out, f"{hn}.conv_last.1", hp["last_bn"], hs["last_bn"])
            out[f"{hn}.conv_last.4.weight"] = _conv_back(hp["classifier"]["kernel"])
            out[f"{hn}.conv_last.4.bias"] = np.asarray(
                hp["classifier"]["bias"], np.float32
            )
        else:
            for i, d in enumerate(dilations):
                out[f"{hn}.conv2d_list.{i}.weight"] = _conv_back(
                    hp[f"aspp_d{d}"]["kernel"]
                )
                out[f"{hn}.conv2d_list.{i}.bias"] = np.asarray(
                    hp[f"aspp_d{d}"]["bias"], np.float32
                )
    return out


def save_torch_state_dict(path: str, sd: Dict[str, np.ndarray]) -> str:
    import torch

    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()}, path)
    return path


def port_imagenet_backbone(
    sd: Dict[str, np.ndarray], variables: Dict, deep_stem: bool = False
) -> Dict:
    """Merge torchvision ImageNet resnet weights into freshly-initialized
    model variables (encoder subtree only; heads keep their init)."""
    import jax

    enc_params, enc_stats = port_resnet_backbone(sd, deep_stem=deep_stem)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                merge(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = np.asarray(v, dtype=np.float32)

    import flax

    new_vars = flax.core.unfreeze(new_vars)
    merge(new_vars["params"]["encoder"], enc_params)
    merge(new_vars["batch_stats"]["encoder"], enc_stats)
    return new_vars
