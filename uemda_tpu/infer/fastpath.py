"""Serving fast path: an exact-math restructured eval forward.

The standard eval forward (``DeeplabV2.apply(train=False)``, rebuilt from
``uemda/models/Encoder.py:129-155``) leaves ~45% of the MXU idle on a v5e
(XProf trace, docs/PERF_NOTES.md). This module rebuilds the SAME function —
bit-for-bit in f32 up to float reassociation — as a folded, restructured
program for inference:

* **BN folding** — eval-mode BatchNorm is an affine map from running
  statistics; it folds into the preceding conv's weights + a bias
  (w' = w * g/sqrt(v+eps), b' = b0 - m * g/sqrt(v+eps)), removing every BN
  elementwise pass and f32 cast round-trip from the graph.
* **Space-to-depth stem** — the 7x7/s2 conv on 3 input channels wastes MXU
  lanes; with a 2x2 space-to-depth the same map is a 4x4/s1 conv on 12
  channels (weights re-indexed: k2[qy,qx,(ry*2+rx)*C+c,o] = k[2qy+ry+3-?,..],
  exact because every input tap 2o+d with d in [-3,3] decomposes uniquely as
  2(o+q)+r).
* **Fused dual head** — both PPM heads consume the same ``feat``; their
  4096-channel concat inputs are never materialized. The 3x3 concat conv
  splits (exactly) into conv(feat)·W_feat summed with conv(pooled-branch
  concat)·W_pool, with the two heads' W_feat stacked into one 2048->1024
  GEMM so feat is read once.
* **Low-rank pooled branch** — the pooled-branch conv is further
  restructured through the upsample's separable linear map: tap GEMMs on
  the tiny (sc, sc) pooled maps followed by shifted separable upsample
  matmuls (:func:`_ppm_pooled_heads`), eliminating the full-resolution
  pooled-branch 3x3 convs, all materialized upsampled maps and the
  2048-channel concats.
* **Instance norm without f32 materialization** — statistics accumulate in
  f32 inside the reduction; the activation tensor stays in compute dtype.
* **Space-to-batch dilated stage** (optional) — blocks 1+ of a dilate-2
  stage (layer4 at OS16) are phase-local: one space-to-batch at block-0
  output turns every dilated 3x3 into a dense 3x3 on a 4x-batch of half-res
  phases, then one batch-to-space before the heads.

Supports every DeeplabV2 config branch: Bottleneck/BasicBlock ResNets
(incl. grouped ResNeXt and v1c deep stems), OS 8/16/32, PPM or ASPP
heads in dual / single-head (cls_pred) / cascade (c4+c5) arrangements,
optional instance norm. Heads sharing an input feature map are built as a
"group" whose shared-input convs stack so the feature map is read once.

Reference parity surface: eval forward ``Encoder.py:144-155`` (averaged
softmax of twin heads upsampled with align_corners=True).
"""

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uemda_tpu.models.deeplabv2 import DeeplabV2, instance_norm
from uemda_tpu.models.resnet import (
    RESNET_SPECS,
    BasicBlock,
    _max_pool_3x3_s2,
    stage_plan,
)
from uemda_tpu.ops.resize import (
    _interp_matrix,
    adaptive_avg_pool_multi,
    resize_bilinear,
)

DIMS = ("NHWC", "HWIO", "NHWC")


@functools.lru_cache(maxsize=128)
def _shifted_interp_cat(in_size: int, out_size: int) -> np.ndarray:
    """(out, 3*in) matrix stacking the three conv-tap-shifted row blocks of
    the align_corners=False bilinear upsample matrix M (out, in):
    ``U[o, t*in + i] = M[o + t - 1, i]`` and zero where ``o + t - 1`` falls
    outside — exactly the 3x3 conv's SAME zero padding. Lets
    ``Conv3x3(Upsample(z))`` run as tap GEMMs on the tiny pooled map plus
    two separable matmuls (:func:`_ppm_pooled_heads`)."""
    m = _interp_matrix(in_size, out_size, False)
    u = np.zeros((out_size, 3 * in_size), np.float32)
    for t in range(3):
        src = np.arange(out_size) + t - 1
        ok = (src >= 0) & (src < out_size)
        u[ok, t * in_size:(t + 1) * in_size] = m[src[ok]]
    return u


@functools.lru_cache(maxsize=32)
def _pooled_upsample_matrix(scales: tuple, out_h: int, out_w: int) -> np.ndarray:
    """(out_h*out_w, sum_sc 9*sc*sc) combined conv-tap x bilinear-upsample
    operator: column block for scale sc holds, at column
    ``((i*sc + j)*3 + ty)*3 + tx``, the weight ``Uh[h, ty*sc+i] *
    Uw[w, tx*sc+j]`` (tap-shifted separable upsample). One GEMM with this
    matrix maps the tap-GEMM outputs of every scale straight to the
    full-resolution pooled-branch sum (see _ppm_pooled_heads)."""
    cols = []
    for sc in scales:
        uh = _shifted_interp_cat(sc, out_h).reshape(out_h, 3, sc)  # (h,ty,i)
        uw = _shifted_interp_cat(sc, out_w).reshape(out_w, 3, sc)  # (w,tx,j)
        blk = np.einsum("hyi,wxj->hwijyx", uh, uw)
        cols.append(blk.reshape(out_h * out_w, sc * sc * 9))
    return np.ascontiguousarray(np.concatenate(cols, 1))


def _ppm_pooled_heads(both, g_params, g_size, pool_scales, h, w, dtype):
    """Pooled branch of the PPM head group, restructured (exact math).

    The reference concatenates the bilinearly-upsampled pyramid branches
    with ``feat`` and runs one 3x3 conv (``uemda/models/Encoder.py:16-33``).
    The fused head already splits that conv into a feat GEMM + a pooled-
    branch conv; here the pooled-branch conv is restructured further: by
    linearity ``Conv3x3(concat_sc Up_sc(z_sc)) = sum_sc Conv3x3(Up_sc(z_sc))``
    and, the upsample being a separable linear map, each term is
    ``sum_taps U_ty (z_sc @ W[ty,tx]) U_tx^T`` with tap-shifted upsample
    matrices (zero-padded rows = the conv's SAME padding). Concretely: nine
    512x512 tap GEMMs per (head, scale) on the TINY (B, sc, sc, 512) pooled
    maps, then ONE (h*w, sum 9*sc^2) GEMM (_pooled_upsample_matrix) maps
    everything straight to the full-res pooled-branch output of ALL heads —
    no full-resolution intermediate exists. Removes the per-head full-res
    3x3 conv (~19 GFLOP/tile), eight materialized upsampled maps and two
    2048-channel concats (326 -> ~15 us/tile, runs/stage_breakdown.py).

    Returns one (B, h, w, g_size*C_out) array, heads stacked on channels
    (same order as the stacked last_feat GEMM's output).
    """
    ts = []
    for hi in range(g_size):
        per_scale = []
        for si, sc in enumerate(pool_scales):
            z = both[sc][..., hi * 512:(hi + 1) * 512]
            wt = g_params["pool_taps"][hi][si]          # (512, 9*C_out)
            co = wt.shape[1] // 9
            b, s = z.shape[0], z.shape[1]
            t = jnp.einsum("bijc,ck->bijk", z, wt.astype(z.dtype),
                           preferred_element_type=jnp.float32)
            # (b, i, j, ty, tx, o) -> (b, (i j ty tx), o): pure reshape,
            # matching _pooled_upsample_matrix's column order
            per_scale.append(t.reshape(b, s * s * 9, co))
        ts.append(jnp.concatenate(per_scale, axis=1))   # (b, K, C_out)
    t_all = jnp.concatenate(ts, axis=-1).astype(dtype)  # (b, K, g*C_out)
    bm = _pooled_upsample_matrix(tuple(pool_scales), h, w)
    if dtype == jnp.bfloat16:
        # keep the old resize path's f32 interpolation-weight precision at
        # bf16 GEMM speed: split bm into two exact bf16 summands (hi = bf16
        # round, lo = bf16(residual)) — two MXU-native passes, products
        # exact, f32 accumulation
        import ml_dtypes

        hi_np = bm.astype(ml_dtypes.bfloat16)
        lo_np = (bm - hi_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
        hi, lo = jnp.asarray(hi_np), jnp.asarray(lo_np)
        out = (
            jnp.einsum("pk,bko->bpo", hi, t_all,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("pk,bko->bpo", lo, t_all,
                         preferred_element_type=jnp.float32)
        )
    else:
        out = jnp.einsum("pk,bko->bpo", jnp.asarray(bm, dtype), t_all,
                         preferred_element_type=jnp.float32)
    return out.reshape(t_all.shape[0], h, w, t_all.shape[-1]).astype(dtype)


def _fold(conv_p: Dict[str, Any], bn_p: Dict[str, Any], bn_s: Dict[str, Any]):
    """conv kernel (+optional bias) followed by eval-mode BN -> (w, b) f32."""
    w = np.asarray(conv_p["kernel"], np.float32)
    b0 = np.asarray(conv_p.get("bias", 0.0), np.float32)
    g = np.asarray(bn_p["scale"], np.float32)
    beta = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    s = g / np.sqrt(var + 1e-5)
    return w * s, (b0 - mean) * s + beta


def _s2d_stem_kernel(w: np.ndarray) -> np.ndarray:
    """(K,K,C,O) s2-conv kernel -> s1-kernel on 2x2 space-to-depth input
    (K=7 -> 4x4 on 4C; K=3 -> 2x2 on 4C).

    Tap d in [-K//2, K//2] decomposes uniquely as 2q + r with r in {0,1};
    s2d channel layout is (ry*2 + rx)*C + c (matching _space_to_depth
    below). The matching conv padding is (size//2, (size-1)//2) per axis —
    derived from the kernel size in serving_forward."""
    k, _, c, o = w.shape
    r_ = k // 2
    qmin, _ = divmod(-r_, 2)
    qmax, _ = divmod(r_, 2)
    size = qmax - qmin + 1
    w2 = np.zeros((size, size, 4 * c, o), w.dtype)
    for dy in range(-r_, r_ + 1):
        qy, ry = divmod(dy, 2)
        for dx in range(-r_, r_ + 1):
            qx, rx = divmod(dx, 2)
            w2[qy - qmin, qx - qmin,
               (ry * 2 + rx) * c:(ry * 2 + rx + 1) * c] = w[dy + r_, dx + r_]
    return w2


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _conv(x, w, b, stride=1, dilation=1, groups=1, pad: Optional[Tuple] = None):
    k = w.shape[0]
    if pad is None:
        p = dilation * (k - 1) // 2
        pad = ((p, p), (p, p))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad,
        rhs_dilation=(dilation, dilation), dimension_numbers=DIMS,
        feature_group_count=groups,
    )
    return y + b.astype(x.dtype)


# instance norm: the model's formulation already avoids materializing an
# f32 copy of the activation (models/deeplabv2.py) and measures 13 us/tile
# on the serving feat — a one-read Pallas kernel (ops/pallas_insnorm.py)
# measured 13.7 us/tile, so XLA's fusion wins here and is kept.
_instance_norm_fast = instance_norm


# ---------------------------------------------------------------------------
# parameter folding
# ---------------------------------------------------------------------------


def _quantize_w(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-out-channel symmetric int8 weight quantization — the one recipe
    shared with the runtime interceptor (``infer/quant.py:_quantize_sym``),
    applied offline here."""
    from uemda_tpu.infer.quant import _quantize_sym

    q, s = _quantize_sym(jnp.asarray(w, jnp.float32), axes=(0, 1, 2))
    return np.asarray(q), np.asarray(s, np.float32).reshape(-1)


# trace-time collector for activation-scale calibration: a list appended in
# forward-visit order (set only inside _amax_trace; single-threaded trace).
# _SIG_COLLECTOR mirrors it with STATIC per-site signatures (wq shape) so
# calibration can verify the forward-visit order against the params-walk
# order instead of trusting an equal count (an order swap between layers
# would silently mis-assign scales and degrade mIoU).
_AMAX_COLLECTOR: Optional[list] = None
_SIG_COLLECTOR: Optional[list] = None
_LAST_VISIT_SIGS: Optional[list] = None


def _conv_int8(x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray,
               b: jnp.ndarray, stride=1, dilation=1, groups=1,
               pad: Optional[Tuple] = None,
               a: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """int8 x int8 -> int32 conv; dequantized epilogue returns x.dtype.

    Activation scale: dynamic per-tensor amax by default, or a static
    calibrated scale ``a`` (see :func:`calibrate_act_scales`) — the dynamic
    amax is a full-activation reduction barrier between layers, a static
    scale lets the quantize fuse into the producing op. Out-of-calibration
    outliers saturate at +-127. Only worth it on compute-bound convs (the
    head GEMMs, late-stage 3x3s): the quantize pass costs HBM traffic."""
    k = wq.shape[0]
    if pad is None:
        p = dilation * (k - 1) // 2
        pad = ((p, p), (p, p))
    if a is not None:
        a_scale = a
    else:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        if _AMAX_COLLECTOR is not None:
            _AMAX_COLLECTOR.append(amax)
            _SIG_COLLECTOR.append(tuple(wq.shape))
        a_scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
                  ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), pad, rhs_dilation=(dilation, dilation),
        dimension_numbers=DIMS, feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return ((y.astype(jnp.float32) * (a_scale * w_scale)) + b).astype(x.dtype)


def _conv_any(x, p: Dict[str, Any], **kw):
    """Dispatch on params entry: {'w','b'} -> bf16/f32 conv, {'wq','s','b'}
    -> int8 conv (+ optional static activation scale 'a')."""
    if "wq" in p:
        return _conv_int8(x, p["wq"], p["s"], p["b"], a=p.get("a"), **kw)
    return _conv(x, p["w"], p["b"], **kw)


def build_serving_params(
    model: DeeplabV2,
    variables: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    s2b_layer4: bool = True,
    heads_int8: bool = False,
    int8_stages: Tuple[int, ...] = (),
    fused_stages: Tuple[int, ...] = (),
    fused_stem: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold a trained DeeplabV2 checkpoint into the serving layout.

    Returns ``(meta, params)``: a static metadata dict (close over it or
    pass it via functools.partial — it is not a jit-traceable pytree) and a
    pytree of jnp arrays in ``dtype`` (biases in f32 — they are tiny and
    added to f32-accumulated conv outputs before the downcast).
    Every DeeplabV2 config branch is covered; the only runtime rejection
    left is the input-size check in :func:`serving_forward` (ValueError for
    sizes the space-to-depth/space-to-batch reshapes cannot represent)."""
    cfg = model.config
    block_cls, layers, groups, base_width, deep_stem = RESNET_SPECS[
        cfg.backbone.resnet_type
    ]
    params = variables["params"]
    stats = variables["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]

    # meta holds exactly what serving_forward consumes — nothing write-only
    meta = {
        "block": "basic" if block_cls is BasicBlock else "bottleneck",
        "groups": groups,
        "output_stride": cfg.backbone.output_stride,
        "is_ins_norm": cfg.is_ins_norm,
        "pool_scales": tuple(cfg.ppm.pool_scales),
        "s2b_layer4": bool(s2b_layer4),
        "include_conv5": cfg.backbone.include_conv5,
        "deep_stem": deep_stem,
        "head": "ppm" if cfg.use_ppm else "aspp",
        "aspp_dilations": tuple(cfg.aspp_dilations),
        # stages whose identity bottleneck blocks run in the fused Pallas
        # VMEM kernel (ops/pallas_resblock.py) — the HBM-bound early stages;
        # exact math, opt-in (A/B-measure in-step before enabling)
        "fused_stages": tuple(fused_stages),
        # fused stem conv + maxpool Pallas kernel (ops/pallas_stem.py):
        # skips the HBM round trip of the (B, H/2, W/2, 64) conv output;
        # 7x7 stems only (v1c deep stems keep the XLA path)
        "fused_stem": bool(fused_stem) and not deep_stem,
    }
    out: Dict[str, Any] = {}

    def put(w, b):
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, jnp.float32)}

    def put_q(w, b):
        q, s = _quantize_w(w)
        return {"wq": jnp.asarray(q), "s": jnp.asarray(s),
                "b": jnp.asarray(b, jnp.float32)}

    # stem: fold BN then re-index the s2 conv for space-to-depth
    if deep_stem:
        # v1c (models/resnet.py:223-227): 3x3/s2 3->32, 3x3 32->32, 3x3 32->64
        stems = []
        for i in range(1, 4):
            w, b = _fold(enc_p[f"stem_conv{i}"], enc_p[f"stem_bn{i}"]["bn"],
                         enc_s[f"stem_bn{i}"]["bn"])
            stems.append(put(_s2d_stem_kernel(w) if i == 1 else w, b))
        out["deep_stem"] = stems
    else:
        w, b = _fold(enc_p["conv1"], enc_p["bn1"]["bn"], enc_s["bn1"]["bn"])
        out["stem"] = put(_s2d_stem_kernel(w), b)
        if meta["fused_stem"]:
            from uemda_tpu.ops.pallas_stem import pack_stem_weight

            # keep the plain stem too: serving_forward falls back to it for
            # input sizes the W-pair packing cannot take (H or W % 4 != 0)
            wp, bp = pack_stem_weight(_s2d_stem_kernel(w), b)
            out["stem_fused"] = put(wp, bp)

    n_stages = 4 if cfg.backbone.include_conv5 else 3
    for li in range(n_stages):
        lp, ls = enc_p[f"layer{li + 1}"], enc_s[f"layer{li + 1}"]
        # int8 only pays on the compute-bound 3x3s of the late stages;
        # 1x1s and downsamples there are memory-bound — keep them bf16
        q33 = (li + 1) in int8_stages
        blocks = []
        for bi in range(layers[li]):
            bp, bs = lp[f"block{bi}"], ls[f"block{bi}"]
            blk = {}
            names = (("conv1", "bn1"), ("conv2", "bn2")) + (
                (("conv3", "bn3"),) if block_cls is not BasicBlock else ()
            )
            for cn, bn in names:
                is_3x3 = np.asarray(bp[cn]["kernel"]).shape[0] == 3
                mk = put_q if (q33 and is_3x3) else put
                blk[cn] = mk(*_fold(bp[cn], bp[bn]["bn"], bs[bn]["bn"]))
            if "ds_conv" in bp:
                blk["ds"] = put(*_fold(bp["ds_conv"], bp["ds_bn"]["bn"],
                                       bs["ds_bn"]["bn"]))
            blocks.append(blk)
        out[f"layer{li + 1}"] = blocks

    # heads as GROUPS: heads that share an input feature map stack their
    # shared-input convs so the feat is read once. Flagship dual-head =
    # one group of two (Encoder.py:144-151); single-head (cls_pred,
    # Encoder.py:156-165) = one group of one; cascade (Encoder.py:131-143,
    # head1 on c4, head2 on c5) = two groups of one.
    if not cfg.multi_layer:
        groups_names = [("cls_pred",)]
    elif cfg.cascade:
        groups_names = [("layer5",), ("layer6",)]
    else:
        groups_names = [("layer5", "layer6")]
    meta["head_group_sizes"] = tuple(len(g) for g in groups_names)
    meta["cascade"] = bool(cfg.multi_layer and cfg.cascade)

    def build_group(names):
        hps = [params[n] for n in names]
        g: Dict[str, Any] = {}
        if not cfg.use_ppm:
            # ASPP (Encoder.py:68-84): per dilation, one conv computing the
            # group's stacked logits; biases ride along (the reference sums
            # conv+bias per dilation). heads_int8 quantizes these — they are
            # the head GEMMs of this config (3x3 over the full feat width)
            mk_head = put_q if heads_int8 else put
            g["aspp"] = [
                mk_head(
                    np.concatenate(
                        [np.asarray(hp[f"aspp_d{d}"]["kernel"], np.float32)
                         for hp in hps], -1),
                    np.concatenate(
                        [np.asarray(hp[f"aspp_d{d}"]["bias"], np.float32)
                         for hp in hps], -1),
                )
                for d in cfg.aspp_dilations
            ]
            return g
        hss = [stats[n] for n in names]
        scales = {}
        for sc in cfg.ppm.pool_scales:
            folded = [
                _fold(hp[f"ppm{sc}_conv"], hp[f"ppm{sc}_bn"]["bn"],
                      hs[f"ppm{sc}_bn"]["bn"])
                for hp, hs in zip(hps, hss)
            ]
            # one 1x1 conv computing every head-in-group's 512-ch branch
            scales[sc] = put(np.concatenate([w for w, _ in folded], -1),
                             np.concatenate([b for _, b in folded], -1))
        g["ppm_scales"] = scales

        lasts = [
            _fold(hp["last_conv"], hp["last_bn"]["bn"], hs["last_bn"]["bn"])
            for hp, hs in zip(hps, hss)
        ]
        fc = lasts[0][0].shape[2] - 512 * len(cfg.ppm.pool_scales)  # feat ch
        # split each head's concat kernel into the feat part and the pooled
        # part; stack the feat parts so feat is read once through one GEMM
        mk = put_q if heads_int8 else put
        g["last_feat"] = mk(
            np.concatenate([w[:, :, :fc] for w, _ in lasts], -1),
            np.concatenate([b for _, b in lasts], -1),
        )
        # pooled branch of each head's 3x3 concat conv, tap-packed: the
        # (3,3,512,512) per-scale kernel slice becomes a (512, 9*512) GEMM
        # weight applied on the TINY (B,sc,sc,512) pooled map BEFORE
        # upsampling (see _ppm_pooled_heads) — k index = (ty*3+tx)*512+o
        g["pool_taps"] = [
            [jnp.asarray(
                np.ascontiguousarray(
                    w[:, :, fc + si * 512:fc + (si + 1) * 512, :]
                    .transpose(2, 0, 1, 3)).reshape(512, 9 * w.shape[-1]),
                dtype)
             for si in range(len(cfg.ppm.pool_scales))]
            for w, _ in lasts
        ]
        g["classifier"] = [
            put(np.asarray(hp["classifier"]["kernel"], np.float32),
                np.asarray(hp["classifier"]["bias"], np.float32))
            for hp in hps
        ]
        return g

    out["head_groups"] = [build_group(g) for g in groups_names]
    return meta, out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _block_forward(x, blk, meta, stride, dilation, dilation2=None):
    """One residual block; the stride sits on conv1 (BasicBlock) / conv2
    (Bottleneck, torchvision v1.5), mirroring ``models/resnet.py`` exactly.
    ``dilation`` is for the stride-carrying 3x3; ``dilation2`` (default =
    dilation) is for BasicBlock's conv2, which the reference surgery gives
    the FULL stage dilate even in the first block (resnet.py:192-207)."""
    groups = meta["groups"]
    identity = x
    if meta["block"] == "basic":
        y = jax.nn.relu(_conv_any(x, blk["conv1"], stride=stride,
                                  dilation=dilation))
        y = _conv_any(y, blk["conv2"],
                      dilation=dilation if dilation2 is None else dilation2)
    else:
        y = jax.nn.relu(_conv_any(x, blk["conv1"]))
        y = jax.nn.relu(_conv_any(y, blk["conv2"], stride=stride,
                                  dilation=dilation, groups=groups))
        y = _conv_any(y, blk["conv3"])
    if "ds" in blk:
        identity = _conv_any(x, blk["ds"], stride=stride)
    return jax.nn.relu(y + identity)


def _fusable(blk, meta, dilate) -> bool:
    """Identity bottleneck the Pallas fused-block kernel can take: stride 1
    (rest blocks always are), no grouped conv, no downsample branch, bf16
    entries (not int8), 3x3 middle conv.  Dilated stages fuse too — the
    kernel's halo/shifts scale with the dilation."""
    return (
        meta["block"] == "bottleneck"
        and dilate >= 1
        and meta["groups"] == 1
        and "ds" not in blk
        and all("w" in blk[c] for c in ("conv1", "conv2", "conv3"))
        and blk["conv2"]["w"].shape[:2] == (3, 3)
    )


def _stage_forward(x, blocks, meta, stride, dilate, s2b: bool, li: int = -1):
    """One residual stage (first block dilation = dilate//2, later blocks
    = dilate, per ``stage_plan``); if ``s2b`` and dilate==2, run blocks 1+
    in space-to-batch phase space (dilated 3x3 -> dense 3x3, exact);
    ``li`` (1-based stage number) selects the fused-Pallas identity blocks
    when listed in meta['fused_stages']."""
    fused = (li in meta.get("fused_stages", ())) if li > 0 else False
    x = _block_forward(x, blocks[0], meta, stride, max(dilate // 2, 1),
                       dilation2=dilate)
    rest = blocks[1:]
    if not rest:
        return x
    if fused:
        from uemda_tpu.ops.pallas_resblock import bottleneck_identity_pallas

        for blk in rest:
            if _fusable(blk, meta, dilate):
                x = bottleneck_identity_pallas(
                    x,
                    blk["conv1"]["w"], blk["conv1"]["b"],
                    blk["conv2"]["w"], blk["conv2"]["b"],
                    blk["conv3"]["w"], blk["conv3"]["b"],
                    dilation=dilate,
                )
            else:
                x = _block_forward(x, blk, meta, 1, dilate)
        return x
    if s2b and dilate == 2:
        b, h, w, c = x.shape
        # (B,H,W,C) -> (4B, H/2, W/2, C) phases [(0,0),(0,1),(1,0),(1,1)]
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(2, 4, 0, 1, 3, 5).reshape(4 * b, h // 2, w // 2, c)
        for blk in rest:
            x = _block_forward(x, blk, meta, 1, 1)
        x = x.reshape(2, 2, b, h // 2, w // 2, c)
        x = x.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, c)
        return x
    for blk in rest:
        x = _block_forward(x, blk, meta, 1, dilate)
    return x


def serving_forward(meta: Dict[str, Any], params: Dict[str, Any],
                    x: jnp.ndarray) -> jnp.ndarray:
    """Eval forward on folded params; same output as
    ``DeeplabV2.apply(variables, x, train=False)`` (averaged softmax at
    input resolution, ``Encoder.py:152-155``). ``meta`` is static — wrap
    with functools.partial before jit."""
    in_hw = (x.shape[1], x.shape[2])
    # shapes are static under jit: reject inputs the restructured program
    # cannot represent, with a clear message (the standard apply handles any
    # size; slide inference always feeds the even dataset tile sizes)
    mult = 2
    if meta["s2b_layer4"]:
        # s2b rewrites the dilate-2 stage: its input map (H/16 at OS16,
        # H/8 at OS8) must split into 2x2 phases; OS32 has no dilated stage
        mult = {8: 16, 16: 32, 32: 2}[meta["output_stride"]]
    if in_hw[0] % mult or in_hw[1] % mult:
        raise ValueError(
            f"fastpath needs input H, W divisible by {mult} (space-to-depth "
            f"stem{' + space-to-batch layer4' if mult == 32 else ''}); got "
            f"{in_hw}. Use the standard model.apply for other sizes."
        )

    # stem (space-to-depth): the folded s2 kernel needs asymmetric padding
    # (size//2, (size-1)//2) per axis ((2,1) for the 7x7, (1,0) for v1c 3x3)
    def s2d_pad(w):
        k = w.shape[0]
        return ((k // 2, (k - 1) // 2),) * 2

    y = _space_to_depth(x)
    if (meta.get("fused_stem") and "stem_fused" in params
            and in_hw[0] % 4 == 0 and in_hw[1] % 4 == 0):
        # fused Pallas stem conv + maxpool (ops/pallas_stem.py): the conv
        # rows never leave VMEM; only the pooled (B, H/4, W/4, 64) lands
        from uemda_tpu.ops.pallas_stem import pack_cw, stem_pool_pallas

        sf = params["stem_fused"]
        y = stem_pool_pallas(pack_cw(y), sf["w"], sf["b"])
    elif meta["deep_stem"]:
        stems = params["deep_stem"]
        y = jax.nn.relu(_conv(y, **stems[0], pad=s2d_pad(stems[0]["w"])))
        y = jax.nn.relu(_conv(y, **stems[1]))
        y = jax.nn.relu(_conv(y, **stems[2]))
        y = _max_pool_3x3_s2(y)
    else:
        y = jax.nn.relu(_conv(y, **params["stem"],
                              pad=s2d_pad(params["stem"]["w"])))
        y = _max_pool_3x3_s2(y)

    plan = stage_plan(meta["output_stride"])
    n_stages = 4 if meta["include_conv5"] else 3
    outs = []
    for li in range(n_stages):
        stride, dilate = plan[li]
        y = _stage_forward(y, params[f"layer{li + 1}"], meta, stride, dilate,
                           s2b=meta["s2b_layer4"], li=li + 1)
        outs.append(y)

    # cascade feeds pyramid[-2] to group 0 and pyramid[-1] to group 1
    # (Encoder.py:131-143); the other modes run one group on pyramid[-1]
    feats = [outs[-2], outs[-1]] if meta["cascade"] else [outs[-1]]
    head_logits = []
    for g_params, g_size, feat in zip(
        params["head_groups"], meta["head_group_sizes"], feats
    ):
        if meta["is_ins_norm"]:
            feat = _instance_norm_fast(feat)
        if meta["head"] == "aspp":
            # fused group ASPP: each dilation's conv yields the group's
            # stacked logits; sum over dilations, then split per head
            acc = None
            for i, d in enumerate(meta["aspp_dilations"]):
                z = _conv_any(feat, g_params["aspp"][i], dilation=d)
                acc = z if acc is None else acc + z
            c = acc.shape[-1] // g_size
            head_logits += [acc[..., hi * c:(hi + 1) * c]
                            for hi in range(g_size)]
        else:
            # fused group PPM head
            h, w = feat.shape[1], feat.shape[2]
            acc = _conv_any(feat, g_params["last_feat"])  # all heads' 512s
            pooled = adaptive_avg_pool_multi(feat, meta["pool_scales"])
            both = {
                sc: jax.nn.relu(_conv_any(pooled[sc], g_params["ppm_scales"][sc]))
                for sc in meta["pool_scales"]
            }
            us = _ppm_pooled_heads(both, g_params, g_size,
                                   meta["pool_scales"], h, w, feat.dtype)
            acc = jax.nn.relu(acc + us)
            head_logits += [
                _conv(acc[..., hi * 512:(hi + 1) * 512],
                      **g_params["classifier"][hi])
                for hi in range(g_size)
            ]

    # eval tail (Encoder.py:152-155): mean of per-head softmax at input res.
    # Heads sharing a spatial shape upsample through ONE resize chain (the
    # resize is per-channel linear — concat then slice is exact) so the
    # full-res f32 intermediates are built once, not per head.
    if len(head_logits) > 1 and all(
        l.shape[1:] == head_logits[0].shape[1:] for l in head_logits
    ):
        # (full shape match, not just spatial: heads with equal H,W but
        # different class counts must take the per-head path below — the
        # fixed-nc softmax slicing would silently mis-split them)
        # NOTE measured alternatives (runs tail A/B, docs/PERF_NOTES.md
        # round 2): a bf16 hi/lo 2-pass resize and a single reshaped
        # (g, nc) softmax-mean BOTH measured slower than this f32-HIGHEST
        # resize + per-head sliced softmaxes (82.5 vs up to 127 us/tile) —
        # XLA fuses this form best; don't "optimize" it without an A/B.
        nc = head_logits[0].shape[-1]
        up = resize_bilinear(jnp.concatenate(head_logits, -1), in_hw,
                             align_corners=True)
        probs = sum(
            jax.nn.softmax(up[..., i * nc:(i + 1) * nc], axis=-1)
            for i in range(len(head_logits))
        )
        return probs / len(head_logits)
    probs = None
    for logits in head_logits:
        p = jax.nn.softmax(
            resize_bilinear(logits, in_hw, align_corners=True), axis=-1)
        probs = p if probs is None else probs + p
    return probs / len(head_logits)


def _map_int8_entries(tree, fn):
    """Recursively rebuild the serving-params structure, applying ``fn`` to
    every int8 conv entry (dicts containing 'wq')."""
    if isinstance(tree, dict):
        if "wq" in tree:
            return fn(tree)
        return {k: _map_int8_entries(v, fn) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_map_int8_entries(v, fn) for v in tree]
    return tree


def _amax_trace(meta, params, x):
    """(amax vector in forward-visit order) for one batch — jittable: the
    collector list is filled with tracers during the single trace."""
    global _AMAX_COLLECTOR, _SIG_COLLECTOR, _LAST_VISIT_SIGS
    _AMAX_COLLECTOR = []
    _SIG_COLLECTOR = []
    try:
        serving_forward(meta, params, x)
        _LAST_VISIT_SIGS = list(_SIG_COLLECTOR)
        if not _AMAX_COLLECTOR:
            return jnp.zeros((0,), jnp.float32)
        return jnp.stack(_AMAX_COLLECTOR)
    finally:
        _AMAX_COLLECTOR = None
        _SIG_COLLECTOR = None


def calibrate_act_scales(
    meta: Dict[str, Any], params: Dict[str, Any], batches,
) -> Dict[str, Any]:
    """Post-training calibration of static int8 activation scales.

    Runs one jitted collection forward per batch of ``batches``
    (already-normalized (B, H, W, 3) arrays) recording every int8 site's
    dynamic per-tensor amax, then embeds ``a = max_over_batches(amax)/127``
    into the entries. With static scales the quantize fuses into the
    producing op instead of waiting on a full-activation amax reduction;
    out-of-calibration outliers saturate at +-127.

    Sites are matched to entries by forward-visit order, which equals the
    params build/walk order (validated end-to-end by the calibration
    parity test — a mismatch would corrupt the scales and the outputs)."""
    # strip any existing static scales so RE-calibration (e.g. for a new
    # target domain) records fresh dynamic amaxes instead of no-oping;
    # keep the originals so an empty ``batches`` cannot silently discard a
    # previous calibration
    original_params = params
    params = _map_int8_entries(
        params, lambda e: {k: v for k, v in e.items() if k != "a"}
    )
    walk_sigs: list = []

    def _collect_sig(e):
        walk_sigs.append(tuple(e["wq"].shape))
        return e

    _map_int8_entries(params, _collect_sig)
    n_entries = len(walk_sigs)

    fn = jax.jit(functools.partial(_amax_trace, meta))
    agg = None
    for x in batches:
        cur = np.asarray(fn(params, jnp.asarray(x)))
        agg = cur if agg is None else np.maximum(agg, cur)
    if agg is None or agg.size == 0:
        # no calibration batch was consumed (exhausted iterator / empty
        # dataset / no int8 sites): return the ORIGINAL params untouched
        return original_params
    if agg.size != n_entries:
        raise AssertionError(
            f"calibration visited {agg.size} int8 convs but the params hold "
            f"{n_entries} int8 entries — forward/walk order contract broken"
        )
    # order parity: the forward-visit weight-shape sequence must equal the
    # params-walk sequence, or scales would be assigned to the wrong layers
    if _LAST_VISIT_SIGS is not None and list(_LAST_VISIT_SIGS) != walk_sigs:
        raise AssertionError(
            "int8 calibration order mismatch: forward-visit shapes "
            f"{_LAST_VISIT_SIGS} != params-walk shapes {walk_sigs}"
        )

    it = iter(agg.tolist())

    def embed(entry):
        return {**entry, "a": jnp.float32(max(next(it), 1e-8) / 127.0)}

    return _map_int8_entries(params, embed)


class FastpathModel:
    """Duck-types ``DeeplabV2`` for the serving pipelines (``infer/slide.py``,
    ``infer/evaluate.py``, ``infer/raster.py``): ``apply(params, x,
    train=False)`` runs the folded forward on serving params produced by
    :func:`build_serving_params`. ``meta`` is a plain attribute — it is
    closed over by the jitted predictor, never traced."""

    # serving params are already laid out in their final dtypes (weights in
    # the build dtype, biases/int8-scales deliberately f32): the predictors'
    # blanket f32->compute cast must NOT touch them
    params_precast = True

    def __init__(self, meta: Dict[str, Any]):
        self.meta = meta

    def apply(self, params: Dict[str, Any], x: jnp.ndarray,
              train: bool = False, **_: Any) -> jnp.ndarray:
        if train:
            raise ValueError("FastpathModel is eval-only (serving fast path)")
        return serving_forward(self.meta, params, x)


def check_fastpath_tile(tile) -> None:
    """CLI guard: the space-to-depth stem needs even tile sides; without
    this, an odd ``cfg.crop`` only surfaces as serving_forward's ValueError
    deep inside the jitted predictor, after calibration work already ran
    (tools/eval.py, infer_dir.py, infer_single.py call this right after
    parsing --fastpath)."""
    if tile[0] % 2 or tile[1] % 2:
        raise SystemExit(
            f"--fastpath requires even tile sides (space-to-depth stem), "
            f"got {tuple(tile)}; rerun without --fastpath"
        )


def parse_int8_stages_flag(int8_stages: str, int8: bool, fastpath: bool):
    """CLI guard for ``--int8-stages``: call RIGHT AFTER argparse, before any
    calibration-batch collection, so a bad value fails fast instead of after
    minutes of image decode (and so the flag is never silently ignored when
    --fastpath/--int8 are absent). Returns a stage tuple or None."""
    if not int8_stages:
        return None
    if not fastpath or not int8:
        raise SystemExit(
            "--int8-stages requires --fastpath 1 --int8 1 "
            "(it selects which fastpath backbone stages to quantize)"
        )
    try:
        stages = tuple(int(t) for t in int8_stages.split(",") if t.strip())
    except ValueError:
        stages = ()
    if not stages or any(t not in (1, 2, 3, 4) for t in stages):
        raise SystemExit(
            f"--int8-stages must be a comma list from 1-4, got {int8_stages!r}"
        )
    return stages


def build_fastpath(
    model: DeeplabV2,
    variables: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    int8: bool = False,
    calibration_batches=None,
    fused_stages: Tuple[int, ...] = (),
    fused_stem: bool = False,
    int8_stages: Optional[Tuple[int, ...]] = None,
) -> Tuple["FastpathModel", Dict[str, Any]]:
    """CLI-facing entry: fold ``variables`` and return ``(model-like,
    serving_params)`` ready for ``make_predictor`` / ``evaluate_dataset``.
    ``int8=True`` additionally quantizes the head feat GEMM plus the 3x3s
    of ``int8_stages`` (default stages 3-4; the restructured pooled branch
    is a few MFLOP and stays bf16) — verify mIoU with tools/serving_gate.py
    before serving int8. With CALIBRATED static scales, extending to every
    stage (``int8_stages=(1, 2, 3, 4)``) measured fastest on v5e — the
    quantize fuses into each producer, so the HBM-bound early stages read
    int8 activations (1286 -> 1326 tiles/s; gated at <=0.0012 mIoU on the
    three schedule-scale checkpoints, docs/PERF_NOTES.md). Dynamic scales
    on early stages are a per-conv amax barrier — keep the default there.
    ``calibration_batches``: optional iterable of normalized (B, H, W, 3)
    arrays — embeds static activation scales (:func:`calibrate_act_scales`)
    so serving skips the per-layer dynamic amax reductions."""
    if int8_stages is None:
        int8_stages = (3, 4)
    meta, params = build_serving_params(
        model, variables, dtype=dtype,
        s2b_layer4=False,  # measured slower on v5e (docs/PERF_NOTES.md)
        heads_int8=int8, int8_stages=int8_stages if int8 else (),
        fused_stages=fused_stages, fused_stem=fused_stem,
    )
    if int8 and calibration_batches is not None:
        params = calibrate_act_scales(meta, params, calibration_batches)
    return FastpathModel(meta), params


def make_serving_fn(
    model: DeeplabV2,
    variables: Dict[str, Any],
    dtype: Any = jnp.bfloat16,
    s2b_layer4: bool = False,
    heads_int8: bool = False,
    int8_stages: Tuple[int, ...] = (),
    fused_stages: Tuple[int, ...] = (),
    fused_stem: bool = False,
):
    """Convenience: returns ``(apply_fn, params)`` where
    ``apply_fn(params, images)`` is the folded eval forward (drop-in for
    ``lambda v, x: model.apply(v, x, train=False)``)."""
    meta, params = build_serving_params(
        model, variables, dtype=dtype, s2b_layer4=s2b_layer4,
        heads_int8=heads_int8, int8_stages=int8_stages,
        fused_stages=fused_stages, fused_stem=fused_stem,
    )
    return functools.partial(serving_forward, meta), params
