"""DeepLabV3+ semantic segmentation, TPU-native (NHWC, functional).

Topology parity with the reference's jfzhang95-layout model
(reference: modeling/deeplab.py:9-33):
  backbone (ResNet-101 bottleneck, output_stride 16/8, multi-grid [1,2,4]
  layer4 — modeling/backbone/resnet.py:46-125) → ASPP (rates by stride,
  global-pool branch, 1280→256 projection — modeling/aspp.py:30-95) →
  decoder (low-level 256→48, concat 304→2×conv256→1×1 classifier —
  modeling/decoder.py:7-43) → bilinear align_corners=True upsample to input.

Inference-only: BatchNorm folds running stats (eval mode; the reference
always builds sync_bn=False and eval — sky_swap.py:160-166). Dropout layers
are identity at inference.

Checkpoint import handles the reference's loading quirks: ``module.``
prefix strip and class-count auto-detection from 1×1 classifier heads
(reference: sky_swap.py:143-177, 128-141).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.conv import conv2d
from ..ops.resize import resize_bilinear_align_corners

_RESNET101_LAYERS = [3, 4, 23, 3]
_MG_BLOCKS = [1, 2, 4]


def _bn(x, p, eps=1e-5):
    """Inference BN as a folded per-channel affine, applied in x.dtype.

    scale/shift are computed in f32 from the (f32) running stats, then the
    single FMA runs in the activation dtype so it fuses into the producing
    conv's epilogue — the pre-round-5 form upcast every activation tensor
    to f32 per BN, which mk44 traced as the dominant cost of the fused
    masked-stylize step (copies + convert_multiply, not convs). Same
    affine as (x-mean)*inv*scale+bias up to f32 re-association.
    """
    inv = lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"] * inv).astype(x.dtype)
    shift = (p["bias"] - p["mean"] * p["scale"] * inv).astype(x.dtype)
    return x * scale + shift


def _conv_bn_relu(x, conv_p, bn_p, *, stride=1, padding=0, dilation=1, relu=True):
    y = _dilated_conv(x, conv_p["w"], stride=stride, padding=padding, dilation=dilation)
    y = _bn(y, bn_p)
    return jax.nn.relu(y) if relu else y


def _dilated_conv(x, w, *, stride=1, padding=0, dilation=1):
    from .. import config

    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _max_pool_3s2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )


def _bottleneck(x, p, *, stride=1, dilation=1):
    """(reference: modeling/backbone/resnet.py:6-44)"""
    residual = x
    y = _conv_bn_relu(x, p["conv1"], p["bn1"])
    y = _conv_bn_relu(y, p["conv2"], p["bn2"], stride=stride, padding=dilation, dilation=dilation)
    y = _conv_bn_relu(y, p["conv3"], p["bn3"], relu=False)
    if "downsample" in p:
        residual = _bn(_dilated_conv(x, p["downsample"]["conv"]["w"], stride=stride), p["downsample"]["bn"])
    return jax.nn.relu(y + residual)


def backbone_resnet(params, x, *, output_stride=16):
    """ResNet-101 trunk → (x_os16/8, low_level_feat)."""
    if output_stride == 16:
        strides, dilations = [1, 2, 2, 1], [1, 1, 1, 2]
    elif output_stride == 8:
        strides, dilations = [1, 2, 1, 1], [1, 1, 2, 4]
    else:
        raise NotImplementedError(output_stride)
    y = _conv_bn_relu(x, params["conv1"], params["bn1"], stride=2, padding=3)
    y = _max_pool_3s2(y)
    feats = []
    for li, nblocks in enumerate(_RESNET101_LAYERS):
        layer = params[f"layer{li + 1}"]
        if li == 3:
            # Multi-grid unit (reference: resnet.py:97-114)
            for bi, mg in enumerate(_MG_BLOCKS):
                y = _bottleneck(y, layer[bi], stride=strides[li] if bi == 0 else 1, dilation=mg * dilations[li])
        else:
            for bi in range(nblocks):
                y = _bottleneck(y, layer[bi], stride=strides[li] if bi == 0 else 1, dilation=dilations[li])
        if li == 0:
            feats.append(y)
    return y, feats[0]


def aspp(params, x, *, output_stride=16):
    """(reference: modeling/aspp.py:30-95)"""
    dil = [1, 6, 12, 18] if output_stride == 16 else [1, 12, 24, 36]
    x1 = _conv_bn_relu(x, params["aspp1"]["conv"], params["aspp1"]["bn"])
    x2 = _conv_bn_relu(x, params["aspp2"]["conv"], params["aspp2"]["bn"], padding=dil[1], dilation=dil[1])
    x3 = _conv_bn_relu(x, params["aspp3"]["conv"], params["aspp3"]["bn"], padding=dil[2], dilation=dil[2])
    x4 = _conv_bn_relu(x, params["aspp4"]["conv"], params["aspp4"]["bn"], padding=dil[3], dilation=dil[3])
    gp = jnp.mean(x, axis=(1, 2), keepdims=True)
    gp = _conv_bn_relu(gp, params["gap"]["conv"], params["gap"]["bn"])
    x5 = jnp.broadcast_to(gp, x4.shape)  # 1x1 → bilinear upsample degenerates to broadcast
    y = jnp.concatenate([x1, x2, x3, x4, x5], axis=-1)
    return _conv_bn_relu(y, params["conv1"], params["bn1"])


def decoder(params, x, low_level):
    """(reference: modeling/decoder.py:7-43)"""
    ll = _conv_bn_relu(low_level, params["conv1"], params["bn1"])
    x = resize_bilinear_align_corners(x, (ll.shape[1], ll.shape[2]))
    y = jnp.concatenate([x, ll], axis=-1)
    y = _conv_bn_relu(y, params["lc0"], params["lc1"], padding=1)
    y = _conv_bn_relu(y, params["lc4"], params["lc5"], padding=1)
    return conv2d(y, params["cls"]["w"], params["cls"]["b"])


def apply(params: dict, x: jnp.ndarray, *, output_stride: int = 16,
          backbone: str = "resnet") -> jnp.ndarray:
    """NHWC (ImageNet-normalized) → per-pixel class logits NHWC[K].

    ``backbone`` selects resnet|xception|drn|mobilenet (reference:
    modeling/backbone/__init__.py:3-13); drn forces output_stride=8 like
    the reference wrapper (modeling/deeplab.py:13-14).
    """
    if backbone == "drn":
        output_stride = 8
    if backbone == "resnet":
        feat, low = backbone_resnet(params["backbone"], x, output_stride=output_stride)
    else:
        from .deeplab_backbones import BACKBONES

        bb_apply, _ = BACKBONES[backbone]
        feat, low = bb_apply(params["backbone"], x, output_stride=output_stride)
    y = aspp(params["aspp"], feat, output_stride=output_stride)
    y = decoder(params["decoder"], y, low)
    return resize_bilinear_align_corners(y, (x.shape[1], x.shape[2]))


# ---------------------------------------------------------------------------
# Checkpoint import (reference: sky_swap.py:128-177)
# ---------------------------------------------------------------------------


def detect_backbone(sd: dict[str, np.ndarray]) -> str:
    """Auto-detect the backbone family from reference-format state-dict
    keys (modeling/backbone/*: mobilenet uses a ``features`` sequential,
    drn a ``layer0`` conv stem, xception named ``blockN`` modules, resnet
    ``layer1..4`` bottlenecks)."""
    keys = {k.removeprefix("module.") for k in sd}
    if any(k.startswith("backbone.features.") for k in keys):
        return "mobilenet"
    if any(k.startswith("backbone.layer0.") for k in keys):
        return "drn"
    if any(k.startswith("backbone.block1.") for k in keys):
        return "xception"
    return "resnet"


def detect_num_classes(sd: dict[str, np.ndarray]) -> int:
    """Auto-detect K from 1×1 conv heads, preferring {19,21,150,80}
    (reference: sky_swap.py:128-141)."""
    candidates = []
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim == 4 and v.shape[2] == 1 and v.shape[3] == 1:
            candidates.append(v.shape[0])
    for pref in (19, 21, 150, 80):
        if pref in candidates:
            return pref
    return candidates[-1] if candidates else 21


def _cv(sd, key):
    return {"w": np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))}


def _bnp(sd, key):
    return {
        "scale": sd[f"{key}.weight"],
        "bias": sd[f"{key}.bias"],
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }


def import_deeplab(sd: dict[str, np.ndarray], *, backbone: str = "resnet") -> tuple[dict, int]:
    """Reference-format DeepLab .pth.tar state-dict → param tree.

    Accepts raw tensors incl. running stats (use a loader that KEEPS
    running_mean/var — unlike the stylizer loader)."""
    sd = {k.removeprefix("module."): np.asarray(v, np.float32) for k, v in sd.items()}
    num_classes = detect_num_classes(sd)

    if backbone != "resnet":
        from .deeplab_backbones import BACKBONES

        _, bb_import = BACKBONES[backbone]
        bb = bb_import(sd)
        return _assemble(sd, bb), num_classes

    bb: dict = {"conv1": _cv(sd, "backbone.conv1"), "bn1": _bnp(sd, "backbone.bn1")}
    for li, nblocks in enumerate(_RESNET101_LAYERS):
        blocks = []
        n = len(_MG_BLOCKS) if li == 3 else nblocks
        for bi in range(n):
            pre = f"backbone.layer{li + 1}.{bi}"
            blk = {
                "conv1": _cv(sd, f"{pre}.conv1"),
                "bn1": _bnp(sd, f"{pre}.bn1"),
                "conv2": _cv(sd, f"{pre}.conv2"),
                "bn2": _bnp(sd, f"{pre}.bn2"),
                "conv3": _cv(sd, f"{pre}.conv3"),
                "bn3": _bnp(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _cv(sd, f"{pre}.downsample.0"),
                    "bn": _bnp(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        bb[f"layer{li + 1}"] = blocks

    return _assemble(sd, bb), num_classes


def _assemble(sd, bb) -> dict:
    """ASPP + decoder import shared by every backbone (names identical)."""
    ap = {}
    for i in range(1, 5):
        ap[f"aspp{i}"] = {"conv": _cv(sd, f"aspp.aspp{i}.atrous_conv"), "bn": _bnp(sd, f"aspp.aspp{i}.bn")}
    ap["gap"] = {"conv": _cv(sd, "aspp.global_avg_pool.1"), "bn": _bnp(sd, "aspp.global_avg_pool.2")}
    ap["conv1"] = _cv(sd, "aspp.conv1")
    ap["bn1"] = _bnp(sd, "aspp.bn1")

    dc = {
        "conv1": _cv(sd, "decoder.conv1"),
        "bn1": _bnp(sd, "decoder.bn1"),
        "lc0": _cv(sd, "decoder.last_conv.0"),
        "lc1": _bnp(sd, "decoder.last_conv.1"),
        "lc4": _cv(sd, "decoder.last_conv.4"),
        "lc5": _bnp(sd, "decoder.last_conv.5"),
        "cls": {
            "w": np.transpose(sd["decoder.last_conv.8.weight"], (2, 3, 1, 0)),
            "b": sd["decoder.last_conv.8.bias"],
        },
    }
    return jax.tree.map(jnp.asarray, {"backbone": bb, "aspp": ap, "decoder": dc})
