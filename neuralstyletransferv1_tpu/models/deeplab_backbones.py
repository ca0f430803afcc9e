"""DeepLabV3+ extra backbones: AlignedXception, DRN-D-54, MobileNetV2.

The reference accepts four --backbone values (reference:
modeling/backbone/__init__.py:3-13); round 1 shipped ResNet-101 only
(models/deeplab.py). These three complete the surface, inference-only
(BatchNorm folds running stats), NHWC/HWIO functional style.

Semantics preserved per backbone:
- MobileNetV2 (reference: modeling/backbone/mobilenet.py): inverted
  residuals with ``fixed_padding`` (asymmetric TF-style pads) applied to the
  BLOCK input before its conv stack, ReLU6, depthwise convs; low-level
  features after features[0:4]; stride/dilation schedule driven by
  output_stride.
- AlignedXception (reference: modeling/backbone/xception.py): separable
  convs (fixed_padding → depthwise VALID → BN → pointwise), entry/middle/
  exit blocks with skip convs, the post-block1 extra relu feeding the
  low-level feature, entry_block3/middle/exit dilations by output_stride.
- DRN-D-54 (reference: modeling/backbone/drn.py:386-396, arch 'D',
  Bottleneck [1,1,3,4,6,3,1,1]): conv layer0-2, bottleneck layers 3-6 with
  dilation (2,2)/(4,4) at levels 5/6, plain conv layers 7-8 (dil 2/1);
  low-level feature after layer3; the DeepLab wrapper forces
  output_stride=8 for drn (reference: modeling/deeplab.py:13-14).

Importers map the torch state-dict names (incl. nn.Sequential indices)
exactly; parity tests drive the reference modules with random weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .deeplab import _bn

# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _fixed_pad(x, k, dilation=1):
    """TF-style asymmetric pad (reference: mobilenet.py:16-22,
    xception.py:8-15)."""
    k_eff = k + (k - 1) * (dilation - 1)
    total = k_eff - 1
    beg = total // 2
    end = total - beg
    return jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))


def _conv(x, p, *, stride=1, padding=0, dilation=1, groups=1):
    from .. import config
    from jax import lax

    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _cv(sd, key):
    # torch OIHW → HWIO; depthwise [C,1,kh,kw] → [kh,kw,1,C] is the same map
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    return {"w": np.transpose(w, (2, 3, 1, 0))}


def _bnp(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], np.float32),
        "mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{key}.running_var"], np.float32),
    }


# ---------------------------------------------------------------------------
# MobileNetV2 (reference: modeling/backbone/mobilenet.py)
# ---------------------------------------------------------------------------

_MBV2_SETTING = [  # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


def _mbv2_schedule(output_stride):
    """Per-feature (stride, dilation, expand, cin, cout), mirroring the
    constructor's current_stride/rate logic (mobilenet.py:76-107)."""
    feats = []
    current_stride = 2  # after the stem
    rate = 1
    cin = 32
    for t, c, n, s in _MBV2_SETTING:
        if current_stride == output_stride:
            stride, dilation = 1, rate
            rate *= s
        else:
            stride, dilation = s, 1
            current_stride *= s
        for i in range(n):
            feats.append((stride if i == 0 else 1, dilation, t, cin, c))
            cin = c
    return feats


def _inverted_residual(x, p, *, stride, dilation, expand):
    x_pad = _fixed_pad(x, 3, dilation)
    cin = x.shape[-1]
    if expand == 1:
        hidden = cin
        y = _conv(x_pad, p["dw"], stride=stride, dilation=dilation, groups=hidden)
        y = _relu6(_bn(y, p["dw_bn"]))
        y = _bn(_conv(y, p["pw"]), p["pw_bn"])
    else:
        y = _relu6(_bn(_conv(x_pad, p["exp"]), p["exp_bn"]))
        hidden = y.shape[-1]
        y = _conv(y, p["dw"], stride=stride, dilation=dilation, groups=hidden)
        y = _relu6(_bn(y, p["dw_bn"]))
        y = _bn(_conv(y, p["pw"]), p["pw_bn"])
    if stride == 1 and y.shape[-1] == cin:
        y = x + y
    return y


def backbone_mobilenet(params, x, *, output_stride=16):
    y = _conv(x, params["stem"], stride=2, padding=1)  # conv_bn stem
    y = _relu6(_bn(y, params["stem_bn"]))
    feats = _mbv2_schedule(output_stride)
    low = None
    for i, (stride, dilation, expand, _ci, _co) in enumerate(feats):
        y = _inverted_residual(y, params["blocks"][i], stride=stride,
                               dilation=dilation, expand=expand)
        if i == 2:  # features[0:4] = stem + 3 blocks (mobilenet.py:115-119)
            low = y
    return y, low


def import_mobilenet(sd) -> dict:
    blocks = []
    feats = _mbv2_schedule(16)  # expand ratios identical for any os
    for i, (_s, _d, expand, _ci, _co) in enumerate(feats):
        pre = f"backbone.features.{i + 1}.conv"
        if expand == 1:
            blocks.append({
                "dw": _cv(sd, f"{pre}.0"), "dw_bn": _bnp(sd, f"{pre}.1"),
                "pw": _cv(sd, f"{pre}.3"), "pw_bn": _bnp(sd, f"{pre}.4"),
            })
        else:
            blocks.append({
                "exp": _cv(sd, f"{pre}.0"), "exp_bn": _bnp(sd, f"{pre}.1"),
                "dw": _cv(sd, f"{pre}.3"), "dw_bn": _bnp(sd, f"{pre}.4"),
                "pw": _cv(sd, f"{pre}.6"), "pw_bn": _bnp(sd, f"{pre}.7"),
            })
    return {
        "stem": _cv(sd, "backbone.features.0.0"),
        "stem_bn": _bnp(sd, "backbone.features.0.1"),
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# AlignedXception (reference: modeling/backbone/xception.py)
# ---------------------------------------------------------------------------


def _sep_conv(x, p, *, stride=1, dilation=1):
    """SeparableConv2d: fixed_pad → depthwise VALID → BN → pointwise
    (xception.py:17-31)."""
    cin = x.shape[-1]
    y = _fixed_pad(x, 3, dilation)
    y = _conv(y, p["conv1"], stride=stride, dilation=dilation, groups=cin)
    y = _bn(y, p["bn"])
    return _conv(y, p["pointwise"])


def _xception_block_spec(reps, stride, grow_first, is_last, start_with_relu):
    """The Block's rep Sequential, module by module — ('relu',),
    ('sep', stride, dilated), ('bn',) — so list positions ARE the torch
    Sequential indices (xception.py:34-79: every sep is followed by a BN)."""
    ops = []

    def sep(s, use_dil):
        ops.extend([("relu",), ("sep", s, use_dil), ("bn",)])

    if grow_first:
        sep(1, True)
    for _ in range(reps - 1):
        sep(1, True)
    if not grow_first:
        sep(1, True)
    if stride != 1:
        sep(2, False)
    if stride == 1 and is_last:
        sep(1, False)
    if not start_with_relu:
        ops = ops[1:]
    return ops


def _xception_layout(output_stride):
    if output_stride == 16:
        entry3, mid_dil, exit_dil = 2, 1, (1, 2)
    elif output_stride == 8:
        entry3, mid_dil, exit_dil = 1, 2, (2, 4)
    else:
        raise NotImplementedError(output_stride)
    blocks = [("block1", 2, 2, 1, False, True, False)]
    blocks.append(("block2", 2, 2, 1, False, True, False))
    blocks.append(("block3", 2, entry3, 1, True, True, True))
    for i in range(4, 20):
        blocks.append((f"block{i}", 3, 1, mid_dil, True, True, False))
    blocks.append(("block20", 2, 1, exit_dil[0], True, False, True))
    return blocks, exit_dil


def backbone_xception(params, x, *, output_stride=16):
    y = _conv(x, params["conv1"], stride=2, padding=1)
    y = jax.nn.relu(_bn(y, params["bn1"]))
    y = _conv(y, params["conv2"], padding=1)
    y = jax.nn.relu(_bn(y, params["bn2"]))
    blocks, exit_dil = _xception_layout(output_stride)
    low = None
    for name, reps, stride, dilation, swr, grow, is_last in blocks:
        p = params[name]
        inp = y
        ops = _xception_block_spec(reps, stride, grow, is_last, swr)
        si = 0
        for op in ops:
            if op[0] == "relu":
                y = jax.nn.relu(y)
            elif op[0] == "sep":
                _tag, s, use_dil = op
                y = _sep_conv(y, p["seps"][si], stride=s,
                              dilation=dilation if use_dil else 1)
            else:  # the Sequential's own BN after each sep
                y = _bn(y, p["sep_bns"][si])
                si += 1
        if "skip" in p:
            skip = _bn(_conv(inp, p["skip"], stride=stride), p["skipbn"])
        else:
            skip = inp
        y = y + skip
        if name == "block1":
            y = jax.nn.relu(y)  # "add relu here" (xception.py:191-194)
            low = y
    y = jax.nn.relu(y)
    y = _sep_conv(y, params["conv3"], dilation=exit_dil[1])
    y = jax.nn.relu(_bn(y, params["bn3"]))
    y = _sep_conv(y, params["conv4"], dilation=exit_dil[1])
    y = jax.nn.relu(_bn(y, params["bn4"]))
    y = _sep_conv(y, params["conv5"], dilation=exit_dil[1])
    y = jax.nn.relu(_bn(y, params["bn5"]))
    return y, low


def _sep_params(sd, key):
    return {
        "conv1": _cv(sd, f"{key}.conv1"),
        "bn": _bnp(sd, f"{key}.bn"),
        "pointwise": _cv(sd, f"{key}.pointwise"),
    }


def import_xception(sd, *, output_stride=16) -> dict:
    out = {
        "conv1": _cv(sd, "backbone.conv1"), "bn1": _bnp(sd, "backbone.bn1"),
        "conv2": _cv(sd, "backbone.conv2"), "bn2": _bnp(sd, "backbone.bn2"),
        "conv3": _sep_params(sd, "backbone.conv3"), "bn3": _bnp(sd, "backbone.bn3"),
        "conv4": _sep_params(sd, "backbone.conv4"), "bn4": _bnp(sd, "backbone.bn4"),
        "conv5": _sep_params(sd, "backbone.conv5"), "bn5": _bnp(sd, "backbone.bn5"),
    }
    blocks, _ = _xception_layout(output_stride)
    for name, reps, stride, _dil, swr, grow, is_last in blocks:
        pre = f"backbone.{name}"
        ops = _xception_block_spec(reps, stride, grow, is_last, swr)
        # list positions == nn.Sequential indices (relus included)
        seps, sep_bns = [], []
        for idx, op in enumerate(ops):
            if op[0] == "sep":
                seps.append(_sep_params(sd, f"{pre}.rep.{idx}"))
            elif op[0] == "bn":
                sep_bns.append(_bnp(sd, f"{pre}.rep.{idx}"))
        blk = {"seps": seps, "sep_bns": sep_bns}
        if f"{pre}.skip.weight" in sd:
            blk["skip"] = _cv(sd, f"{pre}.skip")
            blk["skipbn"] = _bnp(sd, f"{pre}.skipbn")
        out[name] = blk
    return out


# ---------------------------------------------------------------------------
# DRN-D-54 (reference: modeling/backbone/drn.py)
# ---------------------------------------------------------------------------

_DRN54_LAYERS = [1, 1, 3, 4, 6, 3, 1, 1]
_DRN_CHANNELS = [16, 32, 64, 128, 256, 512, 512, 512]


def _drn_bottleneck(x, p, *, stride=1, dilation=(1, 1)):
    residual = x
    y = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, p["conv2"], stride=stride, padding=dilation[1],
                              dilation=dilation[1]), p["bn2"]))
    y = _bn(_conv(y, p["conv3"]), p["bn3"])
    if "downsample" in p:
        residual = _bn(_conv(x, p["downsample"]["conv"], stride=stride),
                       p["downsample"]["bn"])
    return jax.nn.relu(y + residual)


def backbone_drn(params, x, *, output_stride=8):
    """DRN-D-54 trunk (the wrapper forces os=8; the trunk itself is fixed)."""
    # layer0: conv7x7 s1 p3 + BN + relu (arch D, drn.py:123-130)
    y = jax.nn.relu(_bn(_conv(x, params["layer0"]["conv"], padding=3),
                        params["layer0"]["bn"]))
    # layer1/2: plain conv layers (1 conv each for d_54)
    y = jax.nn.relu(_bn(_conv(y, params["layer1"]["conv"], padding=1),
                        params["layer1"]["bn"]))
    y = jax.nn.relu(_bn(_conv(y, params["layer2"]["conv"], stride=2, padding=1),
                        params["layer2"]["bn"]))
    # bottleneck layers 3-6
    dil_cfg = {3: (1, 1), 4: (1, 1), 5: (2, 2), 6: (4, 4)}
    stride_cfg = {3: 2, 4: 2, 5: 1, 6: 1}
    low = None
    for li in (3, 4, 5, 6):
        blocks = params[f"layer{li}"]
        for bi, blk in enumerate(blocks):
            y = _drn_bottleneck(y, blk, stride=stride_cfg[li] if bi == 0 else 1,
                                dilation=dil_cfg[li])
        if li == 3:
            low = y
    # layer7/8: plain conv layers, dilation 2 / 1 (arch D)
    y = jax.nn.relu(_bn(_conv(y, params["layer7"]["conv"], padding=2, dilation=2),
                        params["layer7"]["bn"]))
    y = jax.nn.relu(_bn(_conv(y, params["layer8"]["conv"], padding=1),
                        params["layer8"]["bn"]))
    return y, low


def import_drn(sd) -> dict:
    out = {}
    for name, conv_key, bn_key in (
        ("layer0", "backbone.layer0.0", "backbone.layer0.1"),
        ("layer1", "backbone.layer1.0", "backbone.layer1.1"),
        ("layer2", "backbone.layer2.0", "backbone.layer2.1"),
        ("layer7", "backbone.layer7.0", "backbone.layer7.1"),
        ("layer8", "backbone.layer8.0", "backbone.layer8.1"),
    ):
        out[name] = {"conv": _cv(sd, conv_key), "bn": _bnp(sd, bn_key)}
    for li, nblocks in zip((3, 4, 5, 6), (3, 4, 6, 3)):
        blocks = []
        for bi in range(nblocks):
            pre = f"backbone.layer{li}.{bi}"
            blk = {
                "conv1": _cv(sd, f"{pre}.conv1"), "bn1": _bnp(sd, f"{pre}.bn1"),
                "conv2": _cv(sd, f"{pre}.conv2"), "bn2": _bnp(sd, f"{pre}.bn2"),
                "conv3": _cv(sd, f"{pre}.conv3"), "bn3": _bnp(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _cv(sd, f"{pre}.downsample.0"),
                    "bn": _bnp(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        out[f"layer{li}"] = blocks
    return out


BACKBONES = {
    "mobilenet": (backbone_mobilenet, import_mobilenet),
    "xception": (backbone_xception, import_xception),
    "drn": (backbone_drn, import_drn),
}
