"""NST_Train TransformerNet in f=2 block form — the TPU speed path for the
``down1.``-keyed checkpoints (weight-ladder families).

Same math as models/transformer_net_nst.apply (reference:
transformer_net_nst.py:12-127): global ReflectionPad2d(40), zero-padded
convs, ConvTranspose2d(k3 s2 p1 op1) upsampling, crop-back. Because every
conv is ZERO padded, the f=2 restructure needs no halo builds or border
fixups at all — the pads ride the convs — and the instance norms are exact
over the padded tensor (the reference also normalizes over the pad region).
The transposed convs reuse io/t7_fast's phase scatter; conv1/final reuse
the s2d2 scatters. ~5x the naive NHWC form at 1080p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from .transformer_net_s2d import (
    _apply_in_relu,
    _in_stats,
    _scatter_stride2_s2d2,
    d2s,
    s2d,
)
from .transformer_net_s2d2 import _scatter_k9_f2

_PAD = 40


def from_nst_params(p: dict) -> dict:
    """Reference-layout NST params → f=2 block-space params."""
    from ..io.t7_fast import _scatter_convT_f2

    g = lambda a: np.asarray(a, np.float32)  # noqa: E731
    out: dict = {}
    out["c1_w"] = _scatter_k9_f2(g(p["down1"]["conv"]["w"]))
    out["c1_b"] = np.tile(g(p["down1"]["conv"]["b"]), 4)
    out["in1"] = {k: g(v) for k, v in p["down1"]["norm"].items()}
    out["c2_w"] = _scatter_stride2_s2d2(g(p["down2"]["conv"]["w"]))
    out["c2_b"] = g(p["down2"]["conv"]["b"])
    out["in2"] = {k: g(v) for k, v in p["down2"]["norm"].items()}
    out["c3_w"] = g(p["down3"]["conv"]["w"])
    out["c3_b"] = g(p["down3"]["conv"]["b"])
    out["in3"] = {k: g(v) for k, v in p["down3"]["norm"].items()}
    for i in range(1, 6):
        out[f"res{i}"] = jax.tree.map(g, p[f"res{i}"])
    for name, tag in (("up1", "d1"), ("up2", "d2")):
        w = g(p[name]["conv"]["w"])               # (3,3,cout,cin)
        wb, (lo, hi) = _scatter_convT_f2(w, 3, 1, 1)
        out[f"{tag}_w"] = wb
        out[f"{tag}_b"] = np.tile(g(p[name]["conv"]["b"]), 4)
        out[f"{tag}_pad"] = (lo, hi)
        out[f"in_{tag}"] = {k: g(v) for k, v in p[name]["norm"].items()}
    w5 = _scatter_k9_f2(g(p["final"]["w"]))       # (5,5,128,12)
    w_row = np.zeros((1, 5, w5.shape[2], 60), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * 12 : (dy + 1) * 12] = w5[dy]
    out["d3_w"] = w_row
    out["d3_b"] = np.tile(g(p["final"]["b"]), 4)
    res = {}
    for k, v in out.items():
        if isinstance(v, tuple):
            res[k] = v
        else:
            res[k] = jax.tree.map(jnp.asarray, v)
    return res


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass, same contract as transformer_net_nst.apply (raw_01 in,
    cropped to input size). H, W divisible by 4."""
    p = params
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)),
                 mode="reflect")
    hp = h + 2 * _PAD
    y = s2d(xp, 2)                                # [B, hp/2, wp/2, 12]
    y = conv2d(y, p["c1_w"], p["c1_b"], padding=2)
    m, inv = _in_stats(y, 4, 32)
    y = _apply_in_relu(y, m, inv, p["in1"]["scale"], p["in1"]["bias"], 4)

    y = conv2d(y, p["c2_w"], p["c2_b"], padding=((1, 0), (1, 0)))
    m, inv = _in_stats(y, 1, 64)
    y = _apply_in_relu(y, m, inv, p["in2"]["scale"], p["in2"]["bias"], 1)

    y = conv2d(y, p["c3_w"], p["c3_b"], stride=2, padding=1)
    m, inv = _in_stats(y, 1, 128)
    y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)

    for i in range(1, 6):
        rp = p[f"res{i}"]
        r = conv2d(y, rp["conv1"]["w"], rp["conv1"]["b"], padding=1)
        m, inv = _in_stats(r, 1, 128)
        r = _apply_in_relu(r, m, inv, rp["norm1"]["scale"],
                           rp["norm1"]["bias"], 1)
        r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"], padding=1)
        m, inv = _in_stats(r, 1, 128)
        r = _apply_in_relu(r, m, inv, rp["norm2"]["scale"],
                           rp["norm2"]["bias"], 1, relu=False)
        y = r + y

    pd = p["d1_pad"]
    y = conv2d(y, p["d1_w"], p["d1_b"], padding=(pd, pd))
    m, inv = _in_stats(y, 4, 64)
    y = d2s(y, 2, 64)                             # [B, hp/2, wp/2, 64]
    y = _apply_in_relu(y, m, inv, p["in_d1"]["scale"], p["in_d1"]["bias"], 1)

    pd = p["d2_pad"]
    y = conv2d(y, p["d2_w"], p["d2_b"], padding=(pd, pd))
    m, inv = _in_stats(y, 4, 32)
    y = _apply_in_relu(y, m, inv, p["in_d2"]["scale"], p["in_d2"]["bias"], 4)

    hb = hp // 2
    rows = conv2d(y, p["d3_w"], padding=(2, 2))   # [B, hp/2+4, wp/2, 60]
    y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
            for dy in range(5))
    y = y + p["d3_b"].astype(y.dtype)
    out = d2s(y, 2, 3)                            # [B, hp, wp, 3]
    return out[:, _PAD : _PAD + h, _PAD : _PAD + w, :]
