"""ReCoNet in f=2 block form — the TPU speed path for the reconet backend.

Same math as models/reconet.apply (reference: model.py:75-116): the Johnson
restructure family applied to ReCoNet's channel plan (48/96/192, 4 res
blocks, nearest-up decoder, tanh output, IN+ReLU or FRN+TLU norms).
Reflect-padded convs use the zero-SAME + border-strip-fixup pattern of
transformer_net_s2d2 (conv1/final) and the phase/edge halo builders of
transformer_net_s2d (stride-2 and upsample layers). Instance norms run as
deferred stats; FRN's nu2 is deferred the same way (per logical channel
across phases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.pad import reflect_pad_2d
from .transformer_net_s2d import (
    _pad_edge_blocks,
    _pad_stride2_halo,
    _scatter_stride2_s2d2,
    _scatter_upconv,
    d2s,
    s2d,
)
from .transformer_net_s2d2 import (
    _conv1_same_fixed,
    _pad_reflect_f2_4px,
    _scatter_k9_f2,
)

_EPS = 1e-5


def from_reconet_params(p: dict) -> dict:
    g = lambda a: np.asarray(a, np.float32)  # noqa: E731
    enc, res = p["encoder"][:3], p["encoder"][3:]
    dec = p["decoder"]
    out: dict = {"frn": bool(p.get("frn", False))}
    out["c1_w"] = _scatter_k9_f2(g(enc[0]["conv"]["w"]))
    out["c1_b"] = np.tile(g(enc[0]["conv"]["b"]), 4)
    out["n1"] = jax.tree.map(g, enc[0]["norm"])
    out["c2_w"] = _scatter_stride2_s2d2(g(enc[1]["conv"]["w"]))
    out["c2_b"] = g(enc[1]["conv"]["b"])
    out["n2"] = jax.tree.map(g, enc[1]["norm"])
    out["c3_w"] = g(enc[2]["conv"]["w"])
    out["c3_b"] = g(enc[2]["conv"]["b"])
    out["n3"] = jax.tree.map(g, enc[2]["norm"])
    out["res"] = [jax.tree.map(g, r) for r in res]
    out["d1_w"] = _scatter_upconv(g(dec[0]["conv"]["w"]))
    out["d1_b"] = np.tile(g(dec[0]["conv"]["b"]), 4)
    out["nd1"] = jax.tree.map(g, dec[0]["norm"])
    out["d2_w"] = _scatter_upconv(g(dec[1]["conv"]["w"]))
    out["d2_b"] = np.tile(g(dec[1]["conv"]["b"]), 4)
    out["nd2"] = jax.tree.map(g, dec[1]["norm"])
    w5 = _scatter_k9_f2(g(dec[2]["conv"]["w"]))       # (5,5,192,12)
    w_row = np.zeros((1, 5, w5.shape[2], 60), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * 12 : (dy + 1) * 12] = w5[dy]
    out["d3_w"] = w_row
    out["d3_b"] = np.tile(g(dec[2]["conv"]["b"]), 4)
    return jax.tree.map(jnp.asarray, out)


def _stats(x, phases, c, frn):
    """Deferred per-logical-channel norm stats: (a, b) with norm(x)=a*x+b."""
    b, hb, wb, _ = x.shape
    xr = x.reshape(b, hb, wb, phases, c).astype(jnp.float32)
    if frn:
        nu2 = jnp.mean(jnp.square(xr), axis=(1, 2, 3))
        return jnp.zeros_like(nu2), jax.lax.rsqrt(nu2 + _EPS)
    mean = jnp.mean(xr, axis=(1, 2, 3))
    var = jnp.mean(jnp.square(xr), axis=(1, 2, 3)) - mean * mean
    return mean, jax.lax.rsqrt(var + _EPS)


def _apply(x, m, inv, nrm, phases, frn, *, act=True):
    sc = nrm["scale"].astype(jnp.float32)
    bi = nrm["bias"].astype(jnp.float32)
    a = jnp.tile(inv * sc, (1, phases))[:, None, None, :]
    bb = jnp.tile(bi - m * inv * sc, (1, phases))[:, None, None, :]
    y = x.astype(jnp.float32) * a + bb
    if act:
        if frn:
            tau = jnp.tile(nrm["tau"].astype(jnp.float32), phases)
            y = jnp.maximum(y, tau)
        else:
            y = jax.nn.relu(y)
    return y.astype(x.dtype)


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC float in [-1,1] → stylized NHWC in [-1,1]. H, W divisible by 4."""
    p = params
    frn = bool(p["frn"])
    b, h, w, _ = x.shape
    hb = h // 2
    ys = s2d(x, 2)
    if h >= 16 and w >= 16:
        y = _conv1_same_fixed(ys, p["c1_w"], p["c1_b"])
    else:
        y = conv2d(_pad_reflect_f2_4px(ys, 3), p["c1_w"], p["c1_b"])
    m, inv = _stats(y, 4, 48, frn)
    y = _pad_stride2_halo(y, 48)
    y = _apply(y, m, inv, p["n1"], 4, frn)

    y = conv2d(y, p["c2_w"], p["c2_b"])               # [B, H/2, W/2, 96]
    m, inv = _stats(y, 1, 96, frn)
    y = reflect_pad_2d(y, 1)
    y = _apply(y, m, inv, p["n2"], 1, frn)

    y = conv2d(y, p["c3_w"], p["c3_b"], stride=2)     # [B, H/4, W/4, 192]
    m, inv = _stats(y, 1, 192, frn)
    y = _apply(y, m, inv, p["n3"], 1, frn)

    for rp in p["res"]:
        r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"], rp["conv1"]["b"])
        m, inv = _stats(r, 1, 192, frn)
        r = _apply(r, m, inv, rp["norm1"], 1, frn)
        r = conv2d(reflect_pad_2d(r, 1), rp["conv2"]["w"], rp["conv2"]["b"])
        m, inv = _stats(r, 1, 192, frn)
        r = _apply(r, m, inv, rp["norm2"], 1, frn, act=False)
        y = y + r
        # post-skip activation (reference: model.py:57-60)
        if frn:
            y = jnp.maximum(y.astype(jnp.float32),
                            rp["act"]["tau"].astype(jnp.float32)) \
                .astype(y.dtype)
        else:
            y = jax.nn.relu(y)

    y = _pad_edge_blocks(y)
    y = conv2d(y, p["d1_w"], p["d1_b"])               # [B, H/4, W/4, 384]
    m, inv = _stats(y, 4, 96, frn)
    y = d2s(y, 2, 96)                                 # [B, H/2, W/2, 96]
    y = _apply(y, m, inv, p["nd1"], 1, frn)

    y = _pad_edge_blocks(y)
    y = conv2d(y, p["d2_w"], p["d2_b"])               # [B, H/2, W/2, 192]
    m, inv = _stats(y, 4, 48, frn)
    y = _apply(y, m, inv, p["nd2"], 4, frn)

    if hb >= 8 and (w // 2) >= 8:
        def _d3_strip(sl):
            ps = _pad_reflect_f2_4px(sl, 48)
            rs = conv2d(ps, p["d3_w"])
            n = rs.shape[1] - 4
            return sum(rs[:, dy : dy + n, :, dy * 12 : (dy + 1) * 12]
                       for dy in range(5))
        top = _d3_strip(y[:, :4])[:, :2]
        bot = _d3_strip(y[:, -4:])[:, -2:]
        lef = _d3_strip(y[:, :, :4])[:, :, :2]
        rig = _d3_strip(y[:, :, -4:])[:, :, -2:]
        rows = conv2d(y, p["d3_w"], padding=(2, 2))
        y12 = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                  for dy in range(5))
        y12 = y12.at[:, :2].set(top)
        y12 = y12.at[:, -2:].set(bot)
        y12 = y12.at[:, :, :2].set(lef)
        y12 = y12.at[:, :, -2:].set(rig)
    else:
        yp = _pad_reflect_f2_4px(y, 48)
        rows = conv2d(yp, p["d3_w"])
        y12 = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                  for dy in range(5))
    y12 = y12 + p["d3_b"].astype(y12.dtype)
    return jnp.tanh(d2s(y12, 2, 3))