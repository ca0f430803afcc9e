"""ReCoNet stylizer, TPU-native.

Topology parity with the reference (reference: model.py:75-116):
  Encoder: ConvNorm 3→48 k9 s1 · 48→96 k3 s2 · 96→192 k3 s2 · 4 × ResLayer(192)
  Decoder: ×2 nearest upsample · ConvNorm 192→96 · ×2 upsample · ConvNorm 96→48
           · conv9 48→3 + tanh
All convs are reflect-padded k//2 (reference: model.py:5-15). Norm is affine
InstanceNorm+ReLU, or FRN+TLU when ``frn=True`` (reference: frn.py:7-78;
ResLayer applies activation *after* the additive skip, model.py:57-60).

Runtime contract matches the reference wrapper (reference: lib.py:27-51 and
utils.py:99-106): uint8 NHWC → /255 → x*2-1 → net → (y+1)/2 → *255 uint8.
Here :func:`apply` is the pure float core (NHWC in [-1, 1] → [-1, 1]); use
:func:`run_u8` for the wrapper semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d
from ..ops.norm import frn as frn_op
from ..ops.norm import instance_norm, tlu
from ..ops.pad import reflect_pad_2d
from ..ops.resize import upsample_nearest

_ENC = [(3, 48, 9, 1), (48, 96, 3, 2), (96, 192, 3, 2)]
_NUM_RES = 4
_DEC = [(192, 96, 3), (96, 48, 3)]
_FINAL = (48, 3, 9)


def _conv_params(rng, cin, cout, k):
    kw, kb = jax.random.split(rng)
    fan_in = cin * k * k
    bound = (1.0 / fan_in) ** 0.5
    w = jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound * 3**0.5, bound * 3**0.5)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _norm_params(c, use_frn):
    p = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    if use_frn:
        p["tau"] = jnp.zeros((c,), jnp.float32)
    return p


def init(rng: jax.Array, *, frn: bool = False) -> dict:
    keys = iter(jax.random.split(rng, 24))
    params: dict = {"frn": frn, "encoder": [], "decoder": []}
    for cin, cout, k, _s in _ENC:
        params["encoder"].append(
            {"conv": _conv_params(next(keys), cin, cout, k), "norm": _norm_params(cout, frn)}
        )
    for _ in range(_NUM_RES):
        params["encoder"].append(
            {
                "conv1": _conv_params(next(keys), 192, 192, 3),
                "norm1": _norm_params(192, frn),
                "conv2": _conv_params(next(keys), 192, 192, 3),
                "norm2": _norm_params(192, frn),
                "act": _norm_params(192, frn) if frn else None,
            }
        )
    for cin, cout, k in _DEC:
        params["decoder"].append(
            {"conv": _conv_params(next(keys), cin, cout, k), "norm": _norm_params(cout, frn)}
        )
    cin, cout, k = _FINAL
    params["decoder"].append({"conv": _conv_params(next(keys), cin, cout, k)})
    return params


def _conv(p, x, k, stride=1):
    y = reflect_pad_2d(x, k // 2)
    return conv2d(y, p["w"], p["b"], stride=stride)


def _norm_act(p, x, use_frn, activation=True):
    if use_frn:
        y = frn_op(x, p["scale"], p["bias"])
        return tlu(y, p["tau"]) if activation else y
    y = instance_norm(x, p["scale"], p["bias"])
    return jax.nn.relu(y) if activation else y


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """NHWC float in [-1, 1] → stylized NHWC in [-1, 1] (tanh output)."""
    use_frn = bool(params.get("frn", False))
    y = x
    for p, (_ci, _co, k, s) in zip(params["encoder"][:3], _ENC):
        y = _norm_act(p["norm"], _conv(p["conv"], y, k, s), use_frn)
    for p in params["encoder"][3:]:
        r = _norm_act(p["norm1"], _conv(p["conv1"], y, 3), use_frn)
        r = _norm_act(p["norm2"], _conv(p["conv2"], r, 3), use_frn, activation=False)
        y = y + r
        # Post-skip activation (reference: model.py:57-60).
        y = tlu(y, p["act"]["tau"]) if use_frn else jax.nn.relu(y)
    for p, (_ci, _co, k) in zip(params["decoder"][:2], _DEC):
        y = upsample_nearest(y, 2)
        y = _norm_act(p["norm"], _conv(p["conv"], y, k, 1), use_frn)
    y = _conv(params["decoder"][2]["conv"], y, _FINAL[2])
    return jnp.tanh(y)


def run_u8(params: dict, images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC → stylized uint8 NHWC (reference: lib.py:27-51)."""
    x = images_u8.astype(jnp.float32) / 255.0
    y = apply(params, x * 2.0 - 1.0)
    y01 = (y + 1.0) / 2.0
    return jnp.clip(y01 * 255.0, 0, 255).astype(jnp.uint8)
