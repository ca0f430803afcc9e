"""NST_Train-variant TransformerNet, TPU-native.

Topology parity with the reference's second stylizer arch
(reference: transformer_net_nst.py:12-127):
  global ReflectionPad2d(40), cropped back at the end
  down: conv9x9 s1 3→32 · conv3x3 s2 32→64 · conv3x3 s2 64→128
        (zero padding k//2, IN affine, ReLU)
  5 × residual blocks (zero-padded conv3x3)
  up:   2 × ConvTranspose2d(k=3, s=2, p=1, output_padding=1) + IN + ReLU
  final conv9x9 32→3 pad 4, no activation.

Checkpoints use keys ``down1.conv.weight`` / ``down1.norm.weight`` …
(arch detected by ``down1.`` prefix, reference: pipeline.py:76-79); this
variant auto-forces the ``raw_01`` IO preset (reference: pipeline.py:611-614).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, conv_transpose2d_torch
from ..ops.norm import instance_norm
from ..ops.pad import reflect_pad_2d

_PAD = 40
_DOWN = [("down1", 3, 32, 9, 1), ("down2", 32, 64, 3, 2), ("down3", 64, 128, 3, 2)]
_NUM_RES = 5
_UP = [("up1", 128, 64), ("up2", 64, 32)]


def _conv_params(rng, cin, cout, k, *, transpose=False):
    kw, kb = jax.random.split(rng)
    fan_in = (cout if transpose else cin) * k * k
    bound = (1.0 / fan_in) ** 0.5
    shape = (k, k, cout, cin) if transpose else (k, k, cin, cout)
    w = jax.random.uniform(kw, shape, jnp.float32, -bound * 3**0.5, bound * 3**0.5)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _in_params(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init(rng: jax.Array) -> dict:
    params: dict = {}
    keys = iter(jax.random.split(rng, 32))
    for name, cin, cout, k, _s in _DOWN:
        params[name] = {"conv": _conv_params(next(keys), cin, cout, k), "norm": _in_params(cout)}
    for i in range(1, _NUM_RES + 1):
        params[f"res{i}"] = {
            "conv1": _conv_params(next(keys), 128, 128, 3),
            "norm1": _in_params(128),
            "conv2": _conv_params(next(keys), 128, 128, 3),
            "norm2": _in_params(128),
        }
    for name, cin, cout in _UP:
        params[name] = {
            "conv": _conv_params(next(keys), cin, cout, 3, transpose=True),
            "norm": _in_params(cout),
        }
    params["final"] = _conv_params(next(keys), 32, 3, 9)
    return params


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass. x: NHWC float in [0,1] (raw_01 preset). Output NHWC,
    cropped back to the input spatial size (reference:
    transformer_net_nst.py:95-126).
    """
    n, h, w, c = x.shape
    y = reflect_pad_2d(x, _PAD)
    for name, _ci, _co, k, s in _DOWN:
        p = params[name]
        y = conv2d(y, p["conv"]["w"], p["conv"]["b"], stride=s, padding=k // 2)
        y = instance_norm(y, p["norm"]["scale"], p["norm"]["bias"])
        y = jax.nn.relu(y)
    for i in range(1, _NUM_RES + 1):
        p = params[f"res{i}"]
        r = conv2d(y, p["conv1"]["w"], p["conv1"]["b"], padding=1)
        r = instance_norm(r, p["norm1"]["scale"], p["norm1"]["bias"])
        r = jax.nn.relu(r)
        r = conv2d(r, p["conv2"]["w"], p["conv2"]["b"], padding=1)
        r = instance_norm(r, p["norm2"]["scale"], p["norm2"]["bias"])
        y = r + y
    for name, _ci, _co in _UP:
        p = params[name]
        y = conv_transpose2d_torch(y, p["conv"]["w"], p["conv"]["b"], stride=2, padding=1, output_padding=1)
        y = instance_norm(y, p["norm"]["scale"], p["norm"]["bias"])
        y = jax.nn.relu(y)
    y = conv2d(y, params["final"]["w"], params["final"]["b"], padding=4)
    # Crop the padding halo back off (output spatial size == 4*_PAD + input).
    oh, ow = y.shape[1], y.shape[2]
    ch = (oh - h) // 2
    cw = (ow - w) // 2
    return y[:, ch : ch + h, cw : cw + w, :]
