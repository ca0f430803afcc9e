"""Johnson fast-style TransformerNet, TPU-native.

Topology parity with the reference's PyTorch definition
(reference: transformer_net.py:4-99):
  conv9x9 s1 3→32 · conv3x3 s2 32→64 · conv3x3 s2 64→128   (reflect pad k//2,
  each followed by affine InstanceNorm + ReLU)
  5 × residual blocks (conv3x3+IN+ReLU, conv3x3+IN, additive skip)
  2 × (nearest ×2 upsample → conv3x3 → IN → ReLU)  128→64→32
  conv9x9 32→3, no output activation.

Checkpoints use keys ``conv1.conv2d.weight`` / ``in1.weight`` …
(detected by the reference at pipeline.py:76-79); the importer maps them onto
this module's param tree 1:1.

Layout: NHWC activations, HWIO weights. All convs accumulate in f32 on the
MXU; activations may be bf16 for throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d
from ..ops.norm import instance_norm
from ..ops.pad import reflect_pad_2d
from ..ops.resize import upsample_nearest

# (name, in_ch, out_ch, ksize, stride)
_DOWN = [("conv1", 3, 32, 9, 1), ("conv2", 32, 64, 3, 2), ("conv3", 64, 128, 3, 2)]
_DOWN_IN = ["in1", "in2", "in3"]
_NUM_RES = 5
_UP = [("deconv1", 128, 64, 3, 2), ("deconv2", 64, 32, 3, 2)]  # last field = upsample factor
_UP_IN = ["in4", "in5"]
_FINAL = ("deconv3", 32, 3, 9, 1)


def _conv_params(rng, cin, cout, k):
    # Torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    # b = 1/sqrt(fan_in) * sqrt(3) * sqrt(2/(1+5))  -> U(+-sqrt(1/fan_in)).
    kw, kb = jax.random.split(rng)
    fan_in = cin * k * k
    bound = (1.0 / fan_in) ** 0.5
    w = jax.random.uniform(kw, (k, k, cin, cout), jnp.float32, -bound * 3**0.5, bound * 3**0.5)
    b = jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _in_params(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init(rng: jax.Array) -> dict:
    """Random params with torch-equivalent shapes/init."""
    params: dict = {}
    keys = jax.random.split(rng, 32)
    ki = iter(range(32))
    for (name, cin, cout, k, _s), in_name in zip(_DOWN, _DOWN_IN):
        params[name] = _conv_params(keys[next(ki)], cin, cout, k)
        params[in_name] = _in_params(cout)
    for i in range(1, _NUM_RES + 1):
        params[f"res{i}"] = {
            "conv1": _conv_params(keys[next(ki)], 128, 128, 3),
            "in1": _in_params(128),
            "conv2": _conv_params(keys[next(ki)], 128, 128, 3),
            "in2": _in_params(128),
        }
    for (name, cin, cout, k, _f), in_name in zip(_UP, _UP_IN):
        params[name] = _conv_params(keys[next(ki)], cin, cout, k)
        params[in_name] = _in_params(cout)
    name, cin, cout, k, _s = _FINAL
    params[name] = _conv_params(keys[next(ki)], cin, cout, k)
    return params


def _conv_block(p_conv, p_in, x, k, stride):
    y = reflect_pad_2d(x, k // 2)
    y = conv2d(y, p_conv["w"], p_conv["b"], stride=stride)
    y = instance_norm(y, p_in["scale"], p_in["bias"])
    return jax.nn.relu(y)


def _res_block(p, x):
    y = _conv_block(p["conv1"], p["in1"], x, 3, 1)
    y = reflect_pad_2d(y, 1)
    y = conv2d(y, p["conv2"]["w"], p["conv2"]["b"])
    y = instance_norm(y, p["in2"]["scale"], p["in2"]["bias"])
    return y + x


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass. x: NHWC float (scale per IO preset, typically 0..255
    for raw_255 checkpoints). Output same shape, un-activated.
    """
    y = x
    for (name, _ci, _co, k, s), in_name in zip(_DOWN, _DOWN_IN):
        y = _conv_block(params[name], params[in_name], y, k, s)
    for i in range(1, _NUM_RES + 1):
        y = _res_block(params[f"res{i}"], y)
    for (name, _ci, _co, k, f), in_name in zip(_UP, _UP_IN):
        y = upsample_nearest(y, f)
        y = _conv_block(params[name], params[in_name], y, k, 1)
    name, _ci, _co, k, s = _FINAL
    y = reflect_pad_2d(y, k // 2)
    y = conv2d(y, params[name]["w"], params[name]["b"], stride=s)
    return y
