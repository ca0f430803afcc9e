"""IO-preset normalization — the 7 presets of the reference engine.

Parity with the per-frame preset branches (reference: pipeline.py:1444-1486)
and the auto-resolution table (reference: pipeline.py:2518-2527; NST arch
auto-switch at pipeline.py:610-614). Canonical contract:

  preprocess(preset, x01)  : NHWC float in [0,1] → model input
  postprocess(preset, y)   : model output → NHWC float clipped to [0,1]

All presets are pure elementwise ops; XLA fuses them into the first/last conv
of the stylizer so they are free on TPU.
"""

import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)
CAFFE_MEAN_BGR = jnp.array([103.939, 116.779, 123.68], dtype=jnp.float32)

PRESETS = ("raw_255", "raw_01", "imagenet_255", "imagenet_01", "tanh", "caffe_bgr", "auto")

# Backend → default preset (reference: pipeline.py:2518-2527).
IO_PRESETS = {
    "transformer": "imagenet_255",
    "torch7": "caffe_bgr",
    "magenta": "imagenet_01",
    "reconet": "imagenet_01",
}


def resolve_auto_preset(model_type: str, arch: str | None = None) -> str:
    """Resolve 'auto' → concrete preset for a backend; NST_Train transformer
    checkpoints force raw_01 (reference: pipeline.py:610-614)."""
    if arch == "nst":
        return "raw_01"
    return IO_PRESETS.get(model_type, "imagenet_01")


def preprocess(preset: str, x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC RGB → model-input tensor for ``preset``.

    Constants are cast to the input dtype so the bf16 fast path stays bf16.
    """
    dt = x01.dtype
    if preset == "tanh":
        return x01 * 2.0 - 1.0
    if preset == "imagenet_01":
        return (x01 - IMAGENET_MEAN.astype(dt)) / IMAGENET_STD.astype(dt)
    if preset == "imagenet_255":
        return (x01 * 255.0 - (IMAGENET_MEAN * 255.0).astype(dt)) / (IMAGENET_STD * 255.0).astype(dt)
    if preset == "caffe_bgr":
        x_bgr = x01[..., ::-1] * 255.0
        return x_bgr - CAFFE_MEAN_BGR.astype(dt)
    if preset == "raw_01":
        return x01
    # raw_255 and any unknown preset fall through to the 0..255 branch
    # (reference: pipeline.py:1473-1486 else-branch).
    return x01 * 255.0


def preset_affine(preset: str):
    """The preset's pre/post transforms as per-channel affines + permutations.

    Returns (pre_perm, pre_a, pre_b, post_perm, post_s, post_t) with
      preprocess(x01)  == x01[..., pre_perm] * pre_a + pre_b
      postprocess(y)   == clip(y[..., post_perm] * post_s + post_t, 0, 1)
    (numpy float32 arrays / index lists). Every preset is affine, so the
    stylizer can fold pre into conv1 and post into the last conv — the
    separate elementwise passes vanish (PERF.md round-2c)."""
    import numpy as np

    ident = [0, 1, 2]
    one = np.ones(3, np.float32)
    zero = np.zeros(3, np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    if preset == "tanh":
        return ident, one * 2.0, one * -1.0, ident, one * 0.5, one * 0.5
    if preset == "imagenet_01":
        return ident, 1.0 / std, -mean / std, ident, std, mean
    if preset == "imagenet_255":
        return ident, 1.0 / std, -mean / std, ident, one / 255.0, zero
    if preset == "caffe_bgr":
        mbgr = np.asarray(CAFFE_MEAN_BGR, np.float32)
        return [2, 1, 0], one * 255.0, -mbgr, [2, 1, 0], one / 255.0, zero
    if preset == "raw_01":
        return ident, one, zero, ident, one, zero
    return ident, one * 255.0, zero, ident, one / 255.0, zero  # raw_255


def postprocess(preset: str, y: jnp.ndarray) -> jnp.ndarray:
    """Model output → [0,1] NHWC RGB (clipped)."""
    dt = y.dtype
    if preset == "tanh":
        out = (y + 1.0) * 0.5
    elif preset == "imagenet_01":
        out = y * IMAGENET_STD.astype(dt) + IMAGENET_MEAN.astype(dt)
    elif preset == "imagenet_255":
        out = y / 255.0
    elif preset == "caffe_bgr":
        out = y[..., ::-1] / 255.0
    elif preset == "raw_01":
        out = y
    else:
        out = y / 255.0
    return jnp.clip(out, 0.0, 1.0)
