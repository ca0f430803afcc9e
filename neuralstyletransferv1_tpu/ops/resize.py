"""Resize kernels (NHWC / HWC).

- ``upsample_nearest`` is the exact integer-factor nearest upsample used inside
  the stylizers (reference: transformer_net.py:96 ``interpolate(mode='nearest',
  scale_factor=2)`` and model.py:96 ``nn.Upsample(scale_factor=2)``). Expressed
  as a repeat so XLA lowers it to a broadcast (no gather).
- ``resize_bilinear`` / ``resize_nearest`` use the half-pixel convention
  (matches cv2.resize INTER_LINEAR and torch align_corners=False), via
  ``jax.image.resize``.
"""

import jax
import jax.numpy as jnp


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Exact nearest-neighbor integer upsample of NHWC by ``factor``."""
    x = jnp.repeat(x, factor, axis=-3)
    x = jnp.repeat(x, factor, axis=-2)
    return x


def _resize(x: jnp.ndarray, out_hw: tuple[int, int], method: str) -> jnp.ndarray:
    nd = x.ndim
    shape = list(x.shape)
    shape[nd - 3] = out_hw[0]
    shape[nd - 2] = out_hw[1]
    return jax.image.resize(x, tuple(shape), method=method)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (half-pixel centers) of NHWC/HWC to (H, W)."""
    return _resize(x, out_hw, "linear")


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (half-pixel centers) of NHWC/HWC to (H, W)."""
    return _resize(x, out_hw, "nearest")


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True convention
    (src = dst * (in-1)/(out-1)). Used by DeepLabV3+ (reference:
    modeling/deeplab.py:31, aspp.py:81, decoder.py:39)."""
    oh, ow = out_hw
    nd = x.ndim
    if nd == 3:
        x = x[None]
    n, h, w, c = x.shape
    ys = jnp.arange(oh, dtype=jnp.float32) * ((h - 1) / max(oh - 1, 1))
    xs = jnp.arange(ow, dtype=jnp.float32) * ((w - 1) / max(ow - 1, 1))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    # interpolate in the input dtype (weights cast like jax.image.resize
    # does): a bf16 input stays bf16 end-to-end instead of materializing
    # f32 intermediates at full resolution (mk44)
    fy = (ys - y0)[None, :, None, None].astype(x.dtype)
    fx = (xs - x0)[None, None, :, None].astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    out = top * (1 - fy) + bot * fy
    if nd == 3:
        out = out[0]
    return out.astype(x.dtype)
