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
