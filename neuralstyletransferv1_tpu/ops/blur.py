"""Separable Gaussian blur (NHWC / HWC / HW), matching cv2.GaussianBlur.

Used for mask feathering (reference: region_blend.py:69-103 — sigma = px/3),
motion-map smoothing (reference: pipeline.py:2075 — sigma 3.0) and flow-field
smoothing. Implemented as two 1-D depthwise convolutions so XLA keeps it on
the VPU with one pass per axis.
"""

import math

import jax.numpy as jnp
from jax import lax

from .. import config


def gaussian_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    """cv2.getGaussianKernel-compatible 1-D kernel (normalized, float32)."""
    if sigma <= 0:
        # cv2 convention: derive sigma from kernel size.
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    xs = jnp.arange(ksize, dtype=jnp.float32) - half
    k = jnp.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _ksize_for_sigma(sigma: float) -> int:
    # cv2 picks ksize from sigma when ksize=0: round(sigma*(3..4))*2+1.
    # Use the f32 rule (3 sigma each side), forced odd.
    k = int(math.ceil(sigma * 3.0)) * 2 + 1
    return max(k, 3)


def gaussian_blur(
    x: jnp.ndarray,
    sigma: float,
    *,
    ksize: int | None = None,
) -> jnp.ndarray:
    """Gaussian blur over the spatial dims of HW / HWC / NHWC input.

    Border handling is reflect-101 (cv2.BORDER_DEFAULT).
    """
    if sigma <= 0 and not ksize:
        return x
    if ksize is None:
        ksize = _ksize_for_sigma(sigma)
    k = gaussian_kernel_1d(ksize, sigma)
    orig_ndim = x.ndim
    orig_dtype = x.dtype
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[None]
    n, h, w, c = x.shape
    pad = ksize // 2
    xf = x.astype(jnp.float32)
    # reflect-101: mirror about the edge pixel (np.pad mode="reflect").
    xf = jnp.pad(xf, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # Depthwise separable: treat channels via feature_group_count.
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    # Input is pre-padded on both axes; each 1-D pass consumes one axis' pad.
    y = lax.conv_general_dilated(
        xf, kh, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
        precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    y = lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
        precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    if orig_ndim == 2:
        y = y[0, :, :, 0]
    elif orig_ndim == 3:
        y = y[0]
    return y.astype(orig_dtype)
