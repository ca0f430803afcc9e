"""Grey-scale morphology via windowed max/min reductions (NHWC/HWC/HW).

Replaces cv2.dilate / cv2.erode / cv2.morphologyEx(MORPH_CLOSE) used for
segmentation-mask cleanup (reference: sky_swap.py:204-215) and the iterative
max-pool gap-fill in the region compositor (reference:
region_blend.py:768-810 and 2186-2294).
"""

import jax.numpy as jnp
from jax import lax


def _window_reduce(x: jnp.ndarray, ksize: int, init, op) -> jnp.ndarray:
    orig_ndim = x.ndim
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[None]
    pad = ksize // 2
    y = lax.reduce_window(
        x,
        init,
        op,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    if orig_ndim == 2:
        y = y[0, :, :, 0]
    elif orig_ndim == 3:
        y = y[0]
    return y


def grey_dilate(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Square-structuring-element dilation (max filter)."""
    return _window_reduce(x, ksize, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, lax.max)


def grey_erode(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Square-structuring-element erosion (min filter)."""
    return _window_reduce(x, ksize, jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max, lax.min)


def max_pool_dilate(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Alias used by the region compositor's gap-fill (max-pool dilation)."""
    return grey_dilate(x, ksize)


def morph_close(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Dilate then erode (cv2.MORPH_CLOSE with a square kernel)."""
    return grey_erode(grey_dilate(x, ksize), ksize)
