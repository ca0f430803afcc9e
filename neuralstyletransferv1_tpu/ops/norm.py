"""Normalization kernels (NHWC).

Instance norm is the stylizers' dominant non-conv op (reference:
transformer_net.py:9-24 uses ``InstanceNorm2d(affine=True)`` after every
conv). On TPU it is a per-(N,C) spatial reduction + rescale — XLA fuses it
into the surrounding convs' epilogue, so a plain jnp expression is already
near bandwidth-optimal; stats are computed in f32 regardless of input dtype
for parity with torch.

FRN/TLU follow the ReCoNet option (reference: frn.py:7-78).
"""

import jax
import jax.numpy as jnp


def instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Affine instance normalization over spatial dims of NHWC input.

    Matches ``torch.nn.InstanceNorm2d(C, affine=True)`` (eps=1e-5, biased
    variance).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def frn(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Filter Response Normalization: x * rsqrt(mean(x^2) + |eps|) * w + b.

    Spatial mean per (N, C) (reference: frn.py:60-78).
    """
    x32 = x.astype(jnp.float32)
    nu2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    y = x32 * jax.lax.rsqrt(nu2 + abs(eps))
    y = weight.astype(jnp.float32) * y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def tlu(x: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """Thresholded linear unit: max(x, tau) (reference: frn.py:7-23)."""
    return jnp.maximum(x, tau.astype(x.dtype))
