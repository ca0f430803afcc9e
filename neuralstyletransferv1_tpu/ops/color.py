"""Color-space kernels (NHWC / HWC), in-graph.

``rgb_to_lab_u8``/``lab_u8_to_rgb`` reproduce PIL's uint8 "LAB" mode used by
the reference's temporal chroma/lightness smoothing (reference:
pipeline.py:1944-1978 — ``img.convert("LAB")`` → uint8 planes → EMA →
``Image.fromarray(..., "LAB").convert("RGB")``). PIL's convention (verified
empirically against Pillow):
  - sRGB → XYZ with **D50 adaptation** (ICC PCS matrix), white point D50
  - L* in 0..100 scaled to 0..255
  - a*/b* stored as *wrapped* signed int8 (two's complement in a uint8 byte,
    NOT +128 offset): a=-79 → byte 177.
The reference EMAs the raw uint8 planes, so wrap-domain values are what the
temporal stage must see.

``rgb_to_gray`` matches cv2.cvtColor COLOR_RGB2GRAY (BT.601 luma) which feeds
the optical-flow front-end.
"""

import jax.numpy as jnp

# sRGB -> XYZ, D50-adapted (ICC PCS / Bradford), as used by Pillow's LAB mode.
_RGB2XYZ_D50 = jnp.array(
    [
        [0.4360747, 0.3850649, 0.1430804],
        [0.2225045, 0.7168786, 0.0606169],
        [0.0139322, 0.0971045, 0.7141733],
    ],
    dtype=jnp.float32,
)
_XYZ2RGB_D50 = jnp.array(
    [
        [3.1338561, -1.6168667, -0.4906146],
        [-0.9787684, 1.9161415, 0.0334540],
        [0.0719453, -0.2289914, 1.4052427],
    ],
    dtype=jnp.float32,
)
_WHITE_D50 = jnp.array([0.9642, 1.0, 0.8249], dtype=jnp.float32)
_EPS = (6.0 / 29.0) ** 3
_KAPPA_INV = 1.0 / (3.0 * (6.0 / 29.0) ** 2)


def rgb_to_gray(rgb01: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma from RGB (any scale); returns single-channel (…, H, W)."""
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _f(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(t > _EPS, jnp.cbrt(t), t * _KAPPA_INV + 4.0 / 29.0)


def _f_inv(ft: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(ft > 6.0 / 29.0, ft**3, (ft - 4.0 / 29.0) / _KAPPA_INV)


def rgb_to_lab_u8(rgb01: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] (…, 3) → float LAB planes in PIL's uint8 byte scaling.

    Returns float32 (not rounded): L in 0..255; a/b as wrapped signed bytes
    in 0..255. Round+cast to uint8 at the host boundary for byte parity.
    """
    lin = _srgb_to_linear(rgb01.astype(jnp.float32))
    xyz = lin @ _RGB2XYZ_D50.T
    fxyz = _f(xyz / _WHITE_D50)
    fx, fy, fz = fxyz[..., 0], fxyz[..., 1], fxyz[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    # Wrapped int8-in-uint8 byte encoding (PIL convention).
    a_u8 = jnp.mod(jnp.round(a), 256.0)
    b_u8 = jnp.mod(jnp.round(b), 256.0)
    return jnp.stack([L * (255.0 / 100.0), a_u8, b_u8], axis=-1)


def lab_u8_to_rgb(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_lab_u8`; returns RGB float in [0,1]."""
    lab = lab_u8.astype(jnp.float32)
    L = lab[..., 0] * (100.0 / 255.0)
    # Undo the wrapped signed-byte encoding: byte >= 128 means negative.
    a = jnp.mod(lab[..., 1] + 128.0, 256.0) - 128.0
    b = jnp.mod(lab[..., 2] + 128.0, 256.0) - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_f_inv(fx), _f_inv(fy), _f_inv(fz)], axis=-1) * _WHITE_D50
    lin = xyz @ _XYZ2RGB_D50.T
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)
