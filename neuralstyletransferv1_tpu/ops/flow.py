"""Dense optical flow (Farneback) as a pure XLA program.

Replaces ``cv2.calcOpticalFlowFarneback`` (reference: pipeline.py:1894-1899,
params 0.5/3/15/3/5/1.1/0; also scripts/morph_v2.py:391-403) — the one native
kernel the reference's temporal path depends on that has no library
equivalent on TPU.

Algorithm (Farneback 2003, structured like OpenCV's implementation):
1. Per level: smooth the ORIGINAL image with sigma=(1/scale-1)*0.5 and
   bilinear-resize to the level (OpenCV builds its pyramid this way, not by
   cumulative pyrDown).
2. Quadratic polynomial expansion per pixel: f(p+w) ≈ c1 + c2·x + c3·y +
   c4·x² + c5·y² + c6·xy under Gaussian applicability (poly_n, poly_sigma).
   Moments come from separable 1-D convolutions with {g, x·g, x²·g}; the
   6×6 normal matrix G is constant and precomputed, so coefficients are one
   small matmul per pixel.
3. Displacement iteration: fetch the second image's coefficients at p+d
   (rounded, clamped), form A=(A1+A2)/2, Δb=A·d−0.5(b2−b1), box-filter the
   normal equations over winsize, solve the 2×2 system per pixel.
4. Upsample flow ×2 between levels (values scaled by 1/pyr_scale).

Everything is static-shaped and jittable; levels/iterations are Python
loops over static bounds (unrolled by trace).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import config
from .resize import resize_bilinear


def _poly_exp_setup(n: int, sigma: float):
    """Precompute the applicability kernels and G^-1 for the basis
    [1, x, y, x^2, y^2, xy]."""
    xs = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = xs * g
    xxg = xs * xs * g
    # G is separable over the 2-D window with a(x,y)=g(x)g(y).
    s0 = g.sum()  # == 1
    s2 = (xs**2 * g).sum()
    s4 = (xs**4 * g).sum()
    # Nonzero entries of G for basis [1, x, y, x2, y2, xy]:
    # G[0,0]=1, G[1,1]=G[2,2]=s2, G[0,3]=G[0,4]=s2, G[3,3]=G[4,4]=s4,
    # G[3,4]=s2*s2, G[5,5]=s2*s2.
    G = np.zeros((6, 6))
    G[0, 0] = s0 * s0
    G[1, 1] = G[2, 2] = s2
    G[0, 3] = G[3, 0] = G[0, 4] = G[4, 0] = s2
    G[3, 3] = G[4, 4] = s4
    G[3, 4] = G[4, 3] = s2 * s2
    G[5, 5] = s2 * s2
    Ginv = np.linalg.inv(G)
    return (
        jnp.asarray(g, jnp.float32),
        jnp.asarray(xg, jnp.float32),
        jnp.asarray(xxg, jnp.float32),
        jnp.asarray(Ginv, jnp.float32),
    )


def _sep_conv(img: jnp.ndarray, kx: jnp.ndarray, ky: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation with replicate border, HW input."""
    n = (kx.shape[0] - 1) // 2
    xp = jnp.pad(img, ((n, n), (n, n)), mode="edge")[None, :, :, None]
    kyv = ky.reshape(-1, 1, 1, 1)
    kxv = kx.reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        xp, kyv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        precision=config.conv_precision, preferred_element_type=jnp.float32,
    )
    y = lax.conv_general_dilated(
        y, kxv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        precision=config.conv_precision, preferred_element_type=jnp.float32,
    )
    return y[0, :, :, 0]


def poly_expansion(img: jnp.ndarray, n: int, sigma: float):
    """Per-pixel quadratic coefficients (c2..c6): returns (b, A) where
    b = (fx, fy) [H,W,2] and A [H,W,2,2] symmetric."""
    g, xg, xxg, Ginv = _poly_exp_setup(n, sigma)
    # Moment vector v_k = sum_w a(w) basis_k(w) f(p+w), separable:
    m00 = _sep_conv(img, g, g)
    m10 = _sep_conv(img, xg, g)  # x moment
    m01 = _sep_conv(img, g, xg)  # y moment
    m20 = _sep_conv(img, xxg, g)
    m02 = _sep_conv(img, g, xxg)
    m11 = _sep_conv(img, xg, xg)
    v = jnp.stack([m00, m10, m01, m20, m02, m11], axis=-1)  # [H,W,6]
    c = v @ Ginv.T  # coefficients [c1, c2(x), c3(y), c4(x2), c5(y2), c6(xy)]
    b = c[..., 1:3]
    A = jnp.stack(
        [
            jnp.stack([c[..., 3], c[..., 5] * 0.5], -1),
            jnp.stack([c[..., 5] * 0.5, c[..., 4]], -1),
        ],
        axis=-2,
    )
    return b, A


def _box_filter(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Normalized k×k box filter with replicate border on [H,W,C]."""
    p = k // 2
    xp = jnp.pad(x, ((p, p), (p, p), (0, 0)), mode="edge")[None]
    kern = jnp.ones((k, 1, 1, 1), jnp.float32) / k
    dn = ("NHWC", "HWIO", "NHWC")
    c = x.shape[-1]
    kh = jnp.tile(kern, (1, 1, 1, c))
    kw = jnp.transpose(kh, (1, 0, 2, 3))
    y = lax.conv_general_dilated(
        xp, kh, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    y = lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c, precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    return y[0]


def _gather_at_flow(field: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Fetch field[...] at integer-rounded p+flow, clamped (OpenCV
    updateMatrices semantics). field: [H,W,...], flow: [H,W,2] (dx,dy)."""
    H, W = field.shape[0], field.shape[1]
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xi = jnp.clip(jnp.round(gx + flow[..., 0]), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(gy + flow[..., 1]), 0, H - 1).astype(jnp.int32)
    return field[yi, xi]


def _flow_level(b1, A1, b2, A2, flow, winsize: int, iterations: int):
    """Displacement iterations at one pyramid level."""
    for _ in range(iterations):
        b2w = _gather_at_flow(b2, flow)
        A2w = _gather_at_flow(A2, flow)
        A = (A1 + A2w) * 0.5  # [H,W,2,2]
        db = jnp.einsum("hwij,hwj->hwi", A, flow) - 0.5 * (b2w - b1)
        # Normal equations: (A^T A) d = A^T db, aggregated over the window.
        ATA = jnp.einsum("hwki,hwkj->hwij", A, A)
        ATb = jnp.einsum("hwki,hwk->hwi", A, db)
        stats = jnp.concatenate(
            [ATA.reshape(*ATA.shape[:2], 4), ATb], axis=-1
        )  # [H,W,6]
        stats = _box_filter(stats, winsize)
        M = stats[..., :4].reshape(*stats.shape[:2], 2, 2)
        v = stats[..., 4:6]
        det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
        det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        inv00 = M[..., 1, 1] / det
        inv01 = -M[..., 0, 1] / det
        inv11 = M[..., 0, 0] / det
        dx = inv00 * v[..., 0] + inv01 * v[..., 1]
        dy = inv01 * v[..., 0] + inv11 * v[..., 1]
        flow = jnp.stack([dx, dy], axis=-1)
    return flow


def farneback_flow(
    prev_gray: jnp.ndarray,
    curr_gray: jnp.ndarray,
    *,
    pyr_scale: float = 0.5,
    levels: int = 3,
    winsize: int = 15,
    iterations: int = 3,
    poly_n: int = 5,
    poly_sigma: float = 1.1,
) -> jnp.ndarray:
    """Dense flow prev→curr on grayscale [H,W] images (0..255 or 0..1 scale).

    Returns [H, W, 2] with flow[y, x] = (dx, dy), cv2-compatible convention.
    """
    from .blur import gaussian_blur

    H, W = prev_gray.shape
    f1 = prev_gray.astype(jnp.float32)
    f2 = curr_gray.astype(jnp.float32)

    # Level geometry (static).
    level_shapes = []
    for k in range(levels):
        scale = pyr_scale ** k
        lh, lw = int(round(H * scale)), int(round(W * scale))
        if min(lh, lw) < max(poly_n * 2 + 1, winsize):
            break
        level_shapes.append((lh, lw, scale))

    flow = None
    for lh, lw, scale in reversed(level_shapes):
        sigma = (1.0 / scale - 1.0) * 0.5
        if sigma > 0.01:
            i1 = gaussian_blur(f1, sigma)
            i2 = gaussian_blur(f2, sigma)
        else:
            i1, i2 = f1, f2
        i1 = resize_bilinear(i1[..., None], (lh, lw))[..., 0]
        i2 = resize_bilinear(i2[..., None], (lh, lw))[..., 0]

        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            flow = resize_bilinear(flow, (lh, lw)) * (1.0 / pyr_scale)

        b1, A1 = poly_expansion(i1, poly_n, poly_sigma)
        b2, A2 = poly_expansion(i2, poly_n, poly_sigma)
        flow = _flow_level(b1, A1, b2, A2, flow, winsize, iterations)

    if flow is None:
        return jnp.zeros((H, W, 2), jnp.float32)
    if flow.shape[:2] != (H, W):
        flow = resize_bilinear(flow, (H, W)) * (H / flow.shape[0])
    return flow
