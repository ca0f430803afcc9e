"""DIS optical flow (Dense Inverse Search), TPU-native.

Replaces ``cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_FAST)`` — the
reference's *default* flow method (reference: pipeline.py:1905-1917,
``--flow_method dis`` default at :2230). Algorithm after Kroeger et al. 2016:

1. image pyramid (factor 2), coarse → fine, finest level at 1/2^finest_scale
   resolution (PRESET_FAST uses finest_scale=2, patch 8, stride 4);
2. per level, a regular grid of 8×8 patches runs inverse-compositional
   Lucas-Kanade on its own displacement — all patches as one batched
   ``fori_loop`` (no per-patch host work);
3. densification: each pixel averages the displacements of the patches
   covering it, weighted by the inverse photometric residual;
4. flow upsamples ×2 between levels (values scaled accordingly).

5. variational refinement at the finest level: a robust (Charbonnier)
   brightness-constancy + smoothness energy minimized by lagged-diffusivity
   fixed-point iterations (the cv2 preset runs an equivalent Brox-style
   refinement after the inverse search).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .blur import gaussian_blur
from .resize import resize_bilinear

PATCH = 8
STRIDE = 4


def _level_sizes(H, W, finest_scale, coarsest_px=16):
    """Static list of pyramid levels, coarse→fine, finest = 1/2^finest_scale."""
    sizes = []
    k = finest_scale
    while True:
        h, w = H >> k, W >> k
        if min(h, w) < coarsest_px or k > 10:
            break
        sizes.append((h, w, k))
        k += 1
    return sizes[::-1]  # coarse → fine


def _grid_centers(h, w):
    ys = jnp.arange(0, h - PATCH + 1, STRIDE)
    xs = jnp.arange(0, w - PATCH + 1, STRIDE)
    return ys, xs


def _extract_patches(img, ys, xs):
    """[(len(ys)*len(xs)), PATCH, PATCH] patch stack via dynamic slices."""
    def one_row(y):
        def one(x):
            return lax.dynamic_slice(img, (y, x), (PATCH, PATCH))

        return jax.vmap(one)(xs)

    return jax.vmap(one_row)(ys)  # [ny, nx, P, P]


def _bilinear_patch(img, y0, x0):
    """Sample a PATCH×PATCH window at float offset (y0, x0), clamped.

    Flattened 1-D takes: under the per-patch vmaps these batch into single
    large gathers, which XLA:TPU lowers ~2x faster than 2-D coordinate
    gathers (same finding as ops/warp.bilinear_sample)."""
    h, w = img.shape
    yy = jnp.clip(y0 + jnp.arange(PATCH, dtype=jnp.float32)[:, None], 0.0, h - 1.001)
    xx = jnp.clip(x0 + jnp.arange(PATCH, dtype=jnp.float32)[None, :], 0.0, w - 1.001)
    yi = jnp.floor(yy).astype(jnp.int32)
    xi = jnp.floor(xx).astype(jnp.int32)
    fy = yy - yi
    fx = xx - xi
    flat = img.reshape(-1)
    n = h * w

    def take(yo, xo):
        idx = jnp.minimum(yi + yo, h - 1) * w + jnp.minimum(xi + xo, w - 1)
        return jnp.take(flat, jnp.minimum(idx.reshape(-1), n - 1), axis=0).reshape(PATCH, PATCH)

    v00 = take(0, 0)
    v01 = take(0, 1)
    v10 = take(1, 0)
    v11 = take(1, 1)
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


# Per-level refinement radius (px) around the init displacement. The
# gather-free iterations pre-gather a (PATCH+2R)² neighborhood per patch, so
# each level can correct the pyramid init by at most ±R px (the old
# per-iteration-gather code allowed PATCH/2 per iteration cumulatively).
# Motion that each coarser level underestimates by more than R px per level
# is unrecoverable; raise via dis_flow(nb_radius=...) to trade speed for
# range (cost grows ~(PATCH+2R)²).
NB_RADIUS = 6


def _inverse_search_level(i0, i1, flow_init, iters: int, nb_radius: int = NB_RADIUS):
    """One pyramid level: batched per-patch inverse search + densification.

    Gather-free iterations: the search window is bounded — each patch refines at
    most ±NB_RADIUS px around its coarse-level init — so a (P+2R)×(P+2R)
    neighborhood of I1 is gathered ONCE per patch, and every Gauss-Newton
    iteration samples its warped 8×8 window from that neighborhood with
    *separable one-hot bilinear selection* (13 row + 13 col static-shift
    terms, all dense VPU work). This removed the per-iteration gathers that
    dominated dis_flow (PERF.md: XLA:TPU gathers sustain only ~0.1-0.7 M
    elements/ms; the two finest levels' iterations were ~270 of 397 ms at
    1080p).
    """
    h, w = i0.shape
    ys, xs = _grid_centers(h, w)
    ny, nx = ys.shape[0], xs.shape[0]
    R = nb_radius
    NBW = PATCH + 2 * R                       # neighborhood width (20)
    NSEL = 2 * R + 1                          # selector length (13)

    # Template patches + gradients (inverse-compositional: gradients of I0).
    t_patches = _extract_patches(i0, ys, xs)  # [ny,nx,P,P]
    gy_img, gx_img = jnp.gradient(i0)
    gx_p = _extract_patches(gx_img, ys, xs)
    gy_p = _extract_patches(gy_img, ys, xs)
    # 2x2 Hessian per patch.
    hxx = jnp.sum(gx_p * gx_p, axis=(2, 3))
    hxy = jnp.sum(gx_p * gy_p, axis=(2, 3))
    hyy = jnp.sum(gy_p * gy_p, axis=(2, 3))
    det = hxx * hyy - hxy * hxy
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)

    # init displacement per patch from flow_init sampled at patch centers.
    cy = ys.astype(jnp.float32) + PATCH / 2.0
    cx = xs.astype(jnp.float32) + PATCH / 2.0
    fy_init = resize_bilinear(flow_init, (h, w)) if flow_init.shape[:2] != (h, w) else flow_init
    u0 = jax.vmap(lambda y: jax.vmap(lambda x: fy_init[
        jnp.clip(y.astype(jnp.int32), 0, h - 1), jnp.clip(x.astype(jnp.int32), 0, w - 1)
    ])(cx))(cy)  # [ny,nx,2] (dx,dy)

    y0f = ys.astype(jnp.float32)[:, None] + jnp.zeros((1, nx))
    x0f = xs.astype(jnp.float32)[None, :] + jnp.zeros((ny, 1))

    # ---- one-time neighborhood gather around the integer init ----
    by = jnp.round(u0[..., 1]).astype(jnp.int32)          # [ny,nx]
    bx = jnp.round(u0[..., 0]).astype(jnp.int32)
    row_base = ys[:, None] + by - R                        # [ny,nx]
    col_base = xs[None, :] + bx - R
    rr = jnp.clip(row_base[..., None] + jnp.arange(NBW), 0, h - 1)  # [ny,nx,NBW]
    cc = jnp.clip(col_base[..., None] + jnp.arange(NBW), 0, w - 1)
    lin_idx = rr[..., :, None] * w + cc[..., None, :]      # [ny,nx,NBW,NBW]
    nb = jnp.take(i1.reshape(-1), lin_idx.reshape(-1), axis=0).reshape(
        ny, nx, NBW, NBW)
    # iteration-invariant row-shift stack: nbs[..,a,i,:] = nb[.., a+i, :]
    nbs = jnp.stack([nb[:, :, a:a + PATCH, :] for a in range(NSEL)], axis=2)

    # representable displacement range per patch (the nb covers it exactly)
    lo = jnp.stack([(bx - R).astype(jnp.float32),
                    (by - R).astype(jnp.float32)], -1)
    hi = lo + (2 * R - 1e-3)

    def _sel(frac):
        """[ny,nx] float offset in [0, 2R) -> [ny,nx,NSEL] bilinear one-hot."""
        i = jnp.floor(frac)
        f = frac - i
        pos = jnp.arange(NSEL, dtype=jnp.float32)
        d = pos[None, None, :] - i[..., None]
        return jnp.where(d == 0.0, 1.0 - f[..., None],
                         jnp.where(d == 1.0, f[..., None], 0.0))

    def warp_from_nb(u):
        oy = jnp.clip(u[..., 1] - lo[..., 1], 0.0, 2 * R - 1e-3)
        ox = jnp.clip(u[..., 0] - lo[..., 0], 0.0, 2 * R - 1e-3)
        rsel = _sel(oy)                                     # [ny,nx,NSEL]
        csel = _sel(ox)
        tmp = jnp.einsum("yxa,yxaij->yxij", rsel, nbs)      # [ny,nx,P,NBW]
        tmps = jnp.stack([tmp[..., b:b + PATCH] for b in range(NSEL)], axis=2)
        return jnp.einsum("yxb,yxbij->yxij", csel, tmps)    # [ny,nx,P,P]

    def body(_, u):
        warped = warp_from_nb(u)
        r = warped - t_patches
        J0 = jnp.sum(gx_p * r, axis=(2, 3))
        J1 = jnp.sum(gy_p * r, axis=(2, 3))
        du_x = (hyy * J0 - hxy * J1) / det
        du_y = (hxx * J1 - hxy * J0) / det
        # Damped step, clipped to patch radius for stability.
        step = jnp.stack([du_x, du_y], -1)
        step = jnp.clip(step, -PATCH / 2, PATCH / 2)
        return jnp.clip(u - step, lo, hi)

    u = lax.fori_loop(0, iters, body, u0)

    # Densification: residual-weighted average of covering patches.
    res = jnp.mean(jnp.abs(warp_from_nb(u) - t_patches), axis=(2, 3))
    wgt = 1.0 / (1.0 + res * res)  # [ny,nx]

    # Densification scatter, flattened to 1-D linear indices (like the
    # gathers above, 1-D scatters lower markedly faster on TPU).
    ys_i = ys[:, None] + jnp.arange(PATCH)[None, :]  # [ny,P]
    xs_i = xs[:, None] + jnp.arange(PATCH)[None, :]
    yy = jnp.broadcast_to(ys_i[:, None, :, None], (ny, nx, PATCH, PATCH)).reshape(-1)
    xx = jnp.broadcast_to(xs_i[None, :, None, :], (ny, nx, PATCH, PATCH)).reshape(-1)
    uu = jnp.broadcast_to(u[:, :, None, None, :], (ny, nx, PATCH, PATCH, 2)).reshape(-1, 2)
    ww = jnp.broadcast_to(wgt[:, :, None, None], (ny, nx, PATCH, PATCH)).reshape(-1)
    lin = yy * w + xx
    flow_acc = jnp.zeros((h * w, 2), jnp.float32).at[lin].add(uu * ww[:, None])
    w_acc = jnp.zeros((h * w, 1), jnp.float32).at[lin].add(ww[:, None])
    return (flow_acc / jnp.clip(w_acc, 1e-8, None)).reshape(h, w, 2)


def _warp_scalar(img, flow):
    """Bilinear warp of a 2-D image by flow (dx, dy), clamped borders."""
    h, w = img.shape
    yy, xx = jnp.mgrid[0:h, 0:w]
    return _bilinear_dense(img, yy + flow[..., 1], xx + flow[..., 0])


def _bilinear_dense(img, y, x):
    h, w = img.shape
    y = jnp.clip(y, 0.0, h - 1.001)
    x = jnp.clip(x, 0.0, w - 1.001)
    yi = jnp.floor(y).astype(jnp.int32)
    xi = jnp.floor(x).astype(jnp.int32)
    fy = y - yi
    fx = x - xi
    flat = img.reshape(-1)

    def take(yo, xo):
        idx = jnp.minimum(yi + yo, h - 1) * w + jnp.minimum(xi + xo, w - 1)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(y.shape)

    v00 = take(0, 0)
    v01 = take(0, 1)
    v10 = take(1, 0)
    v11 = take(1, 1)
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


def variational_refine(
    i0: jnp.ndarray,
    i1: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    fixed_point_iters: int = 5,
    alpha: float = 12.0,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Robust brightness-constancy + smoothness refinement of a flow field.

    Minimizes Σ Ψ(I1(x+u) − I0) + α Σ Ψ(|∇u|²) with Charbonnier Ψ via
    lagged-diffusivity fixed point (the role cv2's VariationalRefinement
    plays after DIS inverse search). Each iteration relinearizes at the
    warped position, computes robust data/smoothness weights, and takes a
    Jacobi step toward the stationary point — all in-graph.
    """
    def step(k, u):
        i1w = _warp_scalar(i1, u)
        gy, gx = jnp.gradient(i1w)
        it = i1w - i0
        wd = jax.lax.rsqrt(it * it + eps)  # robust data weight
        # edge-aware diffusivity from flow gradients
        duy, dux = jnp.gradient(u[..., 0])
        dvy, dvx = jnp.gradient(u[..., 1])
        ws = jax.lax.rsqrt(duy**2 + dux**2 + dvy**2 + dvx**2 + eps)
        # neighborhood average (4-neighbor, edge-replicated)
        def nb_avg(f):
            up = jnp.concatenate([f[:1], f[:-1]], 0)
            dn = jnp.concatenate([f[1:], f[-1:]], 0)
            lf = jnp.concatenate([f[:, :1], f[:, :-1]], 1)
            rt = jnp.concatenate([f[:, 1:], f[:, -1:]], 1)
            return (up + dn + lf + rt) / 4.0

        ubar = jnp.stack([nb_avg(u[..., 0]), nb_avg(u[..., 1])], -1)
        # robust Horn–Schunck fixed-point update at the relinearized point:
        # (Ix·du + Iy·dv + It) with du = u_new − u ⇒ solve per-pixel.
        g2 = gx * gx + gy * gy
        denom = alpha * ws + wd * g2
        num = wd * (gx * (ubar[..., 0] - u[..., 0]) + gy * (ubar[..., 1] - u[..., 1]) - it)
        common = num / jnp.maximum(denom, 1e-6)
        u_new_x = ubar[..., 0] * (alpha * ws / jnp.maximum(denom, 1e-6)) + \
            (u[..., 0] + gx * common) * (wd * g2 / jnp.maximum(denom, 1e-6))
        u_new_y = ubar[..., 1] * (alpha * ws / jnp.maximum(denom, 1e-6)) + \
            (u[..., 1] + gy * common) * (wd * g2 / jnp.maximum(denom, 1e-6))
        return jnp.stack([u_new_x, u_new_y], -1)

    return lax.fori_loop(0, fixed_point_iters, step, flow)


def dis_flow(
    prev_gray: jnp.ndarray,
    curr_gray: jnp.ndarray,
    *,
    finest_scale: int = 2,
    iters: int = 16,
    refine_iters: int = 5,
    smooth_sigma: float = 1.0,
    nb_radius: int = NB_RADIUS,
) -> jnp.ndarray:
    """Dense flow prev→curr, cv2 convention (flow[y,x] = (dx, dy)).

    PRESET_FAST-like defaults: finest level at quarter resolution, 8×8
    patches stride 4, 16 inverse-search iterations per level, then
    variational refinement at the finest level. ``nb_radius`` bounds each
    level's correction of the coarse init (speed/range tradeoff — see
    NB_RADIUS).
    """
    H, W = prev_gray.shape
    i0 = prev_gray.astype(jnp.float32)
    i1 = curr_gray.astype(jnp.float32)
    levels = _level_sizes(H, W, finest_scale)
    if not levels:
        return jnp.zeros((H, W, 2), jnp.float32)

    flow = None
    for lh, lw, k in levels:
        a = resize_bilinear(i0[..., None], (lh, lw))[..., 0]
        b = resize_bilinear(i1[..., None], (lh, lw))[..., 0]
        if flow is None:
            flow = jnp.zeros((lh, lw, 2), jnp.float32)
        else:
            flow = resize_bilinear(flow, (lh, lw)) * 2.0
        flow = _inverse_search_level(a, b, flow, iters, nb_radius)

    if refine_iters > 0:
        lh, lw, _ = levels[-1]
        a = resize_bilinear(i0[..., None], (lh, lw))[..., 0]
        b = resize_bilinear(i1[..., None], (lh, lw))[..., 0]
        flow = variational_refine(a, b, flow, fixed_point_iters=refine_iters)

    scale = H / flow.shape[0]
    flow = resize_bilinear(flow, (H, W)) * scale
    if smooth_sigma > 0:
        flow = gaussian_blur(flow, smooth_sigma)
    return flow
