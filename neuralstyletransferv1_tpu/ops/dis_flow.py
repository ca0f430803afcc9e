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

# Iteration engine: the Pallas per-patch-block kernel (all Gauss-Newton
# iterations VMEM-resident; interpret-mode on CPU) vs the XLA
# selection-einsum loop. Flip for A/B (experiments/mk23_ab_dis.py).
_ITER_PALLAS = True

# Neighborhood source: pre-warp I1 by the dense init flow (static strided
# windows, no per-patch gather) vs the per-patch integer-init gather.
_PREWARP = True


def _iter_kernel(nb_ref, t_ref, g_ref, scal_ref, o0_ref, out_ref, *,
                 iters: int, R: int):
    """All Gauss-Newton iterations for one 128-patch block, in VMEM.

    Patch-lane layout: lane p = one patch; nb (NBW, NBW, 128) is its
    pre-gathered I1 neighborhood, t/gx/gy (P, P, 128) the template and its
    gradients, scal (4, 128) = hxx, hxy, hyy, 1/det, o0 (2, 128) the init
    offset (u - lo) in [0, 2R). The separable one-hot bilinear selection
    runs as lane-broadcast fma chains (the XLA form materialized
    [ny,nx,NSEL,P,NBW] stacks in HBM every iteration — PERF.md round 2b).
    Writes (4, 128): ox, oy, residual, junk.
    """
    NSEL = 2 * R + 1
    nb = nb_ref[0]                                    # (NBW, NBW, 128)
    t = t_ref[0]                                      # (P, P, 128)
    gx = g_ref[0, 0]                                  # (P, P, 128)
    gy = g_ref[0, 1]
    hxx = scal_ref[0, 0:1]                            # (1, 128)
    hxy = scal_ref[0, 1:2]
    hyy = scal_ref[0, 2:3]
    inv_det = scal_ref[0, 3:4]
    hi = 2 * R - 1e-3

    def warp(o):
        """o (2,128) offset -> warped (P, P, 128) via separable one-hot
        bilinear row/col selection (exactly _sel/warp_from_nb)."""
        ox = o[0:1]
        oy = o[1:2]
        iy = jnp.floor(oy)
        fy = oy - iy
        ix = jnp.floor(ox)
        fx = ox - ix
        rows = []
        for i in range(PATCH):
            acc = None
            for a in range(NSEL):
                wa = jnp.where(iy == float(a), 1.0 - fy,
                               jnp.where(iy == float(a - 1), fy, 0.0))
                term = nb[a + i] * wa                  # (NBW,128)*(1,128)
                acc = term if acc is None else acc + term
            rows.append(acc)                           # (NBW, 128)
        out_rows = []
        for j in range(PATCH):
            accs = []
            for b in range(NSEL):
                wb = jnp.where(ix == float(b), 1.0 - fx,
                               jnp.where(ix == float(b - 1), fx, 0.0))
                accs.append(wb)                        # (1, 128)
            col = []
            for i in range(PATCH):
                acc = None
                for b in range(NSEL):
                    term = rows[i][b + j : b + j + 1] * accs[b]
                    acc = term if acc is None else acc + term
                col.append(acc)                        # (1, 128)
            out_rows.append(jnp.concatenate(col, 0))   # (P, 128)
        return jnp.stack(out_rows, 1)                  # (P, P, 128)

    def body(_, o):
        warped = warp(o)
        r = warped - t
        j0 = jnp.sum((gx * r).reshape(PATCH * PATCH, 128), axis=0,
                     keepdims=True)                    # (1, 128)
        j1 = jnp.sum((gy * r).reshape(PATCH * PATCH, 128), axis=0,
                     keepdims=True)
        du_x = (hyy * j0 - hxy * j1) * inv_det
        du_y = (hxx * j1 - hxy * j0) * inv_det
        du_x = jnp.clip(du_x, -PATCH / 2, PATCH / 2)
        du_y = jnp.clip(du_y, -PATCH / 2, PATCH / 2)
        return jnp.concatenate(
            [jnp.clip(o[0:1] - du_x, 0.0, hi),
             jnp.clip(o[1:2] - du_y, 0.0, hi)], 0)

    o = jax.lax.fori_loop(0, iters, body, o0_ref[0])
    res = jnp.mean(jnp.abs(warp(o) - t).reshape(PATCH * PATCH, 128), axis=0,
                   keepdims=True)
    out_ref[0, 0:2] = o
    out_ref[0, 2:3] = res
    out_ref[0, 3:4] = res


def _iter_search_pallas(nb, t_patches, gx_p, gy_p, hxx, hxy, hyy, det, u0, lo,
                        iters: int, R: int):
    """Run the per-patch iteration loop as a Pallas TPU kernel.

    nb: [ny,nx,NBW,NBW]; t/gx/gy: [ny,nx,P,P]; scalars [ny,nx]; u0/lo
    [ny,nx,2]. Returns (u [ny,nx,2], res [ny,nx]).
    """
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = nb.shape[0], nb.shape[1]
    NBW = nb.shape[2]
    NP = ny * nx
    NB = -(-NP // 128)
    pad = NB * 128 - NP

    def to_lanes(x, inner):
        flat = x.reshape((NP,) + inner)
        flat = jnp.pad(flat, ((0, pad),) + ((0, 0),) * len(inner))
        perm = (0,) + tuple(range(2, 2 + len(inner))) + (1,)
        return flat.reshape((NB, 128) + inner).transpose(perm)

    nb_l = to_lanes(nb, (NBW, NBW))                    # (NB, NBW, NBW, 128)
    t_l = to_lanes(t_patches, (PATCH, PATCH))
    g_l = jnp.stack([to_lanes(gx_p, (PATCH, PATCH)),
                     to_lanes(gy_p, (PATCH, PATCH))], 1)
    inv_det = 1.0 / det
    scal = jnp.stack([hxx, hxy, hyy, inv_det], -1)     # (ny, nx, 4)
    scal_l = to_lanes(scal, (4,))                      # (NB, 4, 128)
    o0 = jnp.moveaxis(u0 - lo, -1, 0).reshape(2, NP)
    o0_l = jnp.pad(o0, ((0, 0), (0, pad))).reshape(2, NB, 128) \
        .transpose(1, 0, 2)                            # (NB, 2, 128)

    kern = _partial(_iter_kernel, iters=iters, R=R)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, NBW, NBW, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PATCH, PATCH, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, PATCH, PATCH, 128), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 4, 128), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nb_l, t_l, g_l, scal_l, o0_l)

    o = out[:, 0:2].transpose(1, 0, 2).reshape(2, NB * 128)[:, :NP]
    o = jnp.moveaxis(o.reshape(2, ny, nx), 0, -1)      # (ny, nx, 2)
    res = out[:, 2].reshape(NB * 128)[:NP].reshape(ny, nx)
    return o + lo, res


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

    if _PREWARP:
        # ---- pre-warp: I1 warped ONCE by the dense init flow, so every
        # patch's ±R neighborhood is a STATIC strided window — the 3.1M-
        # element per-patch gather (the round-2b cost that remained after
        # the gather-free iterations) becomes one h*w dense warp plus 2*NBW
        # strided slice copies. The per-pixel init also beats the old
        # per-patch integer rounding when the init flow varies inside a
        # patch (the search solves the same bounded residual).
        i1w = _warp_scalar(i1, fy_init)
        i1p = jnp.pad(i1w, R, mode="edge")
        rowsA = jnp.stack(
            [i1p[t : t + STRIDE * (ny - 1) + 1 : STRIDE] for t in range(NBW)],
            1,
        )                                                  # [ny, NBW, w+2R]
        nb = jnp.stack(
            [rowsA[:, :, s : s + STRIDE * (nx - 1) + 1 : STRIDE]
             for s in range(NBW)],
            -1,
        ).transpose(0, 2, 1, 3)                            # [ny,nx,NBW,NBW]
        lo = u0 - R                                        # fractional center
        hi = lo + (2 * R - 1e-3)
    else:
        # ---- one-time neighborhood gather around the integer init ----
        by = jnp.round(u0[..., 1]).astype(jnp.int32)      # [ny,nx]
        bx = jnp.round(u0[..., 0]).astype(jnp.int32)
        row_base = ys[:, None] + by - R                    # [ny,nx]
        col_base = xs[None, :] + bx - R
        rr = jnp.clip(row_base[..., None] + jnp.arange(NBW), 0, h - 1)
        cc = jnp.clip(col_base[..., None] + jnp.arange(NBW), 0, w - 1)
        lin_idx = rr[..., :, None] * w + cc[..., None, :]  # [ny,nx,NBW,NBW]
        nb = jnp.take(i1.reshape(-1), lin_idx.reshape(-1), axis=0).reshape(
            ny, nx, NBW, NBW)

        # representable displacement range per patch (nb covers it exactly)
        lo = jnp.stack([(bx - R).astype(jnp.float32),
                        (by - R).astype(jnp.float32)], -1)
        hi = lo + (2 * R - 1e-3)

    if _ITER_PALLAS:
        # all iterations in one VMEM-resident Pallas kernel per patch block
        # — the XLA form below re-materializes [ny,nx,NSEL,P,NBW] HBM
        # stacks every iteration.
        u, res = _iter_search_pallas(nb, t_patches, gx_p, gy_p,
                                     hxx, hxy, hyy, det, u0, lo, iters, R)
        wgt = 1.0 / (1.0 + res * res)
        return _densify(u, wgt, h, w)

    # iteration-invariant row-shift stack: nbs[..,a,i,:] = nb[.., a+i, :]
    nbs = jnp.stack([nb[:, :, a:a + PATCH, :] for a in range(NSEL)], axis=2)

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
    return _densify(u, wgt, h, w)


def _densify(u, wgt, h, w):
    """Scatter-free densification: with stride 4 and 8x8 patches, pixel
    (y, x) is covered by exactly the patches (y//4, x//4) and their -1
    neighbors, so the weighted accumulation is a x4 nearest-upsample plus
    one shifted add per axis — pure dense VPU work (the old .at[].add
    scatter of ny*nx*64 elements was the densification cost on TPU;
    identical math, float add order aside)."""
    ny, nx = u.shape[0], u.shape[1]
    P = jnp.concatenate([u * wgt[..., None], wgt[..., None]], -1)  # [ny,nx,3]
    U = jnp.repeat(jnp.repeat(P, PATCH // 2, 0), PATCH // 2, 1)    # [4ny,4nx,3]
    U = jnp.pad(U, ((0, h - (PATCH // 2) * ny), (0, w - (PATCH // 2) * nx),
                    (0, 0)))
    C = U + jnp.pad(U, ((0, 0), (PATCH // 2, 0), (0, 0)))[:, :w]
    A = C + jnp.pad(C, ((PATCH // 2, 0), (0, 0), (0, 0)))[:h]
    return A[..., :2] / jnp.clip(A[..., 2:], 1e-8, None)


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
    plays after DIS inverse search). Like cv2, I1 is warped ONCE at the
    input flow and every fixed-point iteration works on that fixed
    linearization (cv2's VariationalRefinement::calc warps a single time
    and its fixed-point loop only re-estimates the robust weights); the
    data residual at u is it0 + ∇I·(u − u0). This also removes the
    per-iteration dense gather — mk36 measured the re-warping form at
    ~21 ms/pair of the 42 ms DIS budget @1080p B8 (batched gathers under
    vmap are the slowest op class on TPU; PERF.md round-4).
    """
    i1w = _warp_scalar(i1, flow)
    gy0, gx0 = jnp.gradient(i1w)
    it0 = i1w - i0
    u0 = flow

    def step(k, u):
        gx, gy = gx0, gy0
        it = it0 + gx * (u[..., 0] - u0[..., 0]) + gy * (u[..., 1] - u0[..., 1])
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

    # Output smoothing runs at the FINEST PYRAMID LEVEL, before the
    # upsample: the patch-grid blockiness it exists to remove (cv2 does not
    # blur dis.calc output — smooth_sigma is our cv2-closeness smoothing)
    # lives at the densification grid's resolution, and blurring there is
    # 2^(2*finest_scale)x cheaper than at full res (mk36: the full-res blur
    # was 3.7 ms of the 42 ms/pair @1080p). Blur commutes with the linear
    # upsample+scale; the cv2 oracle tests hold at the same tolerances.
    if smooth_sigma > 0:
        flow = gaussian_blur(flow, smooth_sigma)
    scale = H / flow.shape[0]
    flow = resize_bilinear(flow, (H, W)) * scale
    return flow
