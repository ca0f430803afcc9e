"""Bilinear sampling / warping kernels (NHWC / HWC).

``warp_flow`` replaces the reference's ``cv2.remap`` flow warp
(reference: pipeline.py:425-439 — map = grid + flow, INTER_LINEAR,
BORDER_REPLICATE). ``rotate_image`` replaces ``cv2.warpAffine`` rotation used
for mask animation (reference: region_blend.py:25-47).

All are expressed as gathers with static shapes so they fuse under jit; no
host round-trip per frame.
"""

import jax.numpy as jnp


def bilinear_sample(
    img: jnp.ndarray,
    map_x: jnp.ndarray,
    map_y: jnp.ndarray,
    *,
    border: str = "replicate",
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Sample ``img`` (HWC or HW) at float coords (map_x, map_y), bilinear.

    border: "replicate" clamps coords (cv2.BORDER_REPLICATE);
            "constant" uses ``border_value`` outside (cv2.BORDER_CONSTANT).
    Returns an array shaped like ``map_x`` (+ channel dim if img has one).
    """
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    h, w = img.shape[0], img.shape[1]
    x = map_x.astype(jnp.float32)
    y = map_y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    # One flattened 1-D take per corner: XLA:TPU lowers a 1-D gather of
    # [H*W, C] ~2x faster than the equivalent 2-D coordinate gather
    # (measured 68 → 34 ms at 1080p; /tmp/bench_r2 ablation 7).
    flat = img.reshape(h * w, img.shape[2])
    out_shape = x.shape

    def gather(yi, xi):
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        idx = (yc * w + xc).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(*out_shape, img.shape[2])

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy

    if border == "constant":
        inside = ((x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1))[..., None]
        out = jnp.where(inside, out, jnp.asarray(border_value, out.dtype))
    if squeeze:
        out = out[..., 0]
    return out.astype(img.dtype)


def warp_flow(img: jnp.ndarray, flow: jnp.ndarray, *, border: str = "replicate") -> jnp.ndarray:
    """Warp HWC image by dense flow (H, W, 2) where flow[y, x] = (dx, dy).

    Samples img at (x + dx, y + dy) — identical to the reference's
    grid-plus-flow cv2.remap call (pipeline.py:430-438).
    """
    h, w = flow.shape[0], flow.shape[1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    map_x = gx + flow[..., 0]
    map_y = gy + flow[..., 1]
    return bilinear_sample(img, map_x, map_y, border=border)


def warp_flow_packed(
    img: jnp.ndarray,
    flow: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Fast replicate-border flow warp: one gather of corner-packed rows.

    XLA:TPU gather cost is dominated by index-row count, not bytes
    (mk39 A/B @1080p: 4x [H*W,3] gathers = 35.8 ms; 1x [H*W,12] packed
    gather = 15.7 ms bf16 / see PERF.md round-4). The image is pre-packed
    channel-wise with its x+1 / y+1 / x+1,y+1 neighbors (edge-clamped
    shifted copies — dense, bandwidth-cheap) so all four bilinear corners
    arrive in a single take().

    Semantics vs ``warp_flow``: identical wherever the sampled SOURCE
    point lies >=1px inside the right/bottom edges; samples at/over those
    edges use pre-clamped coords (clip to [0, W-1-0.001]) so the packed
    neighbor IS the replicate-clamped corner — cost is a 0.1% blend toward
    the second-to-last texel there, max |diff| <= 2e-3 (tests/test_warp.py). ``dtype=bfloat16`` halves gather bytes;
    corner values round to bf16 (<= 2^-9 abs error on [0,1] inputs) and
    are blended in f32. Use for quality-gated paths (the temporal flow-EMA
    scan); parity paths keep ``warp_flow``.
    """
    h, w = flow.shape[0], flow.shape[1]
    c = img.shape[-1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.clip(gx + flow[..., 0], 0.0, w - 1.001)
    y = jnp.clip(gy + flow[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    px = jnp.concatenate(
        [img, jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)], axis=-1)
    p = jnp.concatenate(
        [px, jnp.concatenate([px[1:], px[-1:]], axis=0)], axis=-1)
    flat = p.astype(dtype).reshape(h * w, 4 * c)

    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(-1)
    g = jnp.take(flat, idx, axis=0).reshape(h, w, 4 * c).astype(jnp.float32)
    v00, v01 = g[..., :c], g[..., c:2 * c]
    v10, v11 = g[..., 2 * c:3 * c], g[..., 3 * c:]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def warp_flow_packed_u8(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Fastest replicate-border flow warp for [0,1]-ranged images.

    Same corner-packing idea as ``warp_flow_packed`` but each channel's four
    bilinear corners are quantized to uint8 and bit-packed into ONE int32 —
    the gather moves [H*W, C] i32 rows (12 B/row for RGB vs bf16x12's 24)
    and the unpack is VPU shifts. mk46 @1080p serialized chain:
    bf16x12 16.0 ms/warp, u8x12 12.0, **i32x3 10.2** — row bytes and lane
    count both price the gather.

    Quality: corners round to u8 (max 1/510 ≈ 2e-3 per corner on [0,1])
    on top of ``warp_flow_packed``'s border contract (exact >=1px inside
    the right/bottom source edges; 0.1% pre-clamp blend at them). Inputs
    are clipped to [0,1] before quantization. mk46 measured MAE 6.2e-4 vs
    the exact warp on uniform noise (the bf16 form: 4.4e-4). For
    quality-gated paths only (the temporal flow-EMA scan rides it;
    ``--exact_warp`` recovers ``warp_flow``).
    """
    h, w = flow.shape[0], flow.shape[1]
    c = img.shape[-1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.clip(gx + flow[..., 0], 0.0, w - 1.001)
    y = jnp.clip(gy + flow[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    px = jnp.concatenate(
        [img, jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)], axis=-1)
    p = jnp.concatenate(
        [px, jnp.concatenate([px[1:], px[-1:]], axis=0)], axis=-1)
    q = jnp.round(jnp.clip(p, 0.0, 1.0) * 255.0).astype(jnp.int32)
    packed = (q[..., :c] | (q[..., c:2 * c] << 8)
              | (q[..., 2 * c:3 * c] << 16) | (q[..., 3 * c:] << 24))

    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(-1)
    g = jnp.take(packed.reshape(h * w, c), idx, axis=0).reshape(h, w, c)
    s = jnp.float32(1.0 / 255.0)
    v00 = (g & 0xFF).astype(jnp.float32) * s
    v01 = ((g >> 8) & 0xFF).astype(jnp.float32) * s
    v10 = ((g >> 16) & 0xFF).astype(jnp.float32) * s
    v11 = ((g >> 24) & 0xFF).astype(jnp.float32) * s
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def rotate_image(
    img: jnp.ndarray,
    angle_deg: jnp.ndarray | float,
    *,
    border: str = "constant",
    border_value: float = 0.0,
) -> jnp.ndarray:
    """Rotate HWC/HW image about its center by ``angle_deg`` (counter-clockwise
    for positive angles, matching cv2.getRotationMatrix2D + warpAffine).
    """
    h, w = img.shape[0], img.shape[1]
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    gx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    gy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    # Inverse rotation: source = R(-theta) @ dest.
    map_x = cos * gx - sin * gy + cx
    map_y = sin * gx + cos * gy + cy
    return bilinear_sample(img, map_x, map_y, border=border, border_value=border_value)
