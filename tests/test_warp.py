"""warp_flow_packed — the corner-packed fast warp vs the exact gather.

The packed form (ops/warp.py) is the temporal flow-EMA scan's fast path
(mk39 A/B: 35.8 -> 15.7 ms @1080p). Contract: interior exact up to the
storage dtype's rounding; borders within the pre-clamp epsilon; replicate
semantics match cv2.BORDER_REPLICATE like ``warp_flow`` does.
"""

import numpy as np

import jax.numpy as jnp

from neuralstyletransferv1_tpu.ops.warp import (
    warp_flow, warp_flow_packed, warp_flow_packed_u8)


def _data(h=64, w=96, seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.random((h, w, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, scale, (h, w, 2)), jnp.float32)
    return img, flow


def test_packed_f32_exact_off_edge():
    """Exact wherever the sampled SOURCE point stays >=1px inside the
    right/bottom edges; elsewhere only the 1e-3 pre-clamp epsilon."""
    img, flow = _data()
    base = np.asarray(warp_flow(img, flow))
    fast = np.asarray(warp_flow_packed(img, flow, dtype=jnp.float32))
    d = np.abs(fast - base)
    h, w = d.shape[:2]
    gx = np.arange(w)[None, :] + np.asarray(flow)[..., 0]
    gy = np.arange(h)[:, None] + np.asarray(flow)[..., 1]
    off_edge = (gx < w - 2) & (gy < h - 2)
    assert d[off_edge].max() < 1e-5, d[off_edge].max()
    assert d.max() < 2e-3, d.max()  # edge pre-clamp epsilon only


def test_packed_bf16_bounded():
    img, flow = _data(seed=1)
    base = np.asarray(warp_flow(img, flow))
    fast = np.asarray(warp_flow_packed(img, flow))
    d = np.abs(fast - base)
    # bf16 corner rounding: <= 2^-9 on [0,1] values (convex blend), plus
    # the border epsilon
    assert d[8:-8, 8:-8].max() < 3e-3, d[8:-8, 8:-8].max()
    assert d.max() < 5e-3, d.max()


def test_packed_large_displacement():
    """Flows pushing far outside the frame take the replicate border."""
    img, flow = _data(seed=2, scale=40.0)
    base = np.asarray(warp_flow(img, flow))
    fast = np.asarray(warp_flow_packed(img, flow, dtype=jnp.float32))
    assert np.abs(fast - base).max() < 2e-3


def test_packed_u8_bounded():
    """The i32-packed u8-corner warp (the production fast path, mk46):
    u8 corner quantization <= 1/510 per corner + the border epsilon."""
    img, flow = _data(seed=4)
    base = np.asarray(warp_flow(img, flow))
    fast = np.asarray(warp_flow_packed_u8(img, flow))
    d = np.abs(fast - base)
    assert d[8:-8, 8:-8].max() < 1 / 510 + 1e-4, d[8:-8, 8:-8].max()
    assert d.max() < 4e-3, d.max()
    assert d.mean() < 1.5e-3, d.mean()


def test_packed_u8_zero_flow_roundtrip():
    """Zero flow reproduces the u8-rounded image off the clamp edges."""
    img, _ = _data(seed=5)
    flow = jnp.zeros(img.shape[:2] + (2,), jnp.float32)
    out = np.asarray(warp_flow_packed_u8(img, flow))
    ref = np.round(np.asarray(img) * 255.0) / 255.0
    np.testing.assert_allclose(out[:-1, :-1], ref[:-1, :-1], atol=1e-6)


def test_packed_u8_large_displacement():
    img, flow = _data(seed=6, scale=40.0)
    base = np.asarray(warp_flow(img, flow))
    fast = np.asarray(warp_flow_packed_u8(img, flow))
    assert np.abs(fast - base).max() < 4e-3


def test_packed_zero_flow_identity():
    img, _ = _data(seed=3)
    flow = jnp.zeros(img.shape[:2] + (2,), jnp.float32)
    out = np.asarray(warp_flow_packed(img, flow, dtype=jnp.float32))
    ref = np.asarray(img)
    # exact everywhere except the last row/col, where the pre-clamp
    # interpolates 0.1% toward the second-to-last texel
    np.testing.assert_allclose(out[:-1, :-1], ref[:-1, :-1], atol=1e-6)
    assert np.abs(out - ref).max() < 2e-3
