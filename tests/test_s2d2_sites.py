"""Pallas fused-site kernels (models/s2d2_sites.py) — interpret-mode parity.

The sites are gated OFF in production (PERF.md: layout-boundary tax), but the
kernel library must stay correct for the full-chain round-3 build. Runs the
d3 site in Pallas interpret mode on CPU against the XLA form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralstyletransferv1_tpu.models import s2d2_sites
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2


@pytest.fixture(autouse=True)
def _interpret():
    s2d2_sites._INTERPRET = True
    yield
    s2d2_sites._INTERPRET = False


@pytest.mark.slow
def test_d3_site_parity():
    # tiny geometry: H=56 -> H2=28, HP=32 (TS=8); W=32 -> W2=16 (WP=24)
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))
    x = jax.random.uniform(jax.random.key(1), (2, 56, 32, 3), jnp.bfloat16)

    y_xla = s2d2.apply(bp, x)
    y_fus = s2d2.apply(bp, x, fused_sites=("d3",))
    assert y_fus.shape == y_xla.shape
    mae = float(jnp.mean(jnp.abs(y_xla.astype(jnp.float32)
                                 - y_fus.astype(jnp.float32))))
    assert mae < 2e-2, mae


def test_d3_supported_geometry():
    assert s2d2_sites.d3_supported(540, 960)      # 1080p
    assert s2d2_sites.d3_supported(360, 640)      # 720p: 364 = 7*52
    assert s2d2_sites._pick_ts(544) == 8


@pytest.mark.slow
def test_tail_parity():
    # tiny geometry: H=56 -> H2=28 (28+4=32, 8-aligned), W=64 -> W2=32
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))
    x = jax.random.uniform(jax.random.key(2), (2, 56, 64, 3), jnp.bfloat16)

    y_xla = s2d2.apply(bp, x)
    y_fus = s2d2.apply(bp, x, fused_sites=("tail",))
    assert y_fus.shape == y_xla.shape
    mae = float(jnp.mean(jnp.abs(y_xla.astype(jnp.float32)
                                 - y_fus.astype(jnp.float32))))
    assert mae < 2e-2, mae


def test_tail_supported_geometry():
    assert s2d2_sites.tail_supported(540, 960)    # 1080p
    assert s2d2_sites._tail_geom(540, 960) == (544, 552, 968)
    assert not s2d2_sites.tail_supported(360, 640)   # 364 % 8 != 0: pad frame
    assert not s2d2_sites.tail_supported(538, 960)   # h2+4 % 8 != 0
    assert not s2d2_sites.tail_supported(540, 30)    # w2 % 8 != 0
    assert not s2d2_sites.tail_supported(12, 64)     # too short


@pytest.mark.slow
def test_head_parity():
    # H=56 -> H2=28 (ts2=4), H4=14 (ts3=2); W=64 -> W2=32, W4=16.
    params = transformer_net.init(jax.random.key(0))
    s2d2._BUILD_HEAD_SITE = True   # c3_wb is built on demand
    try:
        bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          s2d2.from_johnson_params(params))
    finally:
        s2d2._BUILD_HEAD_SITE = False
    assert "c3_wb" in bp
    x = jax.random.uniform(jax.random.key(5), (2, 56, 64, 3), jnp.bfloat16)
    y_xla = s2d2.apply(bp, x)
    y_fus = s2d2.apply(bp, x, fused_sites=("head",))
    mae = float(jnp.mean(jnp.abs(y_xla.astype(jnp.float32)
                                 - y_fus.astype(jnp.float32))))
    assert mae < 3e-2, mae
    y_both = s2d2.apply(bp, x, fused_sites=("head", "tail"))
    mae = float(jnp.mean(jnp.abs(y_xla.astype(jnp.float32)
                                 - y_both.astype(jnp.float32))))
    assert mae < 3e-2, mae


def test_head_supported_geometry():
    assert s2d2_sites.head_supported(540, 960)    # 1080p: ts2=12, ts3=10
    assert s2d2_sites._head_geom(540, 960) == (12, 10)
    assert s2d2_sites.head_supported(360, 640)    # 720p
    assert not s2d2_sites.head_supported(540, 30)
    assert not s2d2_sites.head_supported(20, 960)  # too short


def test_bake_io_affine_presets():
    """Folding pre/post preset affines into conv1/deconv3 is exact."""
    from neuralstyletransferv1_tpu.models import io_presets as iop

    params = transformer_net.init(jax.random.key(0))
    bp = s2d2.from_johnson_params(params)        # f32
    x = jax.random.uniform(jax.random.key(6), (1, 56, 64, 3), jnp.float32)
    for preset in ("imagenet_255", "raw_255", "caffe_bgr", "tanh",
                   "imagenet_01", "raw_01"):
        ref = iop.postprocess(preset, s2d2.apply(bp, iop.preprocess(preset, x)))
        got = jnp.clip(s2d2.apply(s2d2.bake_io_affine(bp, preset), x), 0., 1.)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4)


def test_d2_site_halo_buffer():
    """P4's in-kernel reflect halos must reproduce conv + _pad_reflect_f2_4px
    exactly (both compared on the raw d2 conv output)."""
    from neuralstyletransferv1_tpu.models import transformer_net_s2d as s2d1
    from neuralstyletransferv1_tpu.ops.conv import conv2d

    h2, w2 = 28, 32
    ho, hbuf, wp = s2d2_sites._tail_geom(h2, w2)
    k = jax.random.key
    xin = jax.random.normal(k(6), (2, h2 + 2, w2 + 2, 64), jnp.bfloat16)
    a4 = jax.random.uniform(k(7), (2, 64), jnp.float32) + 0.5
    c4 = jax.random.normal(k(8), (2, 64), jnp.float32) * 0.1
    w = jax.random.normal(k(9), (3, 3, 64, 128), jnp.bfloat16) * 0.05
    b = jax.random.normal(k(10), (128,), jnp.float32) * 0.1

    # XLA oracle: apply -> conv -> reflect-halo pad of the raw output
    xa = jnp.maximum(xin.astype(jnp.float32) * a4[:, None, None, :]
                     + c4[:, None, None, :], 0.0).astype(jnp.bfloat16)
    y_ref = conv2d(xa, w, b)
    ref = s2d2._pad_reflect_f2_4px(y_ref, 32)     # (2, h2+4, w2+4, 128)
    m_ref, inv_ref = s2d1._in_stats(y_ref, 4, 32)

    x4 = jnp.pad(xin, ((0, 0), (2, hbuf - h2 - 2), (2, wp - w2 - 4), (0, 0)))
    y5, sout = s2d2_sites._d2_site(
        x4, a4, c4, w.reshape(9, 64, 128), b[None, :],
        h2=h2, w2=w2, hbuf=hbuf, wp=wp)
    got = np.asarray(y5[:, : h2 + 4, : w2 + 4], np.float32)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)
    s1 = jnp.sum(sout[:, 0].reshape(2, 4, 32), axis=1)
    n = float(h2 * w2 * 4)
    np.testing.assert_allclose(np.asarray(s1 / n), np.asarray(m_ref),
                               atol=1e-3, rtol=1e-3)
