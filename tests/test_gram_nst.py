"""Slow-NST path: gram math parity with reference helpers + optimization sanity."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_gram_matrix_matches_reference_math(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_path))
    try:
        import utils as ref_utils
    finally:
        sys.path.remove(str(reference_path))

    from neuralstyletransferv1_tpu.models.vgg import gram_matrix

    x = np.random.default_rng(0).standard_normal((2, 9, 11, 7)).astype(np.float32)
    got = np.asarray(gram_matrix(jnp.asarray(x)))
    want = ref_utils.gram_matrix(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vgg_feature_shapes():
    from neuralstyletransferv1_tpu.models import vgg

    params = vgg.init(jax.random.key(0))
    x = jnp.ones((1, 64, 96, 3)) * 0.5
    feats = vgg.extract_features(params, x, vgg.STYLE_LAYERS + (vgg.CONTENT_LAYER,))
    assert feats["relu1_2"].shape == (1, 64, 96, 64)
    assert feats["relu2_2"].shape == (1, 32, 48, 128)
    assert feats["relu3_3"].shape == (1, 16, 24, 256)
    assert feats["relu4_3"].shape == (1, 8, 12, 512)


def test_vgg_torchvision_import_layout():
    from neuralstyletransferv1_tpu.models import vgg

    sd = {}
    cin = 3
    for idx, cout in zip(
        [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
        [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512],
    ):
        sd[f"features.{idx}.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        sd[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)
        cin = cout
    params = vgg.import_torchvision_vgg16(sd)
    assert len(params) == 13
    assert params[0]["w"].shape == (3, 3, 3, 64)
    assert params[-1]["w"].shape == (3, 3, 512, 512)


def test_optimization_reduces_loss():
    from neuralstyletransferv1_tpu.engine import gram_nst
    from neuralstyletransferv1_tpu.models import vgg

    params = vgg.init(jax.random.key(1))
    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 48, 64, 3)).astype(np.float32))
    out, hist = gram_nst.optimize(params, content, style, steps=30, lr=0.05, init_from="random")
    hist = np.asarray(hist)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.9, (hist[0], hist[-1])
    assert out.shape == content.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
