"""Space-to-depth Johnson net: exact parity with the reference-form net."""

import numpy as np

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.models import transformer_net, transformer_net_s2d as s2d


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 12, 3)).astype(np.float32))
    y = s2d.s2d(x, 4)
    assert y.shape == (2, 2, 3, 48)
    back = s2d.d2s(y, 4, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_s2d_apply_matches_reference_form():
    params = transformer_net.init(jax.random.key(0))
    bparams = s2d.from_johnson_params(params)
    x = jnp.asarray(np.random.default_rng(1).random((1, 48, 64, 3)).astype(np.float32) * 255.0)
    want = np.asarray(transformer_net.apply(params, x))
    got = np.asarray(s2d.apply(bparams, x))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    mx = np.abs(got - want).max()
    assert mae < 1e-3, (mae, mx)


def test_s2d_apply_batch_and_other_size():
    params = transformer_net.init(jax.random.key(2))
    bparams = s2d.from_johnson_params(params)
    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 96, 3)).astype(np.float32) * 255.0)
    want = np.asarray(transformer_net.apply(params, x))
    got = np.asarray(s2d.apply(bparams, x))
    mae = np.abs(got - want).mean()
    assert mae < 1e-3, mae


def test_s2d2_apply_matches_reference_form():
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

    params = transformer_net.init(jax.random.key(0))
    bparams = s2d2.from_johnson_params(params)
    x = jnp.asarray(np.random.default_rng(1).random((1, 48, 64, 3)).astype(np.float32) * 255.0)
    want = np.asarray(transformer_net.apply(params, x))
    got = np.asarray(s2d2.apply(bparams, x))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    mx = np.abs(got - want).max()
    assert mae < 1e-3, (mae, mx)


def test_s2d2_apply_batch_and_other_size():
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

    params = transformer_net.init(jax.random.key(2))
    bparams = s2d2.from_johnson_params(params)
    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 96, 3)).astype(np.float32) * 255.0)
    want = np.asarray(transformer_net.apply(params, x))
    got = np.asarray(s2d2.apply(bparams, x))
    mae = np.abs(got - want).mean()
    assert mae < 1e-3, mae
