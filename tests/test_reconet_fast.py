"""ReCoNet f=2 fast form (models/reconet_fast) — parity vs the reference
form for both norm variants, and via the stylizer dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.models import reconet, reconet_fast


@pytest.mark.parametrize("frn", [False, True])
def test_reconet_fast_parity(frn):
    params = reconet.init(jax.random.key(0), frn=frn)
    x = jax.random.uniform(jax.random.key(1), (1, 48, 64, 3),
                           jnp.float32) * 2 - 1
    y_ref = reconet.apply(params, x)
    y_fast = reconet_fast.apply(reconet_fast.from_reconet_params(params), x)
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_reconet_fast_via_stylizer():
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.make_random_model("reconet", seed=5)
    fn = st.jit_stylizer(model)
    x = jax.random.uniform(jax.random.key(2), (1, 32, 48, 3), jnp.float32)
    out = np.asarray(fn(x))
    ref = np.asarray(st.stylize("reconet", model.params, model.io_preset, x))
    assert out.shape == x.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
