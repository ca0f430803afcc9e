"""NST_Train f=2 fast form (models/transformer_net_nst_fast) — parity vs
the reference-form net, including via the engine stylizer dispatch."""

import numpy as np

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.models import transformer_net_nst as nst
from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf


def test_nst_fast_parity():
    params = nst.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 48, 64, 3), jnp.float32)
    y_ref = nst.apply(params, x)
    y_fast = nstf.apply(nstf.from_nst_params(params), x)
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


def test_nst_fast_via_stylizer():
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.make_random_model("nst", seed=3)
    fn = st.jit_stylizer(model)
    x = jax.random.uniform(jax.random.key(2), (1, 32, 48, 3), jnp.float32)
    out = np.asarray(fn(x))
    ref = np.asarray(st.stylize("nst", model.params, model.io_preset,
                                x.astype(jnp.float32)))
    assert out.shape == x.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
