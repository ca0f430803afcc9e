"""Fast-path shape generalization (VERDICT round 2, Missing #6).

Arbitrary resolutions must ride the f=2 fast forms via reflect pad-and-crop
instead of silently falling back to the naive nets. The fast forms are
exactness-tested at %4 shapes elsewhere (test_s2d.py, test_nst_fast.py,
test_reconet_fast.py, test_t7_fast.py); here we pin down the generalization
machinery itself:

- fast(odd) == crop(fast(reflect-padded))  — the pad/crop wrapper is exact
- johnson fast(odd) stays close to the naive path (the naive net grows odd
  dims to %4 and resizes down, reference: pipeline.py:1514-1518; pad-crop
  keeps the interior lossless, so only resize-interp differences remain)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralstyletransferv1_tpu.engine import stylizer as st


@pytest.mark.parametrize("arch", [
    "johnson", "nst",
    pytest.param("reconet", marks=pytest.mark.slow),
])
def test_odd_shape_equals_cropped_padded(arch):
    rng = np.random.default_rng(0)
    H, W = 46, 71
    m = st.make_random_model(arch, seed=1)
    x = jnp.asarray(rng.random((2, H, W, 3)), jnp.float32)
    ph, pw = (-H) % 4, (-W) % 4
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

    f = st.jit_stylizer(m, optimize=True)
    out_odd = np.asarray(f(x))
    out_pad = np.asarray(f(xp))[:, :H, :W]
    np.testing.assert_allclose(out_odd, out_pad, atol=1e-6)


def test_johnson_odd_shape_close_to_naive():
    rng = np.random.default_rng(1)
    m = st.make_random_model("johnson", seed=1)
    x = jnp.asarray(rng.random((1, 94, 142, 3)), jnp.float32)
    fast = np.asarray(st.jit_stylizer(m, optimize=True)(x))
    naive = np.asarray(st.jit_stylizer(m, optimize=False)(x))
    assert np.abs(fast - naive).mean() < 5e-3
