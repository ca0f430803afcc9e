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
