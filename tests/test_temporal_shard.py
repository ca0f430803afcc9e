"""Production sharded temporal stage (parallel.mesh.temporal_postprocess_sharded).

The chunked ICI temporal stage must (a) reproduce its own chunk semantics
exactly — each shard scans its local chunk seeded by the left neighbor's
boundary frame over the ring, shard 0 by the sequential carry — and (b) stay
close to the fully sequential scan (the chunk-seed approximation decays like
(1-alpha)^t into each chunk).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.ops.color import rgb_to_lab_u8
from neuralstyletransferv1_tpu.parallel.mesh import (
    make_mesh,
    temporal_postprocess_sharded,
)
from neuralstyletransferv1_tpu.temporal.ema import (
    TemporalState,
    temporal_postprocess_scan,
)

KW = dict(
    flow_ema=True, flow_alpha=0.6,
    smooth_lightness=True, smooth_chroma=False,
    smooth_alpha=0.7, chroma_alpha=0.85,
    motion_blend=True, blend=0.9,
    composite_keep=True,
)


def _data(T=8, H=16, W=24, seed=0, with_mask=True):
    rng = np.random.default_rng(seed)
    styled = jnp.asarray(rng.random((T, H, W, 3)), jnp.float32)
    orig = jnp.asarray(rng.random((T, H, W, 3)), jnp.float32)
    flows = jnp.asarray(rng.normal(0, 1.5, (T, H, W, 2)), jnp.float32)
    alphas = jnp.asarray(rng.random((T, H, W, 1)), jnp.float32) if with_mask else None
    has = jnp.asarray(rng.random(T) > 0.5) if with_mask else None
    state = TemporalState(
        jnp.asarray(rng.random((H, W, 3)), jnp.float32),
        jnp.asarray(rng.random((H, W, 3)) * 255.0, jnp.float32),
    )
    return styled, orig, flows, alphas, has, state


def _chunk_emulation(n, styled, orig, flows, alphas, has, state, first):
    """Single-device emulation of the chunked semantics."""
    T = styled.shape[0]
    Tl = T // n
    outs = []
    st = None
    for k in range(n):
        sl = slice(k * Tl, (k + 1) * Tl)
        if k == 0:
            init, warmup = state, bool(first)
        else:
            boundary = styled[k * Tl - 1]
            init, warmup = TemporalState(boundary, rgb_to_lab_u8(boundary)), False
        out_k, st = temporal_postprocess_scan(
            styled[sl], orig[sl], flows[sl],
            mask_alphas=None if alphas is None else alphas[sl],
            mask_has=None if has is None else has[sl],
            init=init, warmup=warmup, **KW,
        )
        outs.append(out_k)
    return jnp.concatenate(outs, 0), st


@pytest.mark.parametrize("first", [True, False])
@pytest.mark.parametrize("with_mask", [True, False])
def test_sharded_matches_chunk_emulation(first, with_mask):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    n = 4
    mesh = make_mesh(n)
    styled, orig, flows, alphas, has, state = _data(with_mask=with_mask)

    out_sh, st_sh = jax.jit(
        lambda s, o, f, st: temporal_postprocess_sharded(
            mesh, s, o, f, state=st, first=first,
            mask_alphas=alphas, mask_has=has, **KW,
        )
    )(styled, orig, flows, state)
    out_em, st_em = _chunk_emulation(n, styled, orig, flows, alphas, has, state, first)

    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_em), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st_sh.prev_styled01), np.asarray(st_em.prev_styled01), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_sh.prev_lab), np.asarray(st_em.prev_lab), atol=1e-3
    )


def test_sharded_close_to_sequential():
    """The chunk-seed approximation must stay bounded vs the exact sequential
    scan: only chunk-boundary EMA seeds differ, error decays into each chunk."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(2)
    styled, orig, flows, alphas, has, state = _data(with_mask=False)

    out_sh, _ = jax.jit(
        lambda s, o, f, st: temporal_postprocess_sharded(
            mesh, s, o, f, state=st, first=True, **KW,
        )
    )(styled, orig, flows, state)
    out_seq, _ = temporal_postprocess_scan(styled, orig, flows, init=None, **KW)

    d = np.abs(np.asarray(out_sh) - np.asarray(out_seq))
    # first chunk identical (seeded by the true carry)
    assert d[:4].max() < 1e-5, d[:4].max()
    # second chunk: bounded by the boundary-seed error times the EMA weight
    assert d[4:].mean() < 0.05, d[4:].mean()
