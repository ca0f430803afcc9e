"""t7 fast path (io/t7_fast.py) — recognizer + f2 block apply parity vs the
general executor on synthetic eccv16-shaped nets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.io import t7_fast
from neuralstyletransferv1_tpu.io.t7 import t7_apply

rng = np.random.default_rng(7)


def _conv(ci, co, k, s, p):
    return {"op": "conv",
            "w": rng.normal(0, 0.08, (k, k, ci, co)).astype(np.float32),
            "b": rng.normal(0, 0.05, co).astype(np.float32),
            "stride": (s, s), "pad": (p, p)}


def _bn(c):
    return {"op": "batchnorm",
            "weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
            "bias": rng.normal(0, 0.1, c).astype(np.float32),
            "running_mean": rng.normal(0, 0.2, c).astype(np.float32),
            "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
            "eps": 1e-5}


def _convT(ci, co, k, p, adj):
    return {"op": "conv_transpose",
            "w": rng.normal(0, 0.08, (k, k, co, ci)).astype(np.float32),
            "b": rng.normal(0, 0.05, co).astype(np.float32),
            "stride": 2, "pad": p, "adj": adj}


def _res(c):
    body = [_conv(c, c, 3, 1, 1), _bn(c), {"op": "relu"},
            _conv(c, c, 3, 1, 1), _bn(c)]
    return [{"op": "concat_table", "branches": [body, []]},
            {"op": "add_table"}]


def _johnson_layers(C=8, deconv_k=3, tail_tanh=True):
    adj = 1 if deconv_k == 3 else 0
    ls = [_conv(3, C, 9, 1, 4), _bn(C), {"op": "relu"},
          _conv(C, 2 * C, 3, 2, 1), _bn(2 * C), {"op": "relu"},
          _conv(2 * C, 4 * C, 3, 2, 1), _bn(4 * C), {"op": "relu"}]
    for _ in range(3):
        ls += _res(4 * C)
    ls += [_convT(4 * C, 2 * C, deconv_k, 1, adj), _bn(2 * C), {"op": "relu"},
           _convT(2 * C, C, deconv_k, 1, adj), _bn(C), {"op": "relu"},
           _conv(C, 3, 9, 1, 4)]
    if tail_tanh:
        ls += [{"op": "tanh"}, {"op": "mul", "c": 150.0}]
    return ls


@pytest.mark.parametrize("deconv_k", [3, 4])
def test_fast_matches_executor(deconv_k):
    layers = _johnson_layers(deconv_k=deconv_k)
    fp = t7_fast.try_fast_johnson(layers)
    assert fp is not None
    x = jnp.asarray(rng.normal(0, 50, (2, 32, 40, 3)).astype(np.float32))
    y_ref = t7_apply(layers, x)
    y_fast = t7_fast.t7_fast_apply(fp, x)
    assert y_fast.shape == y_ref.shape
    # ~20 layers of float reassociation through tanh*150; interior exact
    mae = float(jnp.mean(jnp.abs(y_ref - y_fast)))
    assert mae < 1e-3, mae


def test_convT_scatter_exact():
    for (k, p, adj) in ((3, 1, 1), (4, 1, 0)):
        l = _convT(6, 4, k, p, adj)
        x = jnp.asarray(rng.normal(0, 1, (1, 8, 10, 6)).astype(np.float32))
        y_ref = t7_apply([l], x)
        wb, (lo, hi) = t7_fast._scatter_convT_f2(
            np.asarray(l["w"], np.float32), k, p, adj)
        from neuralstyletransferv1_tpu.models.transformer_net_s2d import d2s
        from neuralstyletransferv1_tpu.ops.conv import conv2d

        yb = conv2d(x, jnp.asarray(wb), jnp.asarray(np.tile(l["b"], 4)),
                    padding=((lo, hi), (lo, hi)))
        yf = d2s(yb, 2, 4)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(y_ref),
                                   atol=1e-5)


def _in(c):
    return {"op": "instancenorm",
            "weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
            "bias": rng.normal(0, 0.1, c).astype(np.float32), "eps": 1e-5}


def test_instance_norm_net_fast_parity():
    """IN variants ride the fast path too (deferred stats, not folded)."""
    layers = _johnson_layers()
    # swap every batchnorm for an instancenorm of the same width
    layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
              for l in layers]
    for l in layers:
        if l["op"] == "concat_table":
            l["branches"][0][:] = [
                (_in(b["weight"].shape[0]) if b["op"] == "batchnorm" else b)
                for b in l["branches"][0]]
    fp = t7_fast.try_fast_johnson(layers)
    assert fp is not None
    x = jnp.asarray(rng.normal(0, 50, (2, 32, 40, 3)).astype(np.float32))
    y_ref = t7_apply(layers, x)
    y_fast = t7_fast.t7_fast_apply(fp, x)
    mae = float(jnp.mean(jnp.abs(y_ref - y_fast)))
    assert mae < 1e-3, mae


def test_rejects_reflect_pad_net():
    layers = [{"op": "reflect_pad", "pad": 4}] + _johnson_layers()
    assert t7_fast.try_fast_johnson(layers) is None
