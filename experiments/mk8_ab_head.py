"""Same-process A/B: full net with old head (s2d + 5x5x12 block conv) vs
new head-P (10x10 s2 pixel conv). Also B-sweep for batch effects."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import io_presets as iop
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2
from neuralstyletransferv1_tpu.models.transformer_net_s2d import s2d
from neuralstyletransferv1_tpu.models.transformer_net_s2d2 import (
    _pad_reflect_f2_4px, _scatter_k9_f2)
from neuralstyletransferv1_tpu.ops.conv import conv2d

H, W = 1080, 1920
CHAIN = 8


def timed(fn, batch, chain, repeats=2):
    g = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, chain, lambda i, y: fn(y).astype(y.dtype), x)
        .astype(jnp.float32)))
    x = jax.random.uniform(jax.random.key(0), (batch, H, W, 3), jnp.bfloat16)
    float(g(x))
    best = float("inf")
    for r in range(repeats):
        x2 = jax.random.uniform(jax.random.key(100 + r), (batch, H, W, 3),
                                jnp.bfloat16)
        float(jnp.sum(x2.astype(jnp.float32)))
        t0 = time.perf_counter()
        float(g(x2))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0])
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))
    # old-head weights: the [5,5,12,128] scatter
    w_old = jnp.asarray(_scatter_k9_f2(
        np.asarray(params["conv1"]["w"], np.float32)), jnp.bfloat16)

    def step_new(x):
        xin = iop.preprocess("imagenet_255", x)
        y = s2d2.apply(bp, xin)
        return iop.postprocess("imagenet_255", y)

    def apply_old_head(p, x):
        from neuralstyletransferv1_tpu.models.transformer_net_s2d import (
            _apply_in_relu, _in_stats, _pad_stride2_halo)
        xin = x
        y = _pad_reflect_f2_4px(s2d(xin, 2), 3)
        y = conv2d(y, w_old, p["c1_b"])
        # splice back into the standard apply by re-running from in1 on:
        return y

    # full old-form step: monkeypatch-free — rebuild apply inline
    import functools

    def step_old(x):
        xin = iop.preprocess("imagenet_255", x)
        from neuralstyletransferv1_tpu.models.transformer_net_s2d import (
            _apply_in_relu, _in_stats, _pad_stride2_halo)
        from neuralstyletransferv1_tpu.ops.norm import instance_norm
        from neuralstyletransferv1_tpu.ops.pad import reflect_pad_2d
        from neuralstyletransferv1_tpu.models.transformer_net_s2d import (
            _pad_edge_blocks, d2s)
        p = bp
        y = _pad_reflect_f2_4px(s2d(xin, 2), 3)
        y = conv2d(y, w_old, p["c1_b"])
        m, inv = _in_stats(y, 4, 32)
        y = _pad_stride2_halo(y, 32)
        y = _apply_in_relu(y, m, inv, p["in1"]["scale"], p["in1"]["bias"], 4)
        y = conv2d(y, p["c2_w"], p["c2_b"])
        m, inv = _in_stats(y, 1, 64)
        y = reflect_pad_2d(y, 1)
        y = _apply_in_relu(y, m, inv, p["in2"]["scale"], p["in2"]["bias"], 1)
        y = conv2d(y, p["c3_w"], p["c3_b"], stride=2)
        m, inv = _in_stats(y, 1, 128)
        y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)
        for i in range(1, 6):
            rp = p[f"res{i}"]
            r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"], rp["conv1"]["b"])
            m, inv = _in_stats(r, 1, 128)
            r = reflect_pad_2d(r, 1)
            r = _apply_in_relu(r, m, inv, rp["in1"]["scale"], rp["in1"]["bias"], 1)
            r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"])
            y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y
        y = _pad_edge_blocks(y)
        y = conv2d(y, p["d1_w"], p["d1_b"])
        m, inv = _in_stats(y, 4, 64)
        y = d2s(y, 2, 64)
        y = _pad_edge_blocks(y)
        y = _apply_in_relu(y, m, inv, p["in4"]["scale"], p["in4"]["bias"], 1)
        y = conv2d(y, p["d2_w"], p["d2_b"])
        m, inv = _in_stats(y, 4, 32)
        y = _pad_reflect_f2_4px(y, 32)
        y = _apply_in_relu(y, m, inv, p["in5"]["scale"], p["in5"]["bias"], 4)
        hb = x.shape[1] // 2
        rows = conv2d(y, p["d3_w"])
        y = sum(rows[:, dy:dy + hb, :, dy * 12:(dy + 1) * 12] for dy in range(5))
        y = y + p["d3_b"].astype(y.dtype)
        y = d2s(y, 2, 3)
        return iop.postprocess("imagenet_255", y)

    for B in (16,):
        for name, f in (("old-head", step_old), ("new-head", step_new)):
            tC = timed(f, B, CHAIN)
            t1 = timed(f, B, 1)
            per = (tC - t1) / (CHAIN - 1)
            print(f"B{B} {name}: {per*1e3:7.2f} ms/batch  {B/per:6.1f} fps")


if __name__ == "__main__":
    main()
