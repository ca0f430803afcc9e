"""mk29: res-chain A/B — XLA bf16 vs XLA int8 vs Pallas int8 fused sites.

The 5-block residual chain (10 conv sites) at the 1080p f2 grid
(B, 270, 480, 128), chained in-graph CHAIN times minus 1-chain.
Also checks Pallas-int8 vs XLA-int8 exactness (same quant scales; expect
agreement to bf16 rounding).

Run: python -u experiments/mk29_ab_i8_res.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu.models import s2d2_sites_i8  # noqa: E402
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as tns  # noqa: E402
from neuralstyletransferv1_tpu.models.transformer_net_s2d import (  # noqa: E402
    _apply_in_relu, _in_stats)
from neuralstyletransferv1_tpu.ops.conv import conv2d  # noqa: E402
from neuralstyletransferv1_tpu.ops.norm import instance_norm  # noqa: E402
from neuralstyletransferv1_tpu.ops.pad import reflect_pad_2d  # noqa: E402

B, H4, W4, C = 16, 270, 480, 128
CHAIN = 6
FLOPS = 10 * 2 * B * H4 * W4 * C * C * 9


def make_params(rng):
    p = {}
    for i in range(1, 6):
        p[f"res{i}"] = {
            "conv1": {"w": jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)),
                                       jnp.float32),
                      "b": jnp.asarray(rng.normal(0, 0.02, C), jnp.float32)},
            "conv2": {"w": jnp.asarray(rng.normal(0, 0.05, (3, 3, C, C)),
                                       jnp.float32),
                      "b": jnp.asarray(rng.normal(0, 0.02, C), jnp.float32)},
            "in1": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)},
            "in2": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)},
        }
    return p


def chain_bf16(p):
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)

    def one(y):
        for i in range(1, 6):
            rp = p[f"res{i}"]
            r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"],
                       rp["conv1"]["b"])
            m, inv = _in_stats(r, 1, C)
            r = reflect_pad_2d(r, 1)
            r = _apply_in_relu(r, m, inv, rp["in1"]["scale"],
                               rp["in1"]["bias"], 1)
            r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"])
            y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y
        return y

    return one


def chain_xla_i8(p, quant):
    from neuralstyletransferv1_tpu.ops.conv import conv2d_i8

    def _qc(site, xin, w, bias, affine=None):
        qs = quant[site]
        xf = xin.astype(jnp.float32)
        if affine is not None:
            m_, inv_, sc, bi = affine
            a = (inv_ * sc) * qs["qin"]
            bb = (bi - m_ * inv_ * sc) * qs["qin"]
            xq = jnp.clip(jnp.round(xf * a[:, None, None, :]
                                    + bb[:, None, None, :]), 0.0, 127.0)
        else:
            xq = jnp.clip(jnp.round(xf * qs["qin"]), -127.0, 127.0)
        y = conv2d_i8(xq.astype(jnp.int8), qs["w"]).astype(jnp.float32) \
            * qs["ws"]
        return (y + bias.astype(jnp.float32)).astype(xin.dtype)

    def one(y):
        for i in range(1, 6):
            rp = p[f"res{i}"]
            r = _qc(f"r{i}a", reflect_pad_2d(y, 1), rp["conv1"]["w"],
                    rp["conv1"]["b"])
            m, inv = _in_stats(r, 1, C)
            r = reflect_pad_2d(r, 1)
            af = (m, inv, rp["in1"]["scale"], rp["in1"]["bias"])
            r = _qc(f"r{i}b", r, rp["conv2"]["w"], rp["conv2"]["b"],
                    affine=af)
            y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y
        return y

    return one


def timed(fn, shape, dtype=jnp.bfloat16):
    def loop(x, n):
        return jnp.sum(jax.lax.fori_loop(
            0, n, lambda i, y: fn(y).astype(y.dtype), x).astype(jnp.float32))

    gN = jax.jit(functools.partial(loop, n=CHAIN))
    g1 = jax.jit(functools.partial(loop, n=1))

    def best(g):
        b = float("inf")
        for r in range(3):
            x = jax.random.normal(jax.random.key(100 + r), shape, dtype) * 0.5
            float(jnp.sum(x.astype(jnp.float32)))
            float(g(x))
            t0 = time.perf_counter()
            float(g(x + 0.01))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(gN) - best(g1)) / (CHAIN - 1)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    p = make_params(rng)

    # calibration scales from a real-ish activation range
    act = {}
    for i in range(1, 6):
        act[f"r{i}a"] = 4.0
        act[f"r{i}b"] = 4.0
    quant = {}
    for site in act:
        i, ab = int(site[1]), site[2]
        w = np.asarray(p[f"res{i}"][f"conv{'1' if ab == 'a' else '2'}"]["w"],
                       np.float32)
        ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
        wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
        a = act[site]
        quant[site] = {"w": jnp.asarray(wq),
                       "ws": jnp.asarray(ws * (a / 127.0), jnp.float32),
                       "qin": float(127.0 / a)}

    # exactness: pallas vs xla int8, single site then full chain
    x = jax.random.normal(jax.random.key(0), (2, H4, W4, C),
                          jnp.bfloat16) * 0.5
    qs = quant["r1a"]

    def one_site_xla(y):
        from neuralstyletransferv1_tpu.ops.conv import conv2d_i8
        xq = jnp.clip(jnp.round(y.astype(jnp.float32) * qs["qin"]),
                      -127.0, 127.0).astype(jnp.int8)
        r = conv2d_i8(reflect_pad_2d(xq, 1), qs["w"]).astype(jnp.float32) \
            * qs["ws"] + p["res1"]["conv1"]["b"]
        return r.astype(jnp.bfloat16)

    def one_site_pal(y):
        B2 = y.shape[0]
        aq = jnp.full((B2, C), qs["qin"], jnp.float32)
        cq = jnp.zeros((B2, C), jnp.float32)
        r, _ = s2d2_sites_i8.res_site(
            y, aq, cq, qs["w"].reshape(9, C, C), qs["ws"],
            p["res1"]["conv1"]["b"], -127.0)
        return r

    s1 = np.asarray(jax.jit(one_site_xla)(x)).astype(np.float32)
    s2_ = np.asarray(jax.jit(one_site_pal)(x)).astype(np.float32)
    print(f"single site pallas vs xla-i8: MAE {np.abs(s1 - s2_).mean():.2e} "
          f"max {np.abs(s1 - s2_).max():.2e}", flush=True)

    f_xla = jax.jit(chain_xla_i8(p, quant))
    f_pal = jax.jit(lambda y: s2d2_sites_i8.res_chain(y, p, quant))
    o1 = np.asarray(f_xla(x)).astype(np.float32)
    o2 = np.asarray(f_pal(x)).astype(np.float32)
    print(f"chain pallas vs xla-i8: MAE {np.abs(o1 - o2).mean():.2e} "
          f"max {np.abs(o1 - o2).max():.2e} (|y| ~ {np.abs(o1).mean():.2f})",
          flush=True)

    for name, fn in [
        ("xla-bf16", chain_bf16(p)),
        ("xla-i8", chain_xla_i8(p, quant)),
        ("pallas-i8", lambda y: s2d2_sites_i8.res_chain(y, p, quant)),
    ]:
        try:
            t = timed(fn, (B, H4, W4, C))
            print(f"[{name}] {t*1e3:.2f} ms/chain-pass  "
                  f"{FLOPS/t/1e12:.0f} TF/s-equiv", flush=True)
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
