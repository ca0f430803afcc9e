"""mk23: DIS in-net A/B — Pallas iteration kernel + dense densification vs
the round-2b XLA form, @1080p and @540p (flow_downscale 2), B8 vmapped.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu.ops import dis_flow as D

B = 8
H, W = 1080, 1920


def bench(label, h, w):
    def f(prev, curr, n):
        def body(i, carry):
            p, c = carry
            fl = jax.vmap(D.dis_flow)(p, c)
            # data-dependence: feed flow magnitude back so iterations can't CSE
            return (c, c + 0.001 * fl[..., 0])
        p, c = jax.lax.fori_loop(0, n, body, (prev, curr))
        return jnp.sum(c)

    gN = jax.jit(functools.partial(f, n=4))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        k = jax.random.key(s)
        a = jax.random.uniform(k, (B, h, w), jnp.float32) * 255.0
        b = jnp.roll(a, 3, axis=2) + jax.random.normal(k, (B, h, w)) * 2.0
        return a, b

    def run(g):
        a, b = mk(0)
        float(g(a, b))
        best = float("inf")
        for r in range(2):
            a, b = mk(100 + r)
            float(jnp.sum(a[0, 0, :4]))
            t0 = time.perf_counter()
            float(g(a, b))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / 3.0 / B
    print(f"[{label}] {t*1e3:.1f} ms/frame-pair", flush=True)
    return t


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    for prewarp in (True, False):
        D._PREWARP = prewarp
        for use_pallas in (True, False):
            D._ITER_PALLAS = use_pallas
            name = ("prewarp+" if prewarp else "gather+") + \
                ("pallas" if use_pallas else "xla")
            bench(f"dis {name} 1080p", H, W)
            bench(f"dis {name} 540p(ds2)", H // 2, W // 2)
