"""mk26: why is the int8 quantize pass 2.7x roofline?

The mk25 trace shows each res-site quantize (read bf16 [16,272,482,128],
write s8) costs ~2.75 ms vs ~1 ms of pure traffic. This chains minimal
passes in-graph (fori_loop, optimization_barrier forces the s8 tensor to
materialize) and subtracts a 1-chain run, per the bench protocol.

Per-iteration traffic:
  quant->s8->back : read bf16 + write s8 + read s8 + write bf16 = 1.62 GB
  affine->bf16->back: 4x bf16 = 2.16 GB
If the s8 store/load is full-speed, quant must beat affine.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

B, C = 16, 128
CHAIN = 10
SHAPES = {"even 272x480": (272, 480), "odd 272x482": (272, 482)}


def chain_time(body, mk, n, reps=3):
    def g(x):
        y = jax.lax.fori_loop(0, n, lambda i, v: body(v), x)
        return jnp.sum(y.astype(jnp.float32))

    gj = jax.jit(g)
    float(gj(mk(0)))
    best = float("inf")
    for r in range(reps):
        x = mk(100 + r)
        float(jnp.sum(x[0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        float(gj(x))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(body, mk):
    tn = chain_time(body, mk, CHAIN)
    t1 = chain_time(body, mk, 1)
    return (tn - t1) / (CHAIN - 1)


def main():
    print("device:", jax.devices()[0], flush=True)
    for name, (h, w) in SHAPES.items():
        def mk(s):
            return jax.random.normal(jax.random.key(s), (B, h, w, C),
                                     jnp.bfloat16)

        gels = B * h * w * C / 1e9

        def quant_body(x):
            xf = x.astype(jnp.float32)
            q = jnp.clip(jnp.round(xf * 16.0), -127, 127).astype(jnp.int8)
            q = jax.lax.optimization_barrier(q)
            return (q.astype(jnp.float32) * (1.0 / 16.0)).astype(jnp.bfloat16)

        def affine_body(x):
            a = (x.astype(jnp.float32) * 1.0001).astype(jnp.bfloat16)
            a = jax.lax.optimization_barrier(a)
            return (a.astype(jnp.float32) * 0.9999).astype(jnp.bfloat16)

        def f32_body(x):
            a = x.astype(jnp.float32) * 1.0001
            a = jax.lax.optimization_barrier(a)
            return (a * 0.9999).astype(jnp.bfloat16)

        for label, body, gb in [
            ("quant s8 rt", quant_body, gels * (2 + 1 + 1 + 2)),
            ("affine bf16 rt", affine_body, gels * 8),
            ("affine f32 rt", f32_body, gels * 12),
        ]:
            t = per_iter(body, mk)
            print(f"[{name}] {label:15s} {t*1e3:7.2f} ms/iter "
                  f"({gb/t:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
