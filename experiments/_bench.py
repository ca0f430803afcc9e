"""Shared TPU benchmarking protocol for the experiments/ A/B harnesses.

The axon relay memoizes identical calls and block_until_ready is a no-op,
so timings use fresh inputs, a scalar fetch, and the K-chain-minus-1-chain
subtraction (see CLAUDE.md / bench.py)."""

import time

import jax
import jax.numpy as jnp


def timed_step(step, batch, h, w, chain=8, repeats=2):
    g = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, chain, lambda i, y: step(y).astype(y.dtype), x)
        .astype(jnp.float32)))
    x = jax.random.uniform(jax.random.key(0), (batch, h, w, 3), jnp.bfloat16)
    float(g(x))
    best = float("inf")
    for r in range(repeats):
        x2 = jax.random.uniform(jax.random.key(100 + r), (batch, h, w, 3),
                                jnp.bfloat16)
        float(jnp.sum(x2.astype(jnp.float32)))
        t0 = time.perf_counter()
        float(g(x2))
        best = min(best, time.perf_counter() - t0)
    d1 = best
    g1 = jax.jit(lambda x: jnp.sum(step(x).astype(jnp.float32)))
    float(g1(x))
    x2 = jax.random.uniform(jax.random.key(999), (batch, h, w, 3),
                            jnp.bfloat16)
    float(jnp.sum(x2.astype(jnp.float32)))
    t0 = time.perf_counter()
    float(g1(x2))
    done = time.perf_counter() - t0
    return (d1 - done) / (chain - 1)
