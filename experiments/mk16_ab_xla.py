"""mk16: in-net A/Bs of XLA-level variants on the baked s2d2 step.

Usage: python -u experiments/mk16_ab_xla.py [c3block|headpix] [batches...]
Toggles transformer_net_s2d2._C3_BLOCK or ._HEAD_PIX (both measured in-net
NEGATIVE at 1080p B16 -- PERF.md round-2c: c3-block 109.5 -> 104.2 fps,
head-pix 109.4 -> 96.3 fps).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

H, W = 1080, 1920
CHAIN = 8


def timed(step, batch, chain, repeats=2):
    g = jax.jit(lambda x: jnp.sum(
        jax.lax.fori_loop(0, chain, lambda i, y: step(y).astype(y.dtype), x)
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
    print("device:", jax.devices()[0], flush=True)
    params = transformer_net.init(jax.random.key(0))
    # build the experimental weight variants too (they're only constructed
    # when the flags are set — see from_johnson_params)
    s2d2._C3_BLOCK = s2d2._HEAD_PIX = True
    bp = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        s2d2.bake_io_affine(s2d2.from_johnson_params(params), "imagenet_255"))
    s2d2._C3_BLOCK = s2d2._HEAD_PIX = False

    def step(x):
        return jnp.clip(s2d2.apply(bp, x), 0.0, 1.0)

    argv = sys.argv[1:]
    which = argv.pop(0) if argv and not argv[0].isdigit() else "headpix"
    flagname = {"c3block": "_C3_BLOCK", "headpix": "_HEAD_PIX"}[which]
    batches = [int(a) for a in argv] or [16]
    x = jax.random.uniform(jax.random.key(7), (2, H, W, 3), jnp.bfloat16)
    # distinct lambdas: jax.jit caches by callable identity, so re-jitting
    # the same `step` after flipping the flag would silently reuse the trace
    y0 = jax.jit(lambda t: step(t))(x)
    setattr(s2d2, flagname, True)
    y1 = jax.jit(lambda t: step(t))(x)
    mae = float(jnp.mean(jnp.abs(y0.astype(jnp.float32) -
                                 y1.astype(jnp.float32))))
    print(f"{which} closeness mae={mae:.3e}", flush=True)
    setattr(s2d2, flagname, False)

    for B in batches:
        for name, flag in (("base ", False), (which, True)):
            setattr(s2d2, flagname, flag)
            tC = timed(step, B, CHAIN)
            t1 = timed(step, B, 1)
            per = (tC - t1) / (CHAIN - 1)
            print(f"B{B} {name}: {per*1e3:7.2f} ms/batch  {B/per:6.1f} fps",
                  flush=True)
        setattr(s2d2, flagname, False)


if __name__ == "__main__":
    main()
