"""mk18: A/B native-bf16 conv outputs (ops.conv._NATIVE_BF16_OUT) in-net."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.ops import conv as opsconv
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
    bp = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        s2d2.bake_io_affine(s2d2.from_johnson_params(params), "imagenet_255"))

    def step(x):
        return jnp.clip(s2d2.apply(bp, x), 0.0, 1.0)

    batches = [int(a) for a in sys.argv[1:]] or [16]
    x = jax.random.uniform(jax.random.key(7), (2, H, W, 3), jnp.bfloat16)
    y0 = jax.jit(lambda t: step(t))(x)
    opsconv._NATIVE_BF16_OUT = True
    y1 = jax.jit(lambda t: step(t))(x)
    mae = float(jnp.mean(jnp.abs(y0.astype(jnp.float32) -
                                 y1.astype(jnp.float32))))
    mx = float(jnp.max(jnp.abs(y0.astype(jnp.float32) -
                               y1.astype(jnp.float32))))
    print(f"bf16out closeness mae={mae:.3e} max={mx:.3e} ([0,1] scale)",
          flush=True)
    opsconv._NATIVE_BF16_OUT = False

    for B in batches:
        for name, flag in (("f32-out ", False), ("bf16-out", True)):
            opsconv._NATIVE_BF16_OUT = flag
            tC = timed(step, B, CHAIN)
            t1 = timed(step, B, 1)
            per = (tC - t1) / (CHAIN - 1)
            print(f"B{B} {name}: {per*1e3:7.2f} ms/batch  {B/per:6.1f} fps",
                  flush=True)
        opsconv._NATIVE_BF16_OUT = False


if __name__ == "__main__":
    main()
