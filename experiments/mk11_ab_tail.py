"""In-net A/B for the fused tail (d2-site + fixup + d3-sum-site):
full bench step with fused_sites=() vs ("tail",), same process.
Also checks output closeness at 1080p."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import io_presets as iop
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

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
    s2d2._BUILD_HEAD_SITE = True   # the fused head site needs c3_wb
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))

    def step(fused):
        def f(x):
            xin = iop.preprocess("imagenet_255", x)
            y = s2d2.apply(bp, xin, fused_sites=fused)
            return iop.postprocess("imagenet_255", y)
        return f

    variants = [("xla       ", ()), ("tail      ", ("tail",)),
                ("head      ", ("head",)), ("head+tail ", ("head", "tail"))]

    x = jax.random.uniform(jax.random.key(7), (2, H, W, 3), jnp.bfloat16)
    y0 = jax.jit(step(()))(x)
    for name, fused in variants[1:]:
        y1 = jax.jit(step(fused))(x)
        mae = float(jnp.mean(jnp.abs(y0.astype(jnp.float32) -
                                     y1.astype(jnp.float32))))
        mx = float(jnp.max(jnp.abs(y0.astype(jnp.float32) -
                                   y1.astype(jnp.float32))))
        print(f"closeness {name}: mae={mae:.3e} max={mx:.3e} (0-255)",
              flush=True)

    batches = [int(a) for a in sys.argv[1:]] or [16]
    for B in batches:
        for name, fused in variants:
            tC = timed(step(fused), B, CHAIN)
            t1 = timed(step(fused), B, 1)
            per = (tC - t1) / (CHAIN - 1)
            print(f"B{B} {name}: {per*1e3:7.2f} ms/batch  {B/per:6.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
