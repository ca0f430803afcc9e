"""mk45: ReCoNet res-conv lane-fit probe.

mk40 traced the 8 res-block convs at ~12.0 ms each @B16 vs a 3.5 ms
speed-of-light — C=192 is 1.5 partitions of the 128-lane MXU. Probe
whether zero-padding the res chain to C=256 (perfect 2-partition fit,
+78% nominal FLOPs) still wins wall-clock, before building the exact
padded net form. Also probes C=128 and Johnson's res geometry as
calibration points.

Shapes: res blocks run at [B, 270, 480, C] (1080p, f=2 form, H/4 pixel
space). Protocol per CLAUDE.md (fresh salted inputs, chain minus 1).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.ops.conv import conv2d

B, H, W = 16, 270, 480
CASES = [128, 192, 256]


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    for C in CASES:
        w = jax.random.normal(jax.random.key(1), (3, 3, C, C),
                              jnp.bfloat16) * 0.05
        b = jnp.zeros((C,), jnp.bfloat16)

        def step(x, w=w, b=b):
            # SAME conv + relu: one res half-block's compute shape
            y = conv2d(x, w, b, padding="SAME")
            return jnp.maximum(y, 0.0).astype(x.dtype)

        # direct protocol on the C-channel tensor (fresh inputs, chain-4)
        def chain(x, n, f=step):
            def body(i, y):
                return f(y)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x)
                           .astype(jnp.float32))

        g4 = jax.jit(functools.partial(chain, n=4))
        g1 = jax.jit(functools.partial(chain, n=1))
        salt = (time.time_ns() // 1000) % 1_000_000
        mk = lambda s: jax.random.uniform(  # noqa: E731
            jax.random.key(s + salt), (B, H, W, C), jnp.bfloat16)
        float(g4(mk(0))); float(g1(mk(1)))
        best4 = best1 = float("inf")
        for r in range(2):
            x = mk(100 + r); float(jnp.sum(x.astype(jnp.float32)))
            t0 = time.perf_counter(); float(g4(x))
            best4 = min(best4, time.perf_counter() - t0)
            x = mk(200 + r); float(jnp.sum(x.astype(jnp.float32)))
            t0 = time.perf_counter(); float(g1(x))
            best1 = min(best1, time.perf_counter() - t0)
        ms = (best4 - best1) / 3 * 1e3
        tf = 2 * B * H * W * C * C * 9 / 1e12
        print(f"[C={C}] {ms:7.2f} ms/conv  {tf / (ms / 1e3):6.1f} TFLOP/s "
              f"(nominal {tf:.2f} TF)", flush=True)


if __name__ == "__main__":
    main()
