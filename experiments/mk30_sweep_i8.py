"""mk30: TS (strip rows) x MT (M-tile rows) sweep for the int8 fused
res-site kernel at the 1080p f2 grid (16, 270, 480, 128).

One site chained in-graph CHAIN times minus 1-chain; per-site ms and
TF/s-equiv (bf16 FLOP count; int8 peak is ~373 TOP/s => ~21.3 ms floor
for 10 sites at B16, i.e. ~2.1 ms/site... per-site floor here ~1.65 ms).

Run: python -u experiments/mk30_sweep_i8.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu.models import s2d2_sites_i8  # noqa: E402

B, H4, W4, C = 16, 270, 480, 128
CHAIN = 10
FLOPS = 2 * B * H4 * W4 * C * C * 9


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32)
    ws_ = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.asarray(np.clip(np.round(w / ws_), -127, 127).astype(np.int8)
                     .reshape(9, C, C))
    ws = jnp.asarray(ws_ * (4.0 / 127.0), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.02, C), jnp.float32)
    aq = jnp.full((B, C), 127.0 / 4.0, jnp.float32)
    cq = jnp.zeros((B, C), jnp.float32)

    def site(y, ts, mt):
        r, _ = s2d2_sites_i8.res_site(y, aq, cq, wq, ws, bias, -127.0,
                                      ts=ts, mt=mt)
        return r * 0.05  # keep magnitudes bounded through the chain

    def timed(ts, mt):
        fn = functools.partial(site, ts=ts, mt=mt)

        def loop(x, n):
            return jnp.sum(jax.lax.fori_loop(
                0, n, lambda i, y: fn(y).astype(y.dtype), x)
                .astype(jnp.float32))

        gN = jax.jit(functools.partial(loop, n=CHAIN))
        g1 = jax.jit(functools.partial(loop, n=1))

        def best(g):
            b = float("inf")
            for r in range(3):
                x = jax.random.normal(jax.random.key(100 + r),
                                      (B, H4, W4, C), jnp.bfloat16) * 2.0
                float(jnp.sum(x.astype(jnp.float32)))
                float(g(x))
                t0 = time.perf_counter()
                float(g(x + 0.01))
                b = min(b, time.perf_counter() - t0)
            return b

        return (best(gN) - best(g1)) / (CHAIN - 1)

    for ts in (18, 30, 54, 90, 135):
        for mt in (4, 8, 16):
            if mt > ts:
                continue
            try:
                t = timed(ts, mt)
                print(f"TS={ts:3d} MT={mt:2d}: {t*1e3:6.2f} ms/site "
                      f"{FLOPS/t/1e12:5.0f} TF/s-eq", flush=True)
            except Exception as e:
                print(f"TS={ts:3d} MT={mt:2d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
