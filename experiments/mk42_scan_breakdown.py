"""mk42: temporal_postprocess_scan attribution @1080p B8 — no DIS in the
graph (flows are random inputs), so every cell compiles in seconds where
mk38's DIS+scan cells took 10+ relay minutes each.

Rows (public knobs of the same scan):
  full      : flow_ema + smooth_lightness + motion_blend (bench flow config)
  no_blend  : motion_blend off        -> hoisted-blend residual cost
  no_lab    : + smooth_lightness off  -> LAB round trip cost
  no_ema    : + flow_ema off          -> flow warp cost (the per-frame
              bilinear gather; ops/warp.py measured ~34 ms/1080p round 2)
  floor     : scan with everything off = uniform blend + scan overhead

Also times ops.warp.warp_flow standalone at 1080p (the scan-independent
number the mk39 packing A/B optimizes).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu.ops.warp import warp_flow
from neuralstyletransferv1_tpu.temporal.ema import temporal_postprocess_scan

H, W = 1080, 1920
B = 8
CHAIN = 4
SALT = (time.time_ns() // 1000) % 1_000_000_007


def bench(label, fn, mk, chain=CHAIN):
    def f(args, n):
        def body(i, acc):
            return acc + fn(*args, salt=acc * 1e-6)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    gN = jax.jit(functools.partial(f, n=chain))
    g1 = jax.jit(functools.partial(f, n=1))

    def run(g):
        a = mk(0)
        float(g(a))
        best = float("inf")
        for r in range(2):
            a = mk(100 + r)
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            float(g(a))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (chain - 1) / B
    print(f"[{label}] {t * 1e3:.2f} ms/frame", flush=True)
    return t


def mk_inputs(s):
    k = lambda i: jax.random.key(s + SALT + i)  # noqa: E731
    styled = jax.random.uniform(k(0), (B, H, W, 3), jnp.float32)
    orig = jax.random.uniform(k(1), (B, H, W, 3), jnp.float32)
    flows = jax.random.normal(k(2), (B, H, W, 2), jnp.float32) * 3.0
    return styled, orig, flows


def main():
    print("device:", jax.devices()[0], flush=True)

    def scan_fn(**kw):
        def fn(styled, orig, flows, salt=0.0):
            out, _ = temporal_postprocess_scan(
                styled + salt, orig, flows, blend=0.9, **kw)
            return jnp.mean(out)
        return fn

    rows = [
        ("full", dict(flow_ema=True, flow_alpha=0.6, smooth_lightness=True,
                      motion_blend=True)),
        ("no_blend", dict(flow_ema=True, flow_alpha=0.6,
                          smooth_lightness=True, motion_blend=False)),
        ("no_lab", dict(flow_ema=True, flow_alpha=0.6,
                        smooth_lightness=False, motion_blend=False)),
        ("no_ema", dict(flow_ema=False, smooth_lightness=False,
                        motion_blend=False)),
    ]
    res = {}
    for name, kw in rows:
        res[name] = bench(name, scan_fn(**kw), mk_inputs)

    # standalone single-frame warp (the scan's per-step gather, isolated)
    def warp_one(styled, orig, flows, salt=0.0):
        return jnp.mean(warp_flow(styled[0] + salt, flows[0]))

    t = bench("warp_flow 1x1080p", warp_one, mk_inputs)
    print(f"  (x{B} frames = {t * B * 1e3:.1f} ms/batch-equivalent)")

    print("\n--- attribution (ms/frame @1080p B8) ---")
    print(f"motion_blend(hoisted) {1e3 * (res['full'] - res['no_blend']):.2f}")
    print(f"lab_roundtrip         {1e3 * (res['no_blend'] - res['no_lab']):.2f}")
    print(f"flow_ema(warp)        {1e3 * (res['no_lab'] - res['no_ema']):.2f}")
    print(f"floor(uniform+scan)   {1e3 * res['no_ema']:.2f}")
    print(f"full                  {1e3 * res['full']:.2f}")


if __name__ == "__main__":
    main()
