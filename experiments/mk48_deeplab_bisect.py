"""mk48: component bisection of the masked-stylize step (config #4).

mk44 (engine form, bf16 glue): 50.1 ms/frame device, rollup dominated by
~1.6-3 ms copies/fusions that the op names don't attribute. Time each
component alone with the bench protocol to find the carrier. Hypothesis:
jax.image.resize lowers to einsums contracting SPATIAL dims of NHWC
tensors — each needs the contracted dim in lanes, i.e. a transpose copy
of a ~100 MB tensor, twice per resize.

  full      : engine make_masked_stylize_step (bf16)
  stylize   : Johnson s2d2 @1080p B4 bf16 alone
  mask      : resize-in + deeplab + argmax + alpha upsample
  mask_net  : deeplab @513 alone (input pre-sized)
  resize_in : resize_bilinear 1080p->513 bf16 alone
  alpha_up  : resize_bilinear [B,513,513,1]->1080p bf16 alone
  composite : styled*a + x*(1-a) at 1080p alone

Protocol per CLAUDE.md (fresh salted inputs, chain-minus-1, scalar
fetch); crash-isolated cells.
"""

import functools
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

H, W = 1080, 1920
B = 4
CHAIN = 4
SALT = (time.time_ns() // 1000) % 1_000_000_007


def _steps(name):
    from mk43_deeplab_bf16 import bench_params, load_params
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear

    if name == "full":
        from neuralstyletransferv1_tpu.engine.masked_stylize import (
            make_masked_stylize_step)
        step = make_masked_stylize_step(load_params(), bench_params(), (H, W))
        return step, lambda k: jax.random.uniform(k, (B, H, W, 3),
                                                  jnp.float32)
    if name == "stylize":
        from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d
        bp = bench_params()

        def step(x):
            return jnp.clip(s2d.apply(bp, x), 0.0, 1.0)
        return step, lambda k: jax.random.uniform(k, (B, H, W, 3),
                                                  jnp.bfloat16)
    if name in ("mask", "mask_net"):
        from neuralstyletransferv1_tpu.engine.masked_stylize import (
            cast_params)
        from neuralstyletransferv1_tpu.models import deeplab as dl
        dlp = cast_params(load_params(), jnp.bfloat16)

        if name == "mask":
            def step(x):
                small = resize_bilinear(x.astype(jnp.bfloat16), (513, 513))
                logits = dl.apply(dlp, small * 2.0 - 1.0)
                a = (jnp.argmax(logits, -1) != 0).astype(jnp.bfloat16)
                return resize_bilinear(a[..., None], (H, W))
            return step, lambda k: jax.random.uniform(k, (B, H, W, 3),
                                                      jnp.float32)

        def step(x):
            return dl.apply(dlp, x)
        return step, lambda k: jax.random.uniform(k, (B, 513, 513, 3),
                                                  jnp.bfloat16)
    if name == "resize_in":
        def step(x):
            return resize_bilinear(x, (513, 513))
        return step, lambda k: jax.random.uniform(k, (B, H, W, 3),
                                                  jnp.bfloat16)
    if name == "alpha_up":
        def step(a):
            return resize_bilinear(a, (H, W))
        return step, lambda k: jax.random.uniform(k, (B, 513, 513, 1),
                                                  jnp.bfloat16)
    if name == "composite":
        def step(x):
            a = x[..., :1]
            return x * a + x * (1.0 - a)
        return step, lambda k: jax.random.uniform(k, (B, H, W, 3),
                                                  jnp.float32)
    raise KeyError(name)


CELLS = ["full", "stylize", "mask", "mask_net", "resize_in", "alpha_up",
         "composite"]


def run_cell(name):
    from neuralstyletransferv1_tpu import config
    config.set_conv_precision("default")
    step, mk_in = _steps(name)

    def f(x, n):
        def body(i, acc):
            return acc + jnp.sum(
                step(x + (acc * 1e-9).astype(x.dtype)).astype(jnp.float32)
            ) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    gN = jax.jit(functools.partial(f, n=CHAIN))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        return mk_in(jax.random.key(s + SALT))

    def run(g):
        float(g(mk(0)))
        best = float("inf")
        for r in range(3):
            x = mk(100 + r)
            float(jnp.sum(x[0, :2].astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1) / B
    print(f"CELL {name} {t * 1e3:.4f}", flush=True)


def main():
    res = {}
    for name in CELLS:
        for attempt in (1, 2):
            try:
                p = subprocess.run(
                    [sys.executable, "-u", __file__, "--cell", name],
                    capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                print(f"[{name}] TIMEOUT attempt {attempt}", flush=True)
                continue
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith("CELL ")), None)
            if line is not None:
                res[name] = float(line.split()[-1])
                print(f"[{name}] {res[name]:.2f} ms/frame", flush=True)
                break
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
            print(f"[{name}] CRASHED attempt {attempt} (rc={p.returncode}): "
                  f"{' | '.join(tail)}", flush=True)
            if attempt == 1:
                time.sleep(30)
    if res:
        print("\n--- mk48 @1080p B4 bf16, ms/frame ---")
        for k in CELLS:
            if k in res:
                print(f"{k:10s} {res[k]:7.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        print("device:", jax.devices()[0], flush=True)
        run_cell(sys.argv[2])
    else:
        main()
