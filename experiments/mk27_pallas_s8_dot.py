"""mk27: can Mosaic drive the MXU's int8 path, and at what throughput?

Step 1 of the Pallas int8 fused-site plan (PERF.md round-3: XLA int8 is
NEGATIVE because the quantize passes materialize; the fix is quantizing in
the kernel prologue from VMEM). Before building site kernels, validate:

  A. s8 x s8 -> i32 jnp.dot compiles in a Pallas TPU kernel and is exact.
  B. Its throughput vs the same kernel doing bf16 dots (target ~2x).
  C. Whether s8 VMEM scratch tolerates the unaligned row slices the site
     kernels need (offsets r0+dx, dx in {0,1,2}; s8 tile = 32 sublanes),
     or whether the quantized values must live in bf16 scratch and be cast
     to s8 per dot operand.

Run: python -u experiments/mk27_pallas_s8_dot.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

ROWS = 8192          # flat rows per block
C = 128
CO = 128
MT = 1024            # M-tile rows
REPS = 6             # dots per tile per pass (emulates 9-tap conv reuse)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# --- A/B kernels: same structure, different operand dtype -----------------

def _k_bf16(x_ref, w_ref, o_ref):
    for t in range(ROWS // MT):
        acc = None
        for r in range(REPS):
            p = jnp.dot(x_ref[t * MT + r : t * MT + r + MT, :], w_ref[r],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        o_ref[t * MT : (t + 1) * MT] = acc.astype(jnp.bfloat16)


def _k_s8_aligned(x_ref, w_ref, o_ref):
    """s8 operands, tile-aligned slices only (r shifts via aligned offset)."""
    for t in range(ROWS // MT):
        acc = None
        for r in range(REPS):
            p = jnp.dot(x_ref[t * MT + 32 * r : t * MT + 32 * r + MT, :],
                        w_ref[r], preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        o_ref[t * MT : (t + 1) * MT] = acc.astype(jnp.bfloat16)


def _k_s8_unaligned(x_ref, w_ref, o_ref):
    """s8 operands, rows sliced at +0/+1/+2 like the conv tap shifts."""
    for t in range(ROWS // MT):
        acc = None
        for r in range(REPS):
            p = jnp.dot(x_ref[t * MT + r : t * MT + r + MT, :], w_ref[r],
                        preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        o_ref[t * MT : (t + 1) * MT] = acc.astype(jnp.bfloat16)


def _k_bf16cast(x_ref, w_ref, o_ref):
    """bf16 scratch holding quantized integers; cast to s8 per dot operand."""
    for t in range(ROWS // MT):
        acc = None
        for r in range(REPS):
            xs = x_ref[t * MT + r : t * MT + r + MT, :].astype(jnp.int8)
            p = jnp.dot(xs, w_ref[r], preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        o_ref[t * MT : (t + 1) * MT] = acc.astype(jnp.bfloat16)


GRID = 32
CHAIN = 20


def build(kern, xdt, wdt):
    def f(x, w):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((ROWS + 64, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((REPS, C, CO), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, CO), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, CO), jnp.bfloat16),
            compiler_params=_params(),
        )(x.astype(xdt), w.astype(wdt))

    return f, xdt


def timeit(fx, x, w):
    """In-graph chain (fori_loop feedback) minus 1-chain, fresh inputs."""
    f, xdt = fx

    def chain(x, w, n):
        def body(i, xc):
            out = f(xc, w)
            return jnp.pad(out, ((0, 64), (0, 0))).astype(xdt)

        y = jax.lax.fori_loop(0, n, body, x.astype(xdt))
        return jnp.sum(y.astype(jnp.float32))

    gN = jax.jit(functools.partial(chain, n=CHAIN))
    g1 = jax.jit(functools.partial(chain, n=1))

    def best(g):
        b = float("inf")
        for r in range(3):
            xi = x + r
            float(jnp.sum(xi.astype(jnp.float32)))
            float(g(xi, w))  # warm on first rep (compile)
            t0 = time.perf_counter()
            float(g(xi + 1, w))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(gN) - best(g1)) / (CHAIN - 1)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    x_int = rng.integers(-100, 100, (ROWS + 64, C)).astype(np.float32)
    w_int = rng.integers(-100, 100, (REPS, C, CO)).astype(np.float32)
    x = jnp.asarray(x_int)
    w = jnp.asarray(w_int)

    # exactness oracle (f64-free: i32 math in numpy)
    def oracle(kname):
        acc = np.zeros((ROWS, CO), np.int64)
        for t in range(ROWS // MT):
            a = None
            for r in range(REPS):
                off = 32 * r if kname == "aligned" else r
                p = x_int[t * MT + off : t * MT + off + MT].astype(np.int64) \
                    @ w_int[r].astype(np.int64)
                a = p if a is None else a + p
            acc[t * MT : (t + 1) * MT] = a
        return acc

    results = {}
    for name, kern, xdt in [
        ("bf16", _k_bf16, jnp.bfloat16),
        ("s8_unaligned", _k_s8_unaligned, jnp.int8),
        ("bf16cast", _k_bf16cast, jnp.bfloat16),
    ]:
        wdt = jnp.int8 if "s8" in name or name == "bf16cast" else jnp.bfloat16
        try:
            fx = build(kern, xdt, wdt)
            if name == "s8_unaligned":  # exactness (oracle is slow; once)
                out = np.asarray(jax.jit(fx[0])(x.astype(xdt), w.astype(wdt))
                                 ).astype(np.float64)
                ref = oracle("shift")
                refb = np.asarray(jnp.asarray(ref, jnp.float32)
                                  .astype(jnp.bfloat16)).astype(np.float64)
                print(f"[{name}] max err vs i64 oracle (bf16-rounded): "
                      f"{np.max(np.abs(out - refb))}", flush=True)
            dt = timeit(fx, x, w)
            flops = GRID * ROWS * C * CO * 2 * REPS
            results[name] = dt
            print(f"[{name}] {dt*1e3:.3f} ms/call  {flops/dt/1e12:.1f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    if "bf16" in results:
        for k, v in results.items():
            if k != "bf16":
                print(f"{k}: {results['bf16']/v:.2f}x vs bf16")


if __name__ == "__main__":
    main()
