"""mk21: res-site kernel structure sweep (bf16 vs int8).

Variants on the 270x480x128 3x3 conv (B8), all chained in-graph:
  - tap9:  9 shifted K=128 dots (mk20 baseline)
  - k384:  im2col-by-dx — scratch holds [x(c-1), x(c), x(c+1)] as 384 lanes,
           3 dots of K=384 (fewer, MXU-fatter dots; 2 extra VPU copies)
  - MT in {2W, 4W}
  - noq:   int8 without the prologue requant (input already int8) — isolates
           the requant cost from the dot cost.
XLA bf16 reference for the same op measured via lax.conv for calibration.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 8, 272, 488, 128
TS = 8
FLOPS = 2 * B * H * W * C * C * 9


def _cp():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def kern(body_ref, tail_ref, w_ref, o_ref, xs_ref, x3_ref, *,
         mode, mt_rows, in_int8):
    int8 = mode.endswith("i8")
    xb = body_ref[0]
    xt = tail_ref[0]
    if int8 and not in_int8:
        xb = jnp.clip(jnp.round(xb.astype(jnp.float32) * 16.0), -127, 127) \
            .astype(jnp.int8)
        xt = jnp.clip(jnp.round(xt.astype(jnp.float32) * 16.0), -127, 127) \
            .astype(jnp.int8)
    sdt = jnp.int8 if int8 else jnp.bfloat16
    xs_ref[0:TS * W] = xb.reshape(TS * W, C).astype(sdt)
    xs_ref[TS * W:(TS + 2) * W] = xt.reshape(2 * W, C).astype(sdt)
    xs_ref[(TS + 2) * W:(TS + 3) * W] = jnp.zeros((W, C), sdt)
    MT = mt_rows
    N = TS * W
    acc_t = jnp.int32 if int8 else jnp.float32
    if mode.startswith("k384"):
        # build the 3-dx-concat view once per strip: (rows, 3C)
        x3_ref[:, 0:C] = xs_ref[0:(TS + 2) * W]
        x3_ref[:, C:2 * C] = xs_ref[1:(TS + 2) * W + 1]
        x3_ref[:, 2 * C:3 * C] = xs_ref[2:(TS + 2) * W + 2]
        for t in range(N // MT):
            r0 = t * MT
            acc = None
            for dy in range(3):
                s = r0 + dy * W
                p = jnp.dot(x3_ref[s:s + MT, :], w_ref[dy],
                            preferred_element_type=acc_t)
                acc = p if acc is None else acc + p
            o_ref[0, r0 // W:r0 // W + MT // W] = \
                (acc.astype(jnp.float32) * (1 / 256.0)).reshape(MT // W, W, C) \
                .astype(jnp.bfloat16)
    else:
        w9 = w_ref
        for t in range(N // MT):
            r0 = t * MT
            acc = None
            for dy in range(3):
                for dx in range(3):
                    s = r0 + dy * W + dx
                    p = jnp.dot(xs_ref[s:s + MT, :], w9[dy * 3 + dx],
                                preferred_element_type=acc_t)
                    acc = p if acc is None else acc + p
            o_ref[0, r0 // W:r0 // W + MT // W] = \
                (acc.astype(jnp.float32) * (1 / 256.0)).reshape(MT // W, W, C) \
                .astype(jnp.bfloat16)


def make_fn(mode, mt_rows, in_int8=False):
    int8 = mode.endswith("i8")
    sdt = jnp.int8 if int8 else jnp.bfloat16
    k = functools.partial(kern, mode=mode, mt_rows=mt_rows, in_int8=in_int8)
    k384 = mode.startswith("k384")
    wshape = (3, 3 * C, C) if k384 else (9, C, C)
    scr = [pltpu.VMEM(((TS + 3) * W, C), sdt)]
    scr.append(pltpu.VMEM(((TS + 2) * W + 2, 3 * C), sdt) if k384
               else pltpu.VMEM((8, C), sdt))

    in_dt = jnp.int8 if (int8 and in_int8) else jnp.bfloat16

    def f(x, w):
        return pl.pallas_call(
            k,
            grid=(B, H // TS),
            in_specs=[
                pl.BlockSpec((1, TS, W, C), lambda b, j: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, W, C), lambda b, j: (b, 4 * j + 4, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wshape, lambda b, j: (0,) * len(wshape),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TS, W, C), lambda b, j: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
            scratch_shapes=scr,
            compiler_params=_cp(),
        )(x, x, w)

    def chain(x, w, n):
        def body(i, y):
            out = f(y if in_dt != jnp.int8 else
                    jnp.clip(jnp.round(y * 16.0), -127, 127).astype(jnp.int8),
                    w) * 0.01
            return jnp.pad(out, ((0, 0), (0, 2), (0, 0), (0, 0)))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    g8 = jax.jit(functools.partial(chain, n=8))
    g1 = jax.jit(functools.partial(chain, n=1))

    def make(s):
        kk = jax.random.key(s)
        x = jax.random.normal(kk, (B, H + 2, W, C), jnp.bfloat16)
        if int8:
            w = jax.random.randint(kk, wshape, -127, 127, jnp.int8)
        else:
            w = jax.random.normal(kk, wshape, jnp.bfloat16)
        return x, w

    return (g8, g1), make


def run_one(name, mode, mt_mul, in_int8=False):
    try:
        (g8, g1), make = make_fn(mode, mt_mul * W, in_int8)

        def run(g):
            x, w = make(0)
            float(g(x, w))
            best = float("inf")
            for r in range(3):
                x, w = make(100 + r)
                float(jnp.sum(x[:1, :1, :1].astype(jnp.float32)))
                t0 = time.perf_counter()
                float(g(x, w))
                best = min(best, time.perf_counter() - t0)
            return best

        t = (run(g8) - run(g1)) / 7.0
        print(f"[{name}] {t*1e3:.2f} ms/conv  {FLOPS/t/1e12:.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}"[:500], flush=True)


def xla_ref():
    wk = jax.random.normal(jax.random.key(1), (3, 3, C, C), jnp.bfloat16)

    def f(x, w):
        def body(i, y):
            out = jax.lax.conv_general_dilated(
                y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) * 0.01
            return out.astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, 8, body, x).astype(jnp.float32))

    def f1(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.sum(out)

    g8, g1 = jax.jit(f), jax.jit(f1)

    def run(g):
        best = float("inf")
        x = jax.random.normal(jax.random.key(0), (B, H, W, C), jnp.bfloat16)
        float(g(x, wk))
        for r in range(3):
            x = jax.random.normal(jax.random.key(100 + r), (B, H, W, C),
                                  jnp.bfloat16)
            float(jnp.sum(x[:1, :1, :1].astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(x, wk))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(g8) - run(g1)) / 7.0
    print(f"[XLA bf16 conv ref] {t*1e3:.2f} ms/conv  {FLOPS/t/1e12:.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    xla_ref()
    for mt in (2, 4):
        run_one(f"tap9-bf16 MT={mt}W", "tap9", mt)
        run_one(f"tap9-int8 MT={mt}W", "tap9i8", mt)
        run_one(f"k384-bf16 MT={mt}W", "k384", mt)
        run_one(f"k384-int8 MT={mt}W", "k384i8", mt)
    run_one("tap9-int8-noquant MT=4W", "tap9i8", 4, in_int8=True)
    run_one("k384-int8-noquant MT=4W", "k384i8", 4, in_int8=True)
