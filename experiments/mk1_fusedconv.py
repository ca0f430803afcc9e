"""Megakernel experiment 1: fused affine+ReLU -> 3x3 conv -> IN-stats.

The unit under test is one res-block conv site at the 270 grid
(B=8, H=270, W=480, C=128 -> 128, bf16 activations, f32 accumulation):

  XLA today:  y_raw = conv(pad(apply_relu(x_raw, stats)))   [3 HBM passes]
  fused:      one Pallas kernel reads x_raw (padded), applies the deferred
              per-(b,c) affine+ReLU in VMEM, runs 9 tap matmuls on the MXU,
              writes y_raw once and accumulates per-(b,c) sum/sumsq.

If the fused kernel's wall time beats XLA's (conv + separate stats/apply
passes), the whole s2d2 net can be rebuilt on it (PERF.md roofline says
~25 ms/B8 of elementwise traffic is recoverable).

Run on the real TPU: python _work/mk1_fusedconv.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ----------------------------------------------------------------------
# fused kernel
# ----------------------------------------------------------------------

def _kernel(stat_ref, w_ref, cb_ref, x_ref, y_ref, sout_ref, xs_ref, sem_ref,
            *, TH, W, C, CO, NS, prologue):
    b = pl.program_id(0)
    i = pl.program_id(1)

    # DMA the input strip (TH+2 rows of the padded raw tensor) into VMEM.
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * TH, TH + 2)],
        xs_ref,
        sem_ref,
    )
    dma.start()
    dma.wait()

    x = xs_ref[:]                                   # (TH+2, W+8, C) bf16
    if prologue == "affine_relu":
        a = stat_ref[0, 0, :].astype(jnp.float32)   # (C,)
        c = stat_ref[0, 1, :].astype(jnp.float32)
        xf = x.astype(jnp.float32) * a + c
        x = jnp.maximum(xf, 0.0).astype(jnp.bfloat16)
    x2 = x.reshape((TH + 2) * (W + 8), C)

    acc = jnp.zeros((TH, W, CO), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            k = dy * 3 + dx
            yf = jnp.dot(x2, w_ref[k], preferred_element_type=jnp.float32)
            yf = yf.reshape(TH + 2, W + 8, CO)
            acc = acc + yf[dy:dy + TH, dx:dx + W, :]

    acc = acc + cb_ref[0, :].astype(jnp.float32)
    y_ref[0, :, :, :] = acc.astype(jnp.bfloat16)

    # stats epilogue: per-channel sum / sumsq accumulated across strips
    s1 = jnp.sum(acc, axis=(0, 1))
    s2 = jnp.sum(acc * acc, axis=(0, 1))

    @pl.when(i == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(i > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2


def fused_conv(x_pad, w9, cb, stat, *, TH, prologue="affine_relu"):
    """x_pad: (B, H+2, W+2, C) bf16 raw. stat: (B, 2, C) f32 [a, c].
    w9: (9, C, CO) bf16.  Returns y (B, H, W, CO) bf16, sout (B, 2, CO) f32.
    """
    B, Hp, Wp, C = x_pad.shape
    H, W = Hp - 2, Wp - 8
    CO = w9.shape[-1]
    NS = H // TH
    assert NS * TH == H
    kern = functools.partial(_kernel, TH=TH, W=W, C=C, CO=CO, NS=NS,
                             prologue=prologue)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, CO), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, CO), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, CO), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, CO), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W + 8, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(stat, w9, cb, x_pad)


# ----------------------------------------------------------------------
# XLA reference (what the net does today)
# ----------------------------------------------------------------------

def xla_unit(x_pad, w, cb, stat, prologue="affine_relu"):
    x_pad = x_pad[:, :, : x_pad.shape[2] - 6]     # drop junk cols -> W+2
    if prologue == "affine_relu":
        a = stat[:, 0, None, None, :]
        c = stat[:, 1, None, None, :]
        xn = jnp.maximum(x_pad.astype(jnp.float32) * a + c, 0.0)
        xn = xn.astype(jnp.bfloat16)
    else:
        xn = x_pad
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + cb
    s1 = jnp.sum(y, axis=(1, 2))
    s2 = jnp.sum(y * y, axis=(1, 2))
    return y.astype(jnp.bfloat16), jnp.stack([s1, s2], axis=1)


# ----------------------------------------------------------------------
# timing protocol (axon quirks: fresh inputs, scalar fetch, K-chain)
# ----------------------------------------------------------------------

def _finalize(s, n):
    """(B,2,C) sum/sumsq -> (B,2,C) [a, c] affine for the next prologue."""
    mean = s[:, 0] / n
    var = s[:, 1] / n - mean * mean
    inv = jax.lax.rsqrt(var + 1e-5)
    return jnp.stack([inv, -mean * inv], axis=1)


def bench(fn, args_fn, n_px, chain=8, repeats=3):
    """fn(x_pad, stat) -> (y, s).  Chains stats into the next prologue so
    nothing is DCE-able — the real megakernel dataflow."""
    def run(ch):
        def chained(x0, stat0):
            def body(j, carry):
                x, stat = carry
                y, s = fn(x, stat)
                xn = jnp.pad(y, ((0, 0), (1, 1), (1, 7), (0, 0))).astype(x.dtype)
                return xn, _finalize(s, n_px)
            x, stat = jax.lax.fori_loop(0, ch, body, (x0, stat0))
            return jnp.sum(x.astype(jnp.float32)) + jnp.sum(stat)
        g = jax.jit(chained)
        args = args_fn(0)
        float(g(*args))
        best = float("inf")
        for r in range(repeats):
            args = args_fn(100 * ch + r)
            for a in args:
                float(jnp.sum(a.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    tK, t1 = run(chain), run(1)
    return (tK - t1) / (chain - 1)


def main():
    B, H, W, C, CO = 8, 270, 480, 128, 128
    TH = 18
    key = jax.random.key(0)

    def mk(seed):
        k = jax.random.key(seed)
        x = jax.random.normal(k, (B, H + 2, W + 8, C), jnp.bfloat16)
        st = jax.random.normal(jax.random.key(seed + 9), (B, 2, C),
                               jnp.float32) * 0.1
        return (x, st)

    w = jax.random.normal(jax.random.key(1), (3, 3, C, CO), jnp.bfloat16) * 0.05
    w9 = w.reshape(9, C, CO)
    cb = jax.random.normal(jax.random.key(2), (1, CO), jnp.float32)
    stat = jax.random.normal(jax.random.key(3), (B, 2, C), jnp.float32) * 0.1

    print("device:", jax.devices()[0])

    # -------- correctness --------
    x, st = mk(7)
    yf, sf = jax.jit(lambda x, st: fused_conv(x, w9, cb[0:1], st, TH=TH))(x, st)
    yr, sr = jax.jit(lambda x, st: xla_unit(x, w, cb[0], st))(x, st)
    err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) - yr.astype(jnp.float32))))
    serr = float(jnp.max(jnp.abs(sf - sr) / (jnp.abs(sr) + 1.0)))
    print(f"max |y_fused - y_xla| = {err:.3e}   rel stats err = {serr:.3e}")

    # -------- timing --------
    n_px = float(H * W)
    t_fused = bench(lambda x, st: fused_conv(x, w9, cb[0:1], st, TH=TH), mk, n_px)
    t_xla = bench(lambda x, st: xla_unit(x, w, cb[0], st), mk, n_px)
    flops = 2 * B * H * W * 9 * C * CO
    print(f"fused : {t_fused*1e3:8.3f} ms   {flops/t_fused/1e12:6.1f} TF/s")
    print(f"xla   : {t_xla*1e3:8.3f} ms   {flops/t_xla/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
