"""Megakernel experiment 2: make the fused conv unit fast.

Variants (all same math as mk1, B=8 H=270 W=480 C=128->128 bf16):
  A: mk1 control — 9 tap dots, full-strip f32 slice-adds     (3.79 ms meas.)
  B: A + double-buffered input DMA
  C: K-packed — X3 = lane-concat of 3 aligned dy-shifts (N,384);
     per dx: one (N,384)@(384,128) dot; 3 adds; double-buffered
  D: C with pltpu.roll for the dx shifts
  E: row-tiled — fori over M-tiles, 9 small dots per tile with a
     register-resident accumulator
Each is checked exact vs XLA then timed with the chained-stats protocol.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO = 8, 270, 480, 128, 128
WP = W + 8


def _prologue(x, stat_ref):
    a = stat_ref[0, 0, :].astype(jnp.float32)
    c = stat_ref[0, 1, :].astype(jnp.float32)
    return jnp.maximum(x.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)


def _epilogue(acc, cb_ref, y_ref, sout_ref, i):
    acc = acc + cb_ref[0, :].astype(jnp.float32)
    y_ref[0, :, :, :] = acc.astype(jnp.bfloat16)
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


def _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS):
    return pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * TH, TH + 2)],
        xs_ref.at[slot, pl.ds(0, TH + 2)], sem_ref.at[slot])


# ---------------- variant A/B: 9 dots + slice adds ----------------

def _kernel_ab(stat_ref, w_ref, cb_ref, x_ref, y_ref, sout_ref,
               xs_ref, sem_ref, *, TH, NS, double_buf):
    b = pl.program_id(0)
    i = pl.program_id(1)
    if double_buf:
        slot = jax.lax.rem(i, 2)
        nxt = 1 - slot

        @pl.when(i == 0)
        def _():
            _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).start()

        @pl.when(i + 1 < NS)
        def _():
            _start_dma(x_ref, xs_ref, sem_ref, b, i + 1, nxt, TH, NS).start()

        _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).wait()
        x = xs_ref[slot]
    else:
        d = _start_dma(x_ref, xs_ref, sem_ref, b, i, 0, TH, NS)
        d.start()
        d.wait()
        x = xs_ref[0]

    x = _prologue(x, stat_ref)
    x2 = x.reshape((TH + 3) * WP, C)[0:(TH + 2) * WP]
    acc = jnp.zeros((TH, W, CO), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            yf = jnp.dot(x2, w_ref[dy * 3 + dx],
                         preferred_element_type=jnp.float32)
            yf = yf.reshape(TH + 2, WP, CO)
            acc = acc + yf[dy:dy + TH, dx:dx + W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


# ---------------- variant C/D: K-packed dy, shifted dx ----------------

def _kernel_cd(stat_ref, w3_ref, cb_ref, x_ref, y_ref, sout_ref,
               xs_ref, sem_ref, *, TH, NS, use_roll):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).start()

    @pl.when(i + 1 < NS)
    def _():
        _start_dma(x_ref, xs_ref, sem_ref, b, i + 1, 1 - slot, TH, NS).start()

    _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).wait()
    x = _prologue(xs_ref[slot], stat_ref)
    x2 = x.reshape((TH + 3) * WP, C)
    N = TH * WP
    # X3: (N+8, 3C) — row r holds [x2[r], x2[r+WP], x2[r+2WP]]
    x3 = jnp.concatenate(
        [x2[0:N + 8, :], x2[WP:WP + N + 8, :], x2[2 * WP:2 * WP + N + 8, :]],
        axis=1)
    accs = []
    for dx in range(3):
        if use_roll:
            xdx = pltpu.roll(x3, -dx, 0)[0:N, :] if dx else x3[0:N, :]
        else:
            xdx = jax.lax.dynamic_slice(x3, (dx, 0), (N, 3 * C)) if dx else x3[0:N, :]
        accs.append(jnp.dot(xdx, w3_ref[dx],
                            preferred_element_type=jnp.float32))
    acc = (accs[0] + accs[1] + accs[2]).reshape(TH, WP, CO)[:, 0:W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


# ---------------- variant E: row-tiled register accumulation ----------------

def _kernel_e(stat_ref, w_ref, cb_ref, x_ref, y_ref, sout_ref,
              xs_ref, sem_ref, *, TH, NS, MT):
    b = pl.program_id(0)
    i = pl.program_id(1)
    slot = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).start()

    @pl.when(i + 1 < NS)
    def _():
        _start_dma(x_ref, xs_ref, sem_ref, b, i + 1, 1 - slot, TH, NS).start()

    _start_dma(x_ref, xs_ref, sem_ref, b, i, slot, TH, NS).wait()
    x = _prologue(xs_ref[slot], stat_ref)
    x2 = x.reshape((TH + 3) * WP, C)
    N = TH * WP
    nt = N // MT
    out = jnp.zeros((N, CO), jnp.float32)

    def tile(t, out):
        r0 = t * MT
        acc = jnp.zeros((MT, CO), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                xs_t = jax.lax.dynamic_slice(
                    x2, (r0 + dy * WP + dx, 0), (MT, C))
                acc = acc + jnp.dot(xs_t, w_ref[dy * 3 + dx],
                                    preferred_element_type=jnp.float32)
        return jax.lax.dynamic_update_slice(out, acc, (r0, 0))

    out = jax.lax.fori_loop(0, nt, tile, out)
    acc = out.reshape(TH, WP, CO)[:, 0:W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


# ---------------- harness ----------------

def build(variant, TH):
    NS = H // TH
    if variant in ("A", "B"):
        kern = functools.partial(_kernel_ab, TH=TH, NS=NS,
                                 double_buf=(variant == "B"))
        nbuf = 2 if variant == "B" else 1
        wspec = pl.BlockSpec((9, C, CO), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    elif variant in ("C", "D"):
        kern = functools.partial(_kernel_cd, TH=TH, NS=NS,
                                 use_roll=(variant == "D"))
        nbuf = 2
        wspec = pl.BlockSpec((3, 3 * C, CO), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_kernel_e, TH=TH, NS=NS, MT=512)
        nbuf = 2
        wspec = pl.BlockSpec((9, C, CO), lambda b, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    def f(x_pad, stat, w, cb):
        return pl.pallas_call(
            kern,
            grid=(B, NS),
            in_specs=[
                pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                wspec,
                pl.BlockSpec((1, CO), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
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
                pltpu.VMEM((nbuf, TH + 3, WP, C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )(stat, w, cb, x_pad)

    return f


def xla_unit(x_pad, stat, w, cb):
    x_pad = x_pad[:, :, : x_pad.shape[2] - 6]
    a = stat[:, 0, None, None, :]
    c = stat[:, 1, None, None, :]
    xn = jnp.maximum(x_pad.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + cb[0]
    s1 = jnp.sum(y, axis=(1, 2))
    s2 = jnp.sum(y * y, axis=(1, 2))
    return y.astype(jnp.bfloat16), jnp.stack([s1, s2], axis=1)


def _finalize(s, n):
    mean = s[:, 0] / n
    var = s[:, 1] / n - mean * mean
    inv = jax.lax.rsqrt(var + 1e-5)
    return jnp.stack([inv, -mean * inv], axis=1)


def bench(fn, chain=8, repeats=3):
    def run(ch):
        def chained(x0, stat0, w, cb):
            def body(j, carry):
                x, stat = carry
                y, s = fn(x, stat, w, cb)
                xn = jnp.pad(y, ((0, 0), (1, 1), (1, 7), (0, 0))).astype(x.dtype)
                return xn, _finalize(s, float(H * W))
            x, stat = jax.lax.fori_loop(0, ch, body, (x0, stat0))
            return jnp.sum(x.astype(jnp.float32)) + jnp.sum(stat)
        g = jax.jit(chained)

        def mk(seed):
            x = jax.random.normal(jax.random.key(seed), (B, H + 2, WP, C),
                                  jnp.bfloat16)
            st = jax.random.normal(jax.random.key(seed + 9), (B, 2, C),
                                   jnp.float32) * 0.1
            return x, st
        w, cb = mkw()
        args = (*mk(0), w, cb)
        float(g(*args))
        best = float("inf")
        for r in range(repeats):
            args = (*mk(100 * ch + r), w, cb)
            for a in args:
                float(jnp.sum(a.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    tK, t1 = run(chain), run(1)
    return (tK - t1) / (chain - 1)


def mkw():
    w = jax.random.normal(jax.random.key(1), (3, 3, C, CO), jnp.bfloat16) * 0.05
    cb = jax.random.normal(jax.random.key(2), (1, CO), jnp.float32)
    return w, cb


def wfor(variant, w):
    if variant in ("C", "D"):
        # w3[dx] = [w[0,dx]; w[1,dx]; w[2,dx]] stacked along K
        return jnp.stack([jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]],
                                          axis=0) for dx in range(3)])
    return w.reshape(9, C, CO)


def main():
    import sys
    variants = sys.argv[1:] or ["A", "B", "C", "E"]
    print("device:", jax.devices()[0])
    w, cb = mkw()
    x = jax.random.normal(jax.random.key(7), (B, H + 2, WP, C), jnp.bfloat16)
    st = jax.random.normal(jax.random.key(8), (B, 2, C), jnp.float32) * 0.1
    yr, sr = jax.jit(xla_unit)(x, st, w, cb)
    flops = 2 * B * H * W * 9 * C * CO

    t = bench(lambda x, s, w_, cb_: xla_unit(x, s, w_, cb_))
    print(f"XLA  : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s")

    for v in variants:
        TH = 18
        try:
            f = build(v, TH)
            wv = wfor(v, w)
            yf, sf = jax.jit(lambda x, s: f(x, s, wv, cb))(x, st)
            err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) -
                                        yr.astype(jnp.float32))))
            t = bench(lambda x, s, w_, cb_: f(x, s, w_, cb_))
            print(f"{v}    : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s   maxerr {err:.1e}")
        except Exception as e:
            print(f"{v}    : FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
