"""Megakernel experiment 3: fused conv with auto-pipelined halo blocks.

Input halo trick: the padded input (B, H+2, WP, C) is fed twice —
  body block (1, TH, WP, C)  at rows i*TH        (auto double-buffered)
  tail block (1, 2,  WP, C)  at rows i*TH + TH   (block idx 9i+9 for TH=18)
The kernel assembles (TH+2) rows in VMEM scratch; no manual DMA at all.

Variants:
  F : 9 tap dots + full-strip f32 slice-adds (mk1 math, pipelined inputs)
  G : K-packed dy (X3, (N,384)@(384,128)), dx via static slices, 3 dots
  R : like G but dx shifts via pltpu.roll (non-negative shift)
  T : statically-unrolled row tiles (MT rows), 9 small dots per tile
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, CO = 8, 270, 480, 128, 128
WP = W + 8
TH = 18
NS = H // TH
N = TH * WP


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


def _assemble(body_ref, tail_ref, xs_ref, stat_ref, prologue):
    xb = body_ref[0]
    xt = tail_ref[0]
    if prologue:
        xb = _prologue(xb, stat_ref)
        xt = _prologue(xt, stat_ref)
    xs_ref[0:TH] = xb
    xs_ref[TH:TH + 2] = xt
    return xs_ref[:].reshape((TH + 3) * WP, C)


def _kernel_f(stat_ref, w_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
              xs_ref):
    i = pl.program_id(1)
    x2 = _assemble(body_ref, tail_ref, xs_ref, stat_ref, True)[0:(TH + 2) * WP]
    acc = jnp.zeros((TH, W, CO), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            yf = jnp.dot(x2, w_ref[dy * 3 + dx],
                         preferred_element_type=jnp.float32)
            yf = yf.reshape(TH + 2, WP, CO)
            acc = acc + yf[dy:dy + TH, dx:dx + W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


def _kernel_g(stat_ref, w3_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
              xs_ref, *, use_roll):
    i = pl.program_id(1)
    x2 = _assemble(body_ref, tail_ref, xs_ref, stat_ref, True)
    x3 = jnp.concatenate(
        [x2[0:N + 8, :], x2[WP:WP + N + 8, :], x2[2 * WP:2 * WP + N + 8, :]],
        axis=1)
    accs = []
    for dx in range(3):
        if dx == 0:
            xdx = x3[0:N, :]
        elif use_roll:
            xdx = pltpu.roll(x3, N + 8 - dx, 0)[0:N, :]
        else:
            xdx = x3[dx:dx + N, :]
        accs.append(jnp.dot(xdx, w3_ref[dx], preferred_element_type=jnp.float32))
    acc = (accs[0] + accs[1] + accs[2]).reshape(TH, WP, CO)[:, 0:W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


def _kernel_t(stat_ref, w_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
              xs_ref, *, MT):
    i = pl.program_id(1)
    x2 = _assemble(body_ref, tail_ref, xs_ref, stat_ref, True)
    parts = []
    for t in range(N // MT):
        r0 = t * MT
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = r0 + dy * WP + dx
                p = jnp.dot(x2[s:s + MT, :], w_ref[dy * 3 + dx],
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        parts.append(acc)
    acc = jnp.concatenate(parts, axis=0).reshape(TH, WP, CO)[:, 0:W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i)


def build(variant):
    if variant == "F":
        kern = _kernel_f
        wshape = (9, C, CO)
    elif variant in ("G", "R"):
        kern = functools.partial(_kernel_g, use_roll=(variant == "R"))
        wshape = (3, 3 * C, CO)
    elif variant == "T":
        kern = functools.partial(_kernel_t, MT=2 * WP)
        wshape = (9, C, CO)

    def f(x_pad, stat, w, cb):
        return pl.pallas_call(
            kern,
            grid=(B, NS),
            in_specs=[
                pl.BlockSpec((1, 2, C), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(wshape, lambda b, i: (0,) * 3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CO), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TH, WP, C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, WP, C), lambda b, i: (b, 9 * i + 9, 0, 0),
                             memory_space=pltpu.VMEM),
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
                pltpu.VMEM((TH + 3, WP, C), jnp.bfloat16),
            ],
        )(stat, w, cb, x_pad, x_pad)

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
        def chained(x0, stat0):
            def body(j, carry):
                x, stat = carry
                y, s = fn(x, stat)
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
        args = mk(0)
        float(g(*args))
        best = float("inf")
        for r in range(repeats):
            args = mk(100 * ch + r)
            for a in args:
                float(jnp.sum(a.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    tK, t1 = run(chain), run(1)
    return (tK - t1) / (chain - 1)


def wfor(variant, w):
    if variant in ("G", "R"):
        return jnp.stack([jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]],
                                          axis=0) for dx in range(3)])
    return w.reshape(9, C, CO)


def main():
    import sys
    variants = sys.argv[1:] or ["F", "G", "R", "T"]
    print("device:", jax.devices()[0])
    w = jax.random.normal(jax.random.key(1), (3, 3, C, CO), jnp.bfloat16) * 0.05
    cb = jax.random.normal(jax.random.key(2), (1, CO), jnp.float32)
    x = jax.random.normal(jax.random.key(7), (B, H + 2, WP, C), jnp.bfloat16)
    st = jax.random.normal(jax.random.key(8), (B, 2, C), jnp.float32) * 0.1
    yr, _ = jax.jit(xla_unit)(x, st, w, cb)
    flops = 2 * B * H * W * 9 * C * CO

    t = bench(lambda x, s: xla_unit(x, s, w, cb))
    print(f"XLA  : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s")

    for v in variants:
        try:
            f = build(v)
            wv = wfor(v, w)
            yf, _ = jax.jit(lambda x, s: f(x, s, wv, cb))(x, st)
            err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) -
                                        yr.astype(jnp.float32))))
            t = bench(lambda x, s: f(x, s, wv, cb))
            print(f"{v}    : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s   maxerr {err:.1e}")
        except Exception as e:
            print(f"{v}    : FAILED {type(e).__name__}: {str(e)[:240]}")


if __name__ == "__main__":
    main()
