"""Megakernel experiment 5: ablate the T-variant fused conv's overheads.

Based on mk3: T (static row tiles, MT=976) = 2.854 ms vs XLA-unit 2.425 ms.
Matmul ideal is ~1.77 ms; find the ~1.1 ms of overhead.

Ablations (each relative to T):
  t0  : control (T, MT=2*WP)
  t1  : MT=WP (488)
  t2  : MT=4*WP (1952)
  np  : no prologue (raw bf16 in)     -> prologue cost
  ns  : no stats epilogue             -> stats cost
  na  : no assembly (dots read body/tail blocks... skipped; assembly stays)
  bp  : bf16 prologue (no f32 upcast)
  x3  : K-packed dy via channel-block writes into a (TH+3, WP, 3C) scratch
        then 3 dots with K=384 (dx via static value slices)
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


def _prologue(x, stat_ref, mode):
    if mode == "none":
        return x
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    if mode == "bf16":
        return jnp.maximum(x * a.astype(jnp.bfloat16) + c.astype(jnp.bfloat16),
                           jnp.bfloat16(0))
    return jnp.maximum(x.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)


def _epilogue(acc, cb_ref, y_ref, sout_ref, i, stats):
    acc = acc + cb_ref[0, :].astype(jnp.float32)
    y_ref[0, :, :, :] = acc.astype(jnp.bfloat16)
    if not stats:
        return
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


def _kernel_t(stat_ref, w_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
              xs_ref, *, MT, prologue, stats):
    i = pl.program_id(1)
    xb = _prologue(body_ref[0], stat_ref, prologue)
    xt = _prologue(tail_ref[0], stat_ref, prologue)
    xs_ref[0:TH] = xb
    xs_ref[TH:TH + 2] = xt
    x2 = xs_ref[:].reshape((TH + 3) * WP, C)
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
    _epilogue(acc, cb_ref, y_ref, sout_ref, i, stats)


def _kernel_x3(stat_ref, w3_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
               xs3_ref, *, prologue, stats):
    i = pl.program_id(1)
    xb = _prologue(body_ref[0], stat_ref, prologue)
    xt = _prologue(tail_ref[0], stat_ref, prologue)
    # channel-block writes build X3 without a concat: row r of xs3 holds
    # [x[r] | x[r+1] | x[r+2]] in 128-lane blocks.
    for dy in range(3):
        lo, hi = dy * C, (dy + 1) * C
        # rows r = 0..TH+1-dy come from body/tail rows r+dy
        if dy == 0:
            xs3_ref[0:TH, :, lo:hi] = xb
            xs3_ref[TH:TH + 2, :, lo:hi] = xt
        elif dy == 1:
            xs3_ref[0:TH - 1, :, lo:hi] = xb[1:TH]
            xs3_ref[TH - 1:TH, :, lo:hi] = xt[0:1]
            xs3_ref[TH:TH + 1, :, lo:hi] = xt[1:2]
        else:
            xs3_ref[0:TH - 2, :, lo:hi] = xb[2:TH]
            xs3_ref[TH - 2:TH, :, lo:hi] = xt
    x3 = xs3_ref[:].reshape((TH + 2) * WP, 3 * C)
    accs = []
    for dx in range(3):
        xdx = x3[dx:dx + N, :]
        accs.append(jnp.dot(xdx, w3_ref[dx], preferred_element_type=jnp.float32))
    acc = (accs[0] + accs[1] + accs[2]).reshape(TH, WP, CO)[:, 0:W, :]
    _epilogue(acc, cb_ref, y_ref, sout_ref, i, stats)


def build(variant):
    prologue, stats, MT = "f32", True, 2 * WP
    kern_fn = _kernel_t
    wshape = (9, C, CO)
    scratch = pltpu.VMEM((TH + 3, WP, C), jnp.bfloat16)
    if variant == "t1":
        MT = WP
    elif variant == "t2":
        MT = 4 * WP
    elif variant == "np":
        prologue = "none"
    elif variant == "ns":
        stats = False
    elif variant == "bp":
        prologue = "bf16"
    elif variant == "x3":
        kern_fn = _kernel_x3
        wshape = (3, 3 * C, CO)
        scratch = pltpu.VMEM((TH + 2, WP, 3 * C), jnp.bfloat16)

    if kern_fn is _kernel_t:
        kern = functools.partial(kern_fn, MT=MT, prologue=prologue, stats=stats)
    else:
        kern = functools.partial(kern_fn, prologue=prologue, stats=stats)

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
            scratch_shapes=[scratch],
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
    if variant == "x3":
        return jnp.stack([jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]],
                                          axis=0) for dx in range(3)])
    return w.reshape(9, C, CO)


def main():
    import sys
    variants = sys.argv[1:] or ["t0", "t1", "t2", "np", "ns", "bp", "x3"]
    print("device:", jax.devices()[0])
    w = jax.random.normal(jax.random.key(1), (3, 3, C, CO), jnp.bfloat16) * 0.05
    cb = jax.random.normal(jax.random.key(2), (1, CO), jnp.float32)
    x = jax.random.normal(jax.random.key(7), (B, H + 2, WP, C), jnp.bfloat16)
    st = jax.random.normal(jax.random.key(8), (B, 2, C), jnp.float32) * 0.1
    yr, _ = jax.jit(xla_unit)(x, st, w, cb)
    flops = 2 * B * H * W * 9 * C * CO

    t = bench(lambda x, s: xla_unit(x, s, w, cb))
    print(f"XLA : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s")

    for v in variants:
        try:
            f = build(v)
            wv = wfor(v, w)
            yf, _ = jax.jit(lambda x, s: f(x, s, wv, cb))(x, st)
            err = float(jnp.max(jnp.abs(yf.astype(jnp.float32) -
                                        yr.astype(jnp.float32))))
            t = bench(lambda x, s: f(x, s, wv, cb))
            print(f"{v}  : {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TF/s   maxerr {err:.1e}")
        except Exception as e:
            print(f"{v}  : FAILED {type(e).__name__}: {str(e)[:240]}")


if __name__ == "__main__":
    main()
