"""Megakernel experiment 7: the d3 site (tap-packed deconv3) fused kernel.

Reference path (today's XLA):
    xpad = _pad_reflect_f2_4px(d2_raw)        # 2-block phase-reflect halo
    xn   = apply_in5(xpad)                    # deferred IN affine + ReLU
    rows = conv2d(xn, w_row[1,5,128,60])      # 1x5 tap-packed conv
    y    = sum of 5 shifted 12-ch slices + bias

Fused path:
    xpad_raw = XLA-built padded RAW buffer (B,544,968,128)  [replaces the
               pad+apply pass -- same traffic]
    rows     = Pallas kernel: prologue apply_in5 -> 5 dx-dots K=128 -> CO=64
               (60 + 4 zero lanes), no scratch, no vertical halo
    y        = same XLA fold

Wins on the table: the apply pass dies (prologue is free per mk5), and the
conv runs from VMEM-resident strips.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8
H2, W2 = 540, 960      # 540 grid
C = 128
TS = 8
WP = W2 + 8            # 968: interior cols 2..961, halo 0,1,962,963, junk+
HP = H2 + 4            # 544 rows incl 2+2 halo rows
NS = HP // TS          # 34
N = TS * WP


def _kernel(stat_ref, w_ref, body_ref, rows_ref, xs_ref, *, CO):
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    x = body_ref[0]                                  # (TS, WP, C) bf16 raw
    x = jnp.maximum(x.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)
    xs_ref[0:TS] = x
    xs_ref[TS:TS + 1] = jnp.zeros((1, WP, C), jnp.bfloat16)
    x2 = xs_ref[:].reshape((TS + 1) * WP, C)
    MT = 2 * WP
    parts = []
    for t in range(N // MT):
        r0 = t * MT
        acc = None
        for dx in range(5):
            p = jnp.dot(x2[r0 + dx:r0 + dx + MT, :], w_ref[dx],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        parts.append(acc)
    acc = jnp.concatenate(parts, axis=0).reshape(TS, WP, CO)
    rows_ref[0] = acc[:, 0:W2, :].astype(jnp.bfloat16)


def fused_d3(xpad, stat, w5):
    CO = w5.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel, CO=CO),
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, WP, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TS, W2, CO), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HP, W2, CO), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TS + 1, WP, C), jnp.bfloat16)],
    )(stat, w5, xpad)


def build_padded_raw(x, pad_fn):
    """XLA: raw (B,540,960,128) -> (B,544,968,128) with phase halos at rows
    0,1/542,543 and cols 0,1/962,963 (interior at rows/cols 2..)."""
    xp = pad_fn(x)                                 # (B,544,964,128)
    return jnp.pad(xp, ((0, 0), (0, 0), (0, 4), (0, 0)))


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    from neuralstyletransferv1_tpu.models.transformer_net_s2d2 import (
        _pad_reflect_f2_4px)

    print("device:", jax.devices()[0])
    k = jax.random.key
    w_row = jax.random.normal(k(1), (1, 5, C, 60), jnp.bfloat16) * 0.05
    w5 = jnp.pad(jnp.transpose(w_row[0], (0, 1, 2)), ((0, 0), (0, 0), (0, 4)))
    stat = jax.random.normal(k(2), (B, 2, C), jnp.float32) * 0.1
    pad_fn = lambda x: _pad_reflect_f2_4px(x, 32)   # noqa: E731

    def mk(seed):
        return jax.random.normal(k(seed), (B, H2, W2, C), jnp.bfloat16)

    def ref_path(x, st):
        xp = pad_fn(x)
        a = st[:, 0, None, None, :]
        c = st[:, 1, None, None, :]
        xn = jnp.maximum(xp.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)
        rows = jax.lax.conv_general_dilated(
            xn, w_row, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return rows                                  # (B,544,960,60)

    def fused_path(x, st):
        xpad = build_padded_raw(x, pad_fn)
        rows = fused_d3(xpad, st, w5)
        return rows[..., :60]

    x = mk(7)
    r_ref = jax.jit(ref_path)(x, stat)
    r_fus = jax.jit(fused_path)(x, stat)
    err = float(jnp.max(jnp.abs(r_ref.astype(jnp.float32) -
                                r_fus.astype(jnp.float32))))
    print(f"rows shapes {r_ref.shape} {r_fus.shape}  maxerr {err:.2e}")

    # timing: full tail both ways (rows -> folded y12 + d2s omitted, fold only)
    hb = H2

    def tail(rows):
        y = sum(rows[:, dy:dy + hb, :, dy * 12:(dy + 1) * 12] for dy in range(5))
        return y

    def timeit(g, chain=8, repeats=3):
        def run(ch):
            def chained(x0, st):
                def body(i, x):
                    y = tail(g(x, st))              # (B,540,960,12)
                    # cycle back to (B,540,960,128) deterministically
                    return jnp.tile(y, (1, 1, 1, 11))[..., :C].astype(x.dtype)
                xx = jax.lax.fori_loop(0, ch, body, x0)
                return jnp.sum(xx.astype(jnp.float32))
            gg = jax.jit(chained)
            xx, st = mk(0), stat
            float(gg(xx, st))
            best = float("inf")
            for r in range(repeats):
                xx = mk(100 * ch + r)
                float(jnp.sum(xx.astype(jnp.float32)))
                t0 = time.perf_counter()
                float(gg(xx, st))
                best = min(best, time.perf_counter() - t0)
            return best
        tK, t1 = run(chain), run(1)
        return (tK - t1) / (chain - 1)

    for name, f in [("XLA ref ", ref_path), ("fused   ", fused_path)]:
        t = timeit(f)
        print(f"d3 site {name}: {t*1e3:7.3f} ms  (pad+apply+1x5conv+fold)")


if __name__ == "__main__":
    main()
