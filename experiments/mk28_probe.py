"""mk28 probe: Mosaic lowering checks for the int8 fused res-site kernel.

Questions (each a tiny standalone pallas_call on the real TPU):
  P1. jnp.pad of a value inside a kernel (width 480 -> 488 with left shift 1)
  P2. iota-where column injection on an s8 value ([:, None] broadcast)
  P3. s8 flat scratch: aligned strip writes + unaligned tap reads (+dx)
  P4. jnp.round/clip/astype(int8) prologue chain
  P5. full mini res-site: quantize prologue -> halo'd s8 scratch -> 9-tap
      s8 dots (i32) -> dequant + stats -> exactness vs numpy

Run: python -u experiments/mk28_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W0, C = 8, 480, 128
WP = 488


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def probe(name, fn):
    try:
        out = fn()
        print(f"[{name}] OK {out}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:240]
        print(f"[{name}] FAILED: {type(e).__name__}: {msg}", flush=True)


def p1_pad():
    def k(x_ref, o_ref):
        q = x_ref[0]                                   # (R, W0, C) bf16
        X = jnp.pad(q, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        o_ref[0] = X

    x = jnp.ones((1, R, W0, C), jnp.bfloat16)
    out = pl.pallas_call(
        k, grid=(1,),
        in_specs=[pl.BlockSpec((1, R, W0, C), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, WP, C), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, WP, C), jnp.bfloat16),
        compiler_params=_params())(x)
    s = np.asarray(jnp.sum(out, axis=(0, 1, 3)))
    assert s[0] == 0 and s[1] != 0 and s[480] != 0 and s[481] == 0, s[:4]
    return "pad places cols at 1..480"


def p2_inject():
    def k(x_ref, o_ref):
        q = x_ref[0].astype(jnp.float32)
        qs = jnp.clip(jnp.round(q * 4.0), -127, 127).astype(jnp.int8)
        X = jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
        X = jnp.where(ci == 0, qs[:, 1:2], X)
        X = jnp.where(ci == W0 + 2, qs[:, W0 - 2:W0 - 1], X)
        o_ref[0] = X

    rng = np.random.default_rng(0)
    xn = rng.normal(0, 8, (1, R, W0, C)).astype(np.float32)
    x = jnp.asarray(xn, jnp.bfloat16)
    out = np.asarray(pl.pallas_call(
        k, grid=(1,),
        in_specs=[pl.BlockSpec((1, R, W0, C), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, WP, C), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, WP, C), jnp.int8),
        compiler_params=_params())(x)).astype(np.int32)
    qs = np.clip(np.round(np.asarray(x).astype(np.float32) * 4.0),
                 -127, 127).astype(np.int32)[0]
    assert (out[0, :, 1:W0 + 1] == qs).all()
    assert (out[0, :, 0] == qs[:, 1]).all()
    assert (out[0, :, W0 + 2] == qs[:, W0 - 2]).all()
    return "s8 iota-where injections exact"


def p5_mini_site():
    """Full mini site on one strip: exactness vs numpy i64."""
    TS = R

    def k(x_ref, w_ref, o_ref, xs_ref):
        q = x_ref[0].astype(jnp.float32)              # (TS+2, W0, C)
        qs = jnp.clip(jnp.round(q * 4.0), -127, 127).astype(jnp.int8)
        X = jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        ci = jax.lax.broadcasted_iota(jnp.int32, (TS + 2, WP, C), 1)
        X = jnp.where(ci == 0, qs[:, 1:2], X)          # X[0] = left reflect
        X = jnp.where(ci == W0 + 1, qs[:, W0 - 2:W0 - 1], X)  # X[481] = right
        xs_ref[0:(TS + 2) * WP] = X.reshape((TS + 2) * WP, C)
        xs_ref[(TS + 2) * WP:] = jnp.zeros((32, C), jnp.int8)
        MT = 2 * WP
        N = TS * WP
        for t in range(N // MT):
            m0 = t * MT
            acc = None
            for dy in range(3):
                for dx in range(3):
                    s = m0 + dy * WP + dx
                    p = jnp.dot(xs_ref[s:s + MT, :], w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.int32)
                    acc = p if acc is None else acc + p
            av = acc.reshape(2, WP, C)[:, 0:W0, :].astype(jnp.float32)
            o_ref[0, 2 * t: 2 * t + 2] = av.astype(jnp.bfloat16)

    rng = np.random.default_rng(1)
    xn = rng.normal(0, 8, (1, TS + 2, W0, C)).astype(np.float32)
    wn = rng.integers(-20, 20, (9, C, C)).astype(np.int8)
    x = jnp.asarray(xn, jnp.bfloat16)
    out = np.asarray(pl.pallas_call(
        k, grid=(1,),
        in_specs=[
            pl.BlockSpec((1, TS + 2, W0, C), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TS, W0, C), lambda b: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, TS, W0, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(((TS + 2) * WP + 32, C), jnp.int8)],
        compiler_params=_params())(x, jnp.asarray(wn))).astype(np.float64)

    # numpy oracle: quantize, reflect-pad 1px in W (halo rows given), conv
    xq = np.clip(np.round(np.asarray(x).astype(np.float32) * 4.0),
                 -127, 127).astype(np.int64)[0]       # (TS+2, W0, C)
    xp = np.pad(xq, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    ref = np.zeros((TS, W0, C), np.int64)
    for dy in range(3):
        for dx in range(3):
            ref += np.einsum("hwc,cd->hwd",
                             xp[dy:dy + TS, dx:dx + W0],
                             wn[dy * 3 + dx].astype(np.int64))
    refb = np.asarray(jnp.asarray(ref, jnp.float32).astype(jnp.bfloat16)
                      ).astype(np.float64)
    err = np.max(np.abs(out[0] - refb))
    assert err == 0.0, f"err={err}"
    return "mini site exact vs numpy i64"


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    probe("P1 pad", p1_pad)
    probe("P2 inject", p2_inject)
    probe("P5 mini-site", p5_mini_site)
