"""mk31: cost accounting + interleave variants for the int8 fused res site.

Variants (all TS=30, MT=16, (16, 270, 480, 128)):
  v0 full      — current kernel: prologue-all quantize -> dots -> epilogue
  v1 noaffine  — quantize is a bare astype(s8) (no fma/round/clip): isolates
                 the affine+round VPU cost
  v2 nostats   — full prologue, raw out only (no stats epilogue)
  v3 pingpong  — per-tile quantize into alternating scratch regions,
                 program-ordered so tile t's dots and tile t+1's quantize
                 are independent (VLIW can co-issue VPU+MXU)

Chained in-graph with a residual-style add between sites (y = site(y)*s + y)
so inter-site glue matches the real net (one fused XLA pass).

Run: python -u experiments/mk31_i8_variants.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from neuralstyletransferv1_tpu.models import s2d2_sites_i8 as si8  # noqa: E402

B, H4, W0, C = 16, 270, 480, 128
TS, MT = 54, 16
WP = ((W0 + 2 + 7) // 8) * 8
CHAIN = 10
FLOPS = 2 * B * H4 * W0 * C * C * 9


def _tiles():
    return si8._tiles(TS, MT)


def _dots(xs_ref, w_ref, m0, MTrows):
    MTn = MTrows * WP
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = m0 + dy * WP + dx
            p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * 3 + dx],
                        preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
    return acc


def k_v1_noaffine(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                  y_ref, sout_ref, xs_ref):
    j = pl.program_id(1)
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    def cast_halo(v):
        R = v.shape[0]
        qs = v.astype(jnp.int8)  # BARE cast — no affine/round/clip
        X = jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
        X = jnp.where(ci == 0, qs[:, 1:2], X)
        X = jnp.where(ci == W0 + 1, qs[:, W0 - 2:W0 - 1], X)
        return X

    xs_ref[0:WP] = cast_halo(head_ref[0]).reshape(WP, C)
    xs_ref[WP:(TS + 1) * WP] = cast_halo(body_ref[0]).reshape(TS * WP, C)
    xs_ref[(TS + 1) * WP:(TS + 2) * WP] = cast_halo(tail_ref[0]).reshape(WP, C)
    xs_ref[(TS + 2) * WP:] = jnp.zeros((32, C), jnp.int8)

    s1 = jnp.zeros((C,), jnp.float32)
    s2 = jnp.zeros((C,), jnp.float32)
    for r0, rows in _tiles():
        acc = _dots(xs_ref, w_ref, r0 * WP, rows)
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, C)[:, 0:W0, :].astype(jnp.bfloat16)
        y_ref[0, r0:r0 + rows] = fv
        fvf = fv.astype(jnp.float32)
        s1 = s1 + jnp.sum(fvf, axis=(0, 1))
        s2 = s2 + jnp.sum(fvf * fvf, axis=(0, 1))

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(j > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2


def k_v2_nostats(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                 y_ref, sout_ref, xs_ref):
    j = pl.program_id(1)
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    xh = si8._quant_halo(head_ref[0], a, c, -127.0, W0, WP)
    xb = si8._quant_halo(body_ref[0], a, c, -127.0, W0, WP)
    xt = si8._quant_halo(tail_ref[0], a, c, -127.0, W0, WP)
    xs_ref[0:WP] = xh.reshape(WP, C)
    xs_ref[WP:(TS + 1) * WP] = xb.reshape(TS * WP, C)
    xs_ref[(TS + 1) * WP:(TS + 2) * WP] = xt.reshape(WP, C)
    xs_ref[(TS + 2) * WP:] = jnp.zeros((32, C), jnp.int8)

    for r0, rows in _tiles():
        acc = _dots(xs_ref, w_ref, r0 * WP, rows)
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, C)[:, 0:W0, :].astype(jnp.bfloat16)
        y_ref[0, r0:r0 + rows] = fv

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = jnp.zeros((C,), jnp.float32)
        sout_ref[0, 1, :] = jnp.zeros((C,), jnp.float32)


def k_v3_pingpong(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                  y_ref, sout_ref, xs_ref):
    """Per-tile quantize into 2 alternating scratch regions; tile t's dots
    are issued right after tile t+1's (independent) quantize so the VLIW
    scheduler can overlay VPU and MXU."""
    j = pl.program_id(1)
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]
    tiles = _tiles()
    RROWS = MT + 2  # rows per region incl. halo

    def qrows(r0, rows):
        """quantized halo'd rows [r0-1, r0+rows+1) of the strip (strip-local
        coords; r0-1 == -1 -> head block, r0+rows == TS -> tail block)."""
        parts = []
        if r0 == 0:
            parts.append(head_ref[0])
            lo = 0
        else:
            lo = r0 - 1
        parts.append(body_ref[0, lo:min(r0 + rows + 1, TS)])
        if r0 + rows + 1 > TS:
            parts.append(tail_ref[0])
        v = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return si8._quant_halo(v, a, c, -127.0, W0, WP)

    def region(t):
        return (t % 2) * RROWS * WP

    # prologue: quantize tile 0
    q0 = qrows(*tiles[0])
    xs_ref[region(0):region(0) + q0.shape[0] * WP] = q0.reshape(-1, C)

    s1 = jnp.zeros((C,), jnp.float32)
    s2 = jnp.zeros((C,), jnp.float32)
    for t, (r0, rows) in enumerate(tiles):
        if t + 1 < len(tiles):
            qn = qrows(*tiles[t + 1])
            off = region(t + 1)
            xs_ref[off:off + qn.shape[0] * WP] = qn.reshape(-1, C)
        acc = _dots(xs_ref, w_ref, region(t), rows)
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, C)[:, 0:W0, :].astype(jnp.bfloat16)
        y_ref[0, r0:r0 + rows] = fv
        fvf = fv.astype(jnp.float32)
        s1 = s1 + jnp.sum(fvf, axis=(0, 1))
        s2 = s2 + jnp.sum(fvf * fvf, axis=(0, 1))

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(j > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2


def build(kern, scratch_rows):
    def f(x, stat, w9, dq):
        return pl.pallas_call(
            kern,
            grid=(B, H4 // TS),
            in_specs=[
                pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, C, C), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, C), lambda b, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W0, C),
                             lambda b, j: (b, jnp.abs(TS * j - 1), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W0, C),
                             lambda b, j: (b, H4 - 1 - jnp.abs(
                                 H4 - 1 - TS * (j + 1)), 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, H4, W0, C), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((scratch_rows, C), jnp.int8)],
            compiler_params=si8._params(),
        )(stat, w9, dq, x, x, x)

    return f


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (3, 3, C, C)).astype(np.float32)
    ws_ = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    w9 = jnp.asarray(np.clip(np.round(w / ws_), -127, 127)
                     .astype(np.int8).reshape(9, C, C))
    dq = jnp.stack([jnp.asarray(ws_ * (4.0 / 127.0), jnp.float32),
                    jnp.asarray(rng.normal(0, 0.02, C), jnp.float32)], 0)
    stat = jnp.stack([jnp.full((B, C), 127.0 / 4.0, jnp.float32),
                      jnp.zeros((B, C), jnp.float32)], 1)

    def v0(x):
        r, _ = si8.res_site(
            x, stat[:, 0], stat[:, 1], w9, dq[0], dq[1], -127.0,
            ts=TS, mt=MT)
        return r

    variants = {
        "v0 full    ": v0,
        "v1 noaffine": lambda x: build(
            k_v1_noaffine, (TS + 2) * WP + 32)(x, stat, w9, dq)[0],
        "v2 nostats ": lambda x: build(
            k_v2_nostats, (TS + 2) * WP + 32)(x, stat, w9, dq)[0],
        # v3 pingpong: TPU backend Internal crash — do not run
        # (kept above for the record).
    }

    for name, fn in variants.items():
        def step(y, fn=fn):
            return fn(y) * jnp.bfloat16(0.05) + y

        def loop(x, n):
            return jnp.sum(jax.lax.fori_loop(
                0, n, lambda i, y: step(y).astype(y.dtype), x)
                .astype(jnp.float32))

        gN = jax.jit(functools.partial(loop, n=CHAIN))
        g1 = jax.jit(functools.partial(loop, n=1))

        def best(g):
            b = float("inf")
            for r in range(3):
                x = jax.random.normal(jax.random.key(100 + r),
                                      (B, H4, W0, C), jnp.bfloat16) * 2.0
                float(jnp.sum(x.astype(jnp.float32)))
                float(g(x))
                t0 = time.perf_counter()
                float(g(x + 0.01))
                b = min(b, time.perf_counter() - t0)
            return b

        try:
            t = (best(gN) - best(g1)) / (CHAIN - 1)
            print(f"[{name}] {t*1e3:6.2f} ms/site  "
                  f"{FLOPS/t/1e12:5.0f} TF/s-eq", flush=True)
        except Exception as e:
            print(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
