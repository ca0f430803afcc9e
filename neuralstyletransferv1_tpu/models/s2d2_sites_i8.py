"""Pallas int8 fused-site kernels for the f=2 s2d2 Johnson net.

Why this exists: XLA int8 is structurally NEGATIVE on this net — the s8
quantize cannot input-fuse into the conv, so every site pays a standalone
HBM pass (measured 56.8 ms/B16 across 14 sites; PERF.md round-3). Here the
quantize runs in the kernel PROLOGUE from VMEM-resident strips: read the
raw bf16 activation once, apply the deferred-IN affine folded with the
input quantizer (one fma), round/clamp to s8 in registers, and feed the
MXU's int8 path (measured 373 TOP/s from Mosaic — 2.0x bf16;
experiments/mk27_pallas_s8_dot.py). Per-channel dequant + bias + instance
-norm stats ride the epilogue. No quantize pass ever touches HBM.

Kernel design rules inherited from models/s2d2_sites.py (measured, round
2b/2c): flat (rows, C) s8 scratch with static tap slices (unaligned s8
slices verified exact in mk27); in-kernel halo columns via jnp.pad + full
-shape iota-where injections (experiments/mk28_probe.py); f32 prologues;
streamed per-M-tile writes + stats (no parts/concat epilogues); halo rows
via head/tail BlockSpecs with reflect |.| index maps — grid-uniform, no
pl.when boundary cases.

Quantization contract matches transformer_net_s2d2._qc (same scales, same
round/clamp), so outputs agree with the XLA int8 path to bf16 rounding.

Reference math: /root/reference/transformer_net.py:24-37 (ResidualBlock),
restructured per models/transformer_net_s2d2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # flipped by tests on CPU


def _params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


#: strip height preference, largest first — fewer grid steps amortize the
#: per-step launch cost and the head/tail halo re-quantize ((TS+2)/TS).
#: VMEM at TS=30, W4=480: body/out blocks 2x3.7 MB double-buffered +
#: 2.0 MB s8 scratch, well under the 100 MB scoped override.
_TS_CHOICES = (30, 28, 27, 24, 20, 18, 16, 12, 10, 8, 6, 5, 4, 3, 2)


def _pick_ts(h4: int) -> int | None:
    for ts in _TS_CHOICES:
        if h4 % ts == 0:
            return ts
    return None


def _tiles(ts: int, mt: int = 4):
    """Chunk TS rows into M-tiles of `mt` rows (smaller remainder tail) —
    larger MXU issues amortize per-dot overhead; the tail chunk keeps TS
    flexible."""
    out, r = [], 0
    while r < ts:
        m = mt if ts - r >= mt else ts - r
        out.append((r, m))
        r += m
    return out


def res_supported(h4: int, w4: int) -> bool:
    return h4 >= 8 and w4 >= 16 and w4 % 8 == 0 and _pick_ts(h4) is not None


def _quant_halo(v, a, c, lo, W0, WP, halo="reflect"):
    """affine+quantize a (R, W0, C) bf16 strip and build the 1px column
    halo: returns (R, WP, C) s8 with X[1:W0+1]=q, junk beyond W0+2, and
    X[0]/X[W0+1] the halo columns — pixel reflect (q[:,1] / q[:,W0-2]) or
    edge copy (q[:,0] / q[:,W0-1])."""
    R, _, C = v.shape
    x = v.astype(jnp.float32) * a + c
    qs = jnp.clip(jnp.round(x), lo, 127.0).astype(jnp.int8)
    X = jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
    li, ri = (1, W0 - 2) if halo == "reflect" else (0, W0 - 1)
    X = jnp.where(ci == 0, qs[:, li:li + 1], X)
    X = jnp.where(ci == W0 + 1, qs[:, ri:ri + 1], X)
    return X


def _site_kernel(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                 y_ref, sout_ref, xs_ref, *, TS, W0, WP, LO, MT=4,
                 HALO="reflect"):
    """One fused site: quantize prologue -> 3x3 s8 conv (i32 acc) ->
    per-channel dequant + bias -> bf16 raw out + f32 stats sums."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    xh = _quant_halo(head_ref[0], a, c, LO, W0, WP, HALO)  # (1, WP, C)
    xb = _quant_halo(body_ref[0], a, c, LO, W0, WP, HALO)  # (TS, WP, C)
    xt = _quant_halo(tail_ref[0], a, c, LO, W0, WP, HALO)  # (1, WP, C)
    xs_ref[0:WP] = xh.reshape(WP, C)
    xs_ref[WP:(TS + 1) * WP] = xb.reshape(TS * WP, C)
    xs_ref[(TS + 1) * WP:(TS + 2) * WP] = xt.reshape(WP, C)
    xs_ref[(TS + 2) * WP:] = jnp.zeros((32, C), jnp.int8)

    s1 = jnp.zeros((CO,), jnp.float32)
    s2 = jnp.zeros((CO,), jnp.float32)
    for r0, rows in _tiles(TS, MT):
        m0 = r0 * WP
        MTn = rows * WP
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = m0 + dy * WP + dx
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * 3 + dx],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        y_ref[0, r0:r0 + rows] = fv
        # stats over the bf16-ROUNDED values — matches what XLA's _in_stats
        # sees on the written tensor, so the downstream affine (and the next
        # site's quantize) agrees with the XLA int8 path to summation order.
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


def res_site(x: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
             w9: jnp.ndarray, ws: jnp.ndarray, bias: jnp.ndarray,
             lo: float, *, ts: int | None = None, mt: int = 4,
             halo: str = "reflect"):
    """One quantized 3x3 site conv over the full image.

    x: (B, H4, W4, C) bf16 raw input (pre-affine). a, c: (B, C) f32
    quant-folded affine (q = clip(round(x*a + c), lo, 127)). w9:
    (9, C, CO) s8. ws, bias: (CO,) f32 dequant row / conv bias.
    halo: "reflect" (pixel reflect, the res sites) or "edge" (edge-copied
    blocks, the deconv sites — transformer_net_s2d._pad_edge_blocks).
    Returns (y_raw bf16 (B, H4, W4, CO), sout f32 (B, 2, CO)) where sout
    holds [sum, sum_sq] of the f32 dequantized conv output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W0, C = x.shape
    CO = w9.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WP = ((W0 + 2 + 7) // 8) * 8
    NS = H // TS
    stat = jnp.stack([a, c], axis=1)                   # (B, 2, C)
    dq = jnp.stack([ws, bias], axis=0)                 # (2, CO)
    kern = functools.partial(_site_kernel, TS=TS, W0=W0, WP=WP, LO=lo, MT=mt,
                             HALO=halo)
    if halo == "reflect":
        hmap = lambda b, j: (b, jnp.abs(TS * j - 1), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, H - 1 - jnp.abs(H - 1 - TS * (j + 1)),  # noqa: E731
                             0, 0)
    else:
        hmap = lambda b, j: (b, jnp.maximum(TS * j - 1, 0), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, jnp.minimum(TS * (j + 1), H - 1), 0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TS, W0, CO), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W0, CO), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, CO), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM(((TS + 2) * WP + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w9, dq, x, x, x)


def _d3_kernel(stat_ref, w_ref, dq_ref, body_ref, y_ref, xs_ref,
               *, TS, W0, WPd, MT=4):
    """deconv3 rows site: quantize prologue (in5 affine + ReLU folded,
    zero column pads — borders are strip-fixed outside, matching the
    zero-SAME XLA branch) -> 1x5 s8 conv to the 60 tap-packed lanes
    (i32 acc) -> per-channel dequant -> bf16. No stats (last conv)."""
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]

    v = body_ref[0]                                    # (TS, W0, C)
    x = v.astype(jnp.float32) * a + c
    qs = jnp.clip(jnp.round(x), 0.0, 127.0).astype(jnp.int8)
    X = jnp.pad(qs, ((0, 0), (2, WPd - W0 - 2), (0, 0)))
    xs_ref[0:TS * WPd] = X.reshape(TS * WPd, C)
    xs_ref[TS * WPd:] = jnp.zeros((32, C), jnp.int8)

    for r0, rows in _tiles(TS, MT):
        m0 = r0 * WPd
        MTn = rows * WPd
        acc = None
        for dx in range(5):
            p = jnp.dot(xs_ref[m0 + dx:m0 + dx + MTn, :], w_ref[dx],
                        preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws
        y_ref[0, r0:r0 + rows] = (
            f.reshape(rows, WPd, CO)[:, 0:W0, :].astype(jnp.bfloat16))


def d3_rows_site(y: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
                 w5: jnp.ndarray, ws: jnp.ndarray, *,
                 ts: int | None = None, mt: int = 4) -> jnp.ndarray:
    """The tap-packed deconv3 rows conv as a fused int8 site.

    y: (B, H2, W2, 128) raw deconv2 output (540 grid). a, c: (B, 128) f32
    quant-folded in5 affine (ReLU folds into the clamp's zero floor). w5:
    (5, 128, 60) s8 tap-packed rows weight. ws: (60,) f32 dequant row.
    Returns K (B, H2, W2, 60) bf16 with K[r] = rowconv(apply(y[r])) —
    zero column pads; the caller's border strip fixups stay authoritative,
    exactly like the zero-SAME XLA branch (transformer_net_s2d2.apply).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W0, C = y.shape
    CO = w5.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WPd = ((W0 + 4 + 7) // 8) * 8
    NS = H // TS
    stat = jnp.stack([a, c], axis=1)                   # (B, 2, C)
    dq = ws[None, :]                                   # (1, CO)
    kern = functools.partial(_d3_kernel, TS=TS, W0=W0, WPd=WPd, MT=mt)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TS, W0, CO), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W0, CO), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TS * WPd + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w5, dq, y)


def d3_supported(h2: int, w2: int) -> bool:
    return h2 >= 8 and w2 >= 16 and w2 % 8 == 0 and _pick_ts(h2) is not None


def _stats(sout, n):
    mean = sout[:, 0] / n
    var = sout[:, 1] / n - mean * mean
    return mean, jax.lax.rsqrt(var + 1e-5)


def _stats_phased(sout, n, phases, c):
    """IN stats per logical channel from per-conv-channel [sum, sum_sq]
    when the CO axis is (phases × c) — matches _in_stats(y, phases, c)."""
    b = sout.shape[0]
    s1 = sout[:, 0].reshape(b, phases, c).sum(1)
    s2 = sout[:, 1].reshape(b, phases, c).sum(1)
    nn = n * phases
    mean = s1 / nn
    var = s2 / nn - mean * mean
    return mean, jax.lax.rsqrt(var + 1e-5)


def dec_supported(h4: int, w4: int) -> bool:
    """d1 runs at the (h4, w4) grid, d2 at (2·h4, 2·w4)."""
    return (res_supported(h4, w4) and res_supported(2 * h4, 2 * w4))


def dec_chain(y: jnp.ndarray, p: dict, quant: dict):
    """deconv1 + deconv2 as fused int8 sites (edge halos in-kernel).

    y: (B, H4, W4, 128) the res-chain output. Returns
    ``(d2_raw, m5, inv5)``: the raw bf16 deconv2 output on the 540 grid
    (B, 2·H4, 2·W4, 128) plus its in5 stats (phases=4 over 32 logical
    channels) for the downstream deferred apply — exactly what the XLA
    path's ``_qc('d2', ...)`` + ``_in_stats(y, 4, 32)`` produce.

    The d2s between the sites stays in XLA (pure channel→space shuffle;
    a lane interleave inside the kernel would fight Mosaic relayouts).

    Reference math: /root/reference/transformer_net.py:40-56
    (UpsampleConvLayer), restructured per models/transformer_net_s2d2.py.
    """
    from .transformer_net_s2d import d2s

    B, H, W0, C = y.shape
    q1, q2 = quant["d1"], quant["d2"]

    # d1: plain quantize (res output has no pending affine), 128 -> 256.
    aq = jnp.full((B, C), q1["qin"], jnp.float32)
    cq = jnp.zeros((B, C), jnp.float32)
    r, sout = res_site(y, aq, cq, q1["w"].reshape(9, C, -1), q1["ws"],
                       p["d1_b"].astype(jnp.float32), -127.0, halo="edge")
    m, inv = _stats_phased(sout, float(H * W0), 4, r.shape[-1] // 4)

    yd = d2s(r, 2, r.shape[-1] // 4)               # (B, 2H, 2W, 64) raw

    # d2: in4 affine folds into the quantize (ReLU -> clamp lo=0), 64 -> 128.
    sc = p["in4"]["scale"].astype(jnp.float32)
    bi = p["in4"]["bias"].astype(jnp.float32)
    a_eff = (inv * sc) * q2["qin"]
    c_eff = (bi - m * inv * sc) * q2["qin"]
    r2, sout2 = res_site(yd, a_eff, c_eff,
                         q2["w"].reshape(9, yd.shape[-1], -1), q2["ws"],
                         p["d2_b"].astype(jnp.float32), 0.0, halo="edge")
    m5, inv5 = _stats_phased(sout2, float(yd.shape[1] * yd.shape[2]), 4,
                             r2.shape[-1] // 4)
    return r2, m5, inv5


def res_chain(y: jnp.ndarray, p: dict, quant: dict) -> jnp.ndarray:
    """The five residual blocks with all ten convs as fused int8 sites.

    y: (B, H4, W4, 128) the ACTIVATED res-chain input (post in3 apply).
    p: s2d2 param dict; quant: transformer_net_s2d2.quantize_net output
    (must contain all r{i}{a,b} sites). Matches the XLA int8 path
    (transformer_net_s2d2.apply with quant=) to bf16 rounding.
    """
    B, H, W0, C = y.shape
    n = float(H * W0)
    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa = quant[f"r{i}a"]
        qb = quant[f"r{i}b"]
        w9a = qa["w"].reshape(9, C, C)
        w9b = qb["w"].reshape(9, C, C)
        aq = jnp.full((B, C), qa["qin"], jnp.float32)
        cq = jnp.zeros((B, C), jnp.float32)
        r, sout = res_site(y, aq, cq, w9a, qa["ws"],
                           rp["conv1"]["b"].astype(jnp.float32), -127.0)
        m, inv = _stats(sout, n)
        sc = rp["in1"]["scale"].astype(jnp.float32)
        bi = rp["in1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * qb["qin"]
        c_eff = (bi - m * inv * sc) * qb["qin"]
        r2, sout2 = res_site(r, a_eff, c_eff, w9b, qb["ws"],
                             rp["conv2"]["b"].astype(jnp.float32), 0.0)
        m2, inv2 = _stats(sout2, n)
        sc2 = rp["in2"]["scale"].astype(jnp.float32)
        bi2 = rp["in2"]["bias"].astype(jnp.float32)
        a2 = (inv2 * sc2)[:, None, None, :]
        c2 = (bi2 - m2 * inv2 * sc2)[:, None, None, :]
        y = (r2.astype(jnp.float32) * a2 + c2).astype(y.dtype) + y
    return y
