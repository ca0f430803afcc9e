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


def quantize_site(w, act_scale: float) -> dict:
    """Per-out-channel symmetric int8 weights + folded activation scale —
    the shared quantization contract of every fused site (matches
    transformer_net_s2d2.quantize_net: q = clip(round(x * qin)), dequant
    rides the conv output as ws)."""
    import numpy as np

    w = np.asarray(w, np.float32)
    ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    a = max(float(act_scale), 1e-6)
    return {"w": jnp.asarray(wq),
            "ws": jnp.asarray(ws * (a / 127.0), jnp.float32),
            "qin": jnp.float32(127.0 / a)}


def res_supported(h4: int, w4: int) -> bool:
    return h4 >= 8 and w4 >= 16 and w4 % 8 == 0 and _pick_ts(h4) is not None


def _quant_halo(v, a, c, lo, W0, WP, halo="reflect", t=None):
    """affine+quantize a (R, W0, C) bf16 strip and build the 1px column
    halo: returns (R, WP, C) s8 with X[1:W0+1]=q, junk beyond W0+2, and
    X[0]/X[W0+1] the halo columns — pixel reflect (q[:,1] / q[:,W0-2]) or
    edge copy (q[:,0] / q[:,W0-1]).

    t: optional per-channel (C,) floor applied BEFORE rounding — folds a
    TLU (max(y, tau); ReCoNet FRN nets) into the quantize: the affine is
    monotone (a > 0), so max(y, tau)*a + c == max(y*a + c, tau*a + c) and
    the caller passes t = tau*a + c."""
    R, _, C = v.shape
    x = v.astype(jnp.float32) * a + c
    if t is not None:
        x = jnp.maximum(x, t)
    qs = jnp.clip(jnp.round(x), lo, 127.0).astype(jnp.int8)
    X = jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
    li, ri = (1, W0 - 2) if halo == "reflect" else (0, W0 - 1)
    X = jnp.where(ci == 0, qs[:, li:li + 1], X)
    X = jnp.where(ci == W0 + 1, qs[:, ri:ri + 1], X)
    return X


def _quant_pad(v, a, c, lo, WP):
    """affine+quantize a pre-column-haloed (R, W0in, C) strip: no halo
    injection, just zero-pad the tail to WP."""
    R, W0in, C = v.shape
    x = v.astype(jnp.float32) * a + c
    qs = jnp.clip(jnp.round(x), lo, 127.0).astype(jnp.int8)
    return jnp.pad(qs, ((0, 0), (0, WP - W0in), (0, 0)))


def _quant_zero(v, a, c, lo, WP, sw=None):
    """affine+quantize with ZERO column halos (torch zero-pad nets, e.g.
    the .t7 fast form): X[0]=0, X[1:W0+1]=q, zeros beyond.

    sw: optional CONTENT width < W0 — columns >= sw are alignment padding
    (a non-%8 net width padded up by the caller) and are zeroed, so the
    conv at column sw-1 sees exact zero-pad semantics and junk never
    propagates between sites."""
    R, W0, C = v.shape
    x = v.astype(jnp.float32) * a + c
    qs = jnp.clip(jnp.round(x), lo, 127.0).astype(jnp.int8)
    if sw is not None and sw < W0:
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, W0, C), 1)
        qs = jnp.where(ci < sw, qs, jnp.zeros_like(qs))
    return jnp.pad(qs, ((0, 0), (1, WP - W0 - 1), (0, 0)))


def _site_kernel(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                 y_ref, sout_ref, xs_ref, *, TS, W0, WP, LO, MT=4,
                 HALO="reflect", NS=None, SW=None, TAU=False,
                 KH=3, KW=3, PT=1, PL=1):
    """One fused site: quantize prologue -> KHxKW s8 conv (i32 acc) ->
    per-channel dequant + bias -> bf16 raw out + f32 stats sums.

    HALO="prehalo": the input strips already carry their 1-column halos
    (width W0+2, e.g. the pair-packed d2 form) — quantize + zero-pad only.
    HALO="zero": torch zero-pad semantics — zero columns, and the first/
    last strips zero their row halos (needs NS). SW (zero halo only):
    content width < W0 when the caller padded a non-%8 net width up —
    padding columns are zeroed at quantize and excluded from the stats.

    KH/KW/PT/PL: kernel extent and top/left pad — out[r, j] taps content
    rows r-PT..r-PT+KH-1 / cols j-PL..j-PL+KW-1. The default 3x3/1/1 is
    the res form; 2x2/0/0 is the f2-scattered k3 transposed conv (pads
    (0,1) — io/t7_fast._scatter_convT_f2), whose right/bottom zero taps
    land on the zero halo column / zeroed tail strip for free (zero halo
    only).
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    t = stat_ref[0, 2, :] if TAU else None
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    if HALO == "prehalo":
        xh = _quant_pad(head_ref[0], a, c, LO, WP)         # (1, WP, C)
        xb = _quant_pad(body_ref[0], a, c, LO, WP)         # (TS, WP, C)
        xt = _quant_pad(tail_ref[0], a, c, LO, WP)         # (1, WP, C)
    elif HALO == "zero":
        xh = _quant_zero(head_ref[0], a, c, LO, WP, SW)
        xb = _quant_zero(body_ref[0], a, c, LO, WP, SW)
        xt = _quant_zero(tail_ref[0], a, c, LO, WP, SW)
        z = jnp.zeros_like(xh)
        xh = jnp.where(j == 0, z, xh)
        xt = jnp.where(j == NS - 1, z, xt)
    else:
        xh = _quant_halo(head_ref[0], a, c, LO, W0, WP, HALO, t)
        xb = _quant_halo(body_ref[0], a, c, LO, W0, WP, HALO, t)
        xt = _quant_halo(tail_ref[0], a, c, LO, W0, WP, HALO, t)
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
        for dy in range(KH):
            for dx in range(KW):
                s = m0 + (dy + 1 - PT) * WP + (dx + 1 - PL)
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * KW + dx],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        y_ref[0, r0:r0 + rows] = fv
        # stats over the bf16-ROUNDED values — matches what XLA's _in_stats
        # sees on the written tensor, so the downstream affine (and the next
        # site's quantize) agrees with the XLA int8 path to summation order.
        fvf = fv.astype(jnp.float32)
        if SW is not None and SW < W0:
            ci = jax.lax.broadcasted_iota(jnp.int32, fvf.shape, 1)
            fvf = jnp.where(ci < SW, fvf, jnp.zeros_like(fvf))
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
             halo: str = "reflect", sw: int | None = None,
             tau: jnp.ndarray | None = None, kh: int = 3, kw: int = 3,
             pt: int = 1, pl_: int = 1):
    """One quantized KHxKW (default 3x3) site conv over the full image.

    x: (B, H4, W4, C) bf16 raw input (pre-affine). a, c: (B, C) f32
    quant-folded affine (q = clip(round(x*a + c), lo, 127)). w9:
    (9, C, CO) s8. ws, bias: (CO,) f32 dequant row / conv bias.
    halo: "reflect" (pixel reflect, the res sites) or "edge" (edge-copied
    blocks, the deconv sites — transformer_net_s2d._pad_edge_blocks).
    tau: optional (B, C) f32 PRE-FOLDED floor (tau_ch*a + c) applied before
    rounding — folds a TLU activation (ReCoNet FRN nets) into the quantize.
    Returns (y_raw bf16 (B, H4, W4, CO), sout f32 (B, 2, CO)) where sout
    holds [sum, sum_sq] of the f32 dequantized conv output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W0in, C = x.shape
    W0 = W0in - 2 if halo == "prehalo" else W0in
    CO = w9.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WP = ((W0 + 2 + 7) // 8) * 8
    NS = H // TS
    rows = [a, c] if tau is None else [a, c, tau]
    stat = jnp.stack(rows, axis=1)                     # (B, 2|3, C)
    nrow = len(rows)
    dq = jnp.stack([ws, bias], axis=0)                 # (2, CO)
    kern = functools.partial(_site_kernel, TS=TS, W0=W0, WP=WP, LO=lo, MT=mt,
                             HALO=halo, NS=NS, SW=sw, TAU=tau is not None,
                             KH=kh, KW=kw, PT=pt, PL=pl_)
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
            pl.BlockSpec((1, nrow, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0in, C), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, W0in, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0in, C), tmap, memory_space=pltpu.VMEM),
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


def _site_kernel_skip(stat_ref, w_ref, dq_ref, rh_ref, rb_ref, rt_ref,
                      yh_ref, yb_ref, yt_ref, o_ref, sout_ref, yout_ref,
                      xs_ref, *, TS, W0, WP, LO, MT=4, HALO="reflect",
                      YOUT=True, NS=None, SW=None, ACT=None,
                      KH=3, KW=3, PT=1, PL=1):
    """Skip-fold site: the previous block's deferred in2 apply + residual
    add run in this kernel's prologue (v = bf16(bf16(r2·a2+c2) + y), one
    extra fma + add on data the kernel loads anyway), then v is quantized
    and convolved as usual. Kills the standalone residual-add HBM pass
    between Pallas sites (2.3-3.0 ms each in the round-3 trace). v is
    written back (yout) for the NEXT block's skip; bf16 rounding matches
    the XLA combine exactly.

    ACT: optional POST-ADD activation on v — "relu" or "tau" (per-channel
    floor from stat row 4) — for nets that activate after the residual
    add (ReCoNet, reference model.py:57-60). max() is exact in bf16, so
    parity with the XLA combine+act holds bitwise."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    cq = stat_ref[0, 1, :]
    a2 = stat_ref[0, 2, :]
    c2 = stat_ref[0, 3, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    def comb(r, y):
        t = (r.astype(jnp.float32) * a2 + c2).astype(jnp.bfloat16)
        v = (t.astype(jnp.float32)
             + y.astype(jnp.float32)).astype(jnp.bfloat16)
        if ACT == "relu":
            v = jnp.maximum(v, jnp.zeros_like(v))
        elif ACT == "tau":
            v = jnp.maximum(v, stat_ref[0, 4, :].astype(jnp.bfloat16))
        return v

    vh = comb(rh_ref[0], yh_ref[0])
    vb = comb(rb_ref[0], yb_ref[0])
    vt = comb(rt_ref[0], yt_ref[0])
    if YOUT:
        yout_ref[0] = vb
    else:
        yout_ref[0] = vb[0:1]
    if HALO == "zero":
        xh = _quant_zero(vh, a, cq, LO, WP, SW)
        xb = _quant_zero(vb, a, cq, LO, WP, SW)
        xt = _quant_zero(vt, a, cq, LO, WP, SW)
        z = jnp.zeros_like(xh)
        xh = jnp.where(j == 0, z, xh)
        xt = jnp.where(j == NS - 1, z, xt)
    else:
        xh = _quant_halo(vh, a, cq, LO, W0, WP, HALO)
        xb = _quant_halo(vb, a, cq, LO, W0, WP, HALO)
        xt = _quant_halo(vt, a, cq, LO, W0, WP, HALO)
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
        for dy in range(KH):
            for dx in range(KW):
                s = m0 + (dy + 1 - PT) * WP + (dx + 1 - PL)
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * KW + dx],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        o_ref[0, r0:r0 + rows] = fv
        fvf = fv.astype(jnp.float32)
        if SW is not None and SW < W0:
            ci = jax.lax.broadcasted_iota(jnp.int32, fvf.shape, 1)
            fvf = jnp.where(ci < SW, fvf, jnp.zeros_like(fvf))
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


def res_site_skip(r2: jnp.ndarray, yp: jnp.ndarray, a: jnp.ndarray,
                  c: jnp.ndarray, a2: jnp.ndarray, c2: jnp.ndarray,
                  w9: jnp.ndarray, ws: jnp.ndarray, bias: jnp.ndarray,
                  lo: float, *, ts: int | None = None, mt: int = 4,
                  halo: str = "reflect", yout: bool = True,
                  sw: int | None = None, act: str | None = None,
                  tau_act: jnp.ndarray | None = None, kh: int = 3,
                  kw: int = 3, pt: int = 1, pl_: int = 1):
    """Skip-fold variant of ``res_site``: consumes the previous block's
    raw conv output r2 and the pre-previous combined activation yp,
    computes v = bf16(bf16(r2·a2 + c2) + yp) in-prologue, and returns
    ``(conv_raw, sout, v)``. With yout=False the v output is a dummy
    (B, 1, W0, C) tile (for the last consumer, e.g. the d1 site, where
    nothing downstream reads v).

    act: optional POST-ADD activation on v — "relu", or "tau" with
    tau_act (B, C) as the per-channel floor (ReCoNet TLU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W0, C = r2.shape
    CO = w9.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WP = ((W0 + 2 + 7) // 8) * 8
    NS = H // TS
    rows = [a, c, a2, c2]
    if act == "tau":
        rows.append(tau_act)
    stat = jnp.stack(rows, axis=1)                     # (B, 4|5, C)
    nrow = len(rows)
    dq = jnp.stack([ws, bias], axis=0)                 # (2, CO)
    kern = functools.partial(_site_kernel_skip, TS=TS, W0=W0, WP=WP, LO=lo,
                             MT=mt, HALO=halo, YOUT=yout, NS=NS, SW=sw,
                             ACT=act, KH=kh, KW=kw, PT=pt, PL=pl_)
    if halo == "reflect":
        hmap = lambda b, j: (b, jnp.abs(TS * j - 1), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, H - 1 - jnp.abs(H - 1 - TS * (j + 1)),  # noqa: E731
                             0, 0)
    else:
        hmap = lambda b, j: (b, jnp.maximum(TS * j - 1, 0), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, jnp.minimum(TS * (j + 1), H - 1), 0, 0)  # noqa: E731
    row = [pl.BlockSpec((1, 1, W0, C), hmap, memory_space=pltpu.VMEM),
           pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((1, 1, W0, C), tmap, memory_space=pltpu.VMEM)]
    if yout:
        yspec = pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                             memory_space=pltpu.VMEM)
        yshape = jax.ShapeDtypeStruct((B, H, W0, C), jnp.bfloat16)
    else:
        yspec = pl.BlockSpec((1, 1, W0, C), lambda b, j: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        yshape = jax.ShapeDtypeStruct((B, 1, W0, C), jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, nrow, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + row + row,
        out_specs=[
            pl.BlockSpec((1, TS, W0, CO), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            yspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W0, CO), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, CO), jnp.float32),
            yshape,
        ],
        scratch_shapes=[pltpu.VMEM(((TS + 2) * WP + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w9, dq, r2, r2, r2, yp, yp, yp)


def _s8_col_halo(q, W0, WP, halo):
    """Inject the carry layout's column halos into an s8 (rows, W0, CO)
    strip: X[0] / X[W0+1] are the halo columns, zeros beyond. halo
    "zero2" is the 5-tap carry layout (content at columns 2..W0+1, zero
    pads beyond — the deconv3 tail site's input form)."""
    if halo == "zero2":
        return jnp.pad(q, ((0, 0), (2, WP - W0 - 2), (0, 0)))
    X = jnp.pad(q, ((0, 0), (1, WP - W0 - 1), (0, 0)))
    if halo == "zero":
        return X
    R, _, CO = q.shape
    ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, CO), 1)
    li, ri = (1, W0 - 2) if halo == "reflect" else (0, W0 - 1)
    X = jnp.where(ci == 0, q[:, li:li + 1], X)
    X = jnp.where(ci == W0 + 1, q[:, ri:ri + 1], X)
    return X


def _s8_row_maps(TS, H, halo):
    """head/tail BlockSpec index maps for the image-border row halo:
    reflect |.|, edge clamp, or zero (clamp + in-kernel zeroing)."""
    if halo == "reflect":
        hmap = lambda b, j: (b, jnp.abs(TS * j - 1), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, jnp.where(TS * (j + 1) > H - 1, H - 2,
                                          TS * (j + 1)), 0, 0)  # noqa: E731
    else:  # edge and zero share clamp maps; zero kernels zero the strip
        hmap = lambda b, j: (b, jnp.maximum(TS * j - 1, 0), 0, 0)  # noqa: E731
        tmap = lambda b, j: (b, jnp.minimum(TS * (j + 1), H - 1), 0, 0)  # noqa: E731
    return hmap, tmap


def _site_kernel_s8o(stat_ref, w_ref, dq_ref, head_ref, body_ref, tail_ref,
                     q_ref, xs_ref, *, TS, W0, WPS, LO, QLO, MT=4, NS=None,
                     HALO="zero", SW=None, TAU=False):
    """Static-scale site with an s8 OUTPUT: quantize prologue (column
    halos per HALO) -> 3x3 s8 conv -> dequant + bias -> bf16 round ->
    STATIC output quantize affine -> s8 out at width WPS with the column
    halos already injected (exactly the consumer kernel's scratch form).

    Only valid when every norm between the convs is a compile-time
    constant: BN-folded .t7 graphs (no norm at all — zero halos) or the
    STATIC-NORM Johnson mode (frozen IN affine folded into the output
    quantize rows qa/qc — reflect halos). The bf16 round before the
    output quantize keeps codes bit-identical to the XLA int8 reference
    (io/t7_fast._t7_res_quant_xla / transformer_net_s2d2._qc), which
    quantizes the materialized bf16 tensor."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]
    qa = dq_ref[2, :]
    qc = dq_ref[3, :]

    if HALO == "zero":
        xh = _quant_zero(head_ref[0], a, c, LO, WPS, SW)
        xb = _quant_zero(body_ref[0], a, c, LO, WPS, SW)
        xt = _quant_zero(tail_ref[0], a, c, LO, WPS, SW)
        z = jnp.zeros_like(xh)
        xh = jnp.where(j == 0, z, xh)
        xt = jnp.where(j == NS - 1, z, xt)
    else:
        xh = _quant_halo(head_ref[0], a, c, LO, W0, WPS, halo=HALO)
        xb = _quant_halo(body_ref[0], a, c, LO, W0, WPS, halo=HALO)
        xt = _quant_halo(tail_ref[0], a, c, LO, W0, WPS, halo=HALO)
    xs_ref[0:WPS] = xh.reshape(WPS, C)
    xs_ref[WPS:(TS + 1) * WPS] = xb.reshape(TS * WPS, C)
    xs_ref[(TS + 1) * WPS:(TS + 2) * WPS] = xt.reshape(WPS, C)
    xs_ref[(TS + 2) * WPS:] = jnp.zeros((32, C), jnp.int8)

    for r0, rows in _tiles(TS, MT):
        m0 = r0 * WPS
        MTn = rows * WPS
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = m0 + dy * WPS + dx
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * 3 + dx],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WPS, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        v = fv.astype(jnp.float32) * qa + qc
        if TAU:
            # per-channel TLU floor BEFORE the round (FRN ReCoNet: the
            # XLA reference maxes v with tau·qin, then rounds)
            v = jnp.maximum(v, dq_ref[4, :])
        q = jnp.clip(jnp.round(v), QLO, 127.0).astype(jnp.int8)
        if SW is not None and SW < W0:
            # alignment-padding columns emit zero codes so the next site
            # keeps exact zero-pad semantics at the content edge
            ci = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
            q = jnp.where(ci < SW, q, jnp.zeros_like(q))
        q_ref[0, r0:r0 + rows] = _s8_col_halo(q, W0, WPS, HALO)


def _wps(w0: int) -> int:
    """s8 carry width: content + 2 halo columns rounded up to the int8
    (32, 128) tile so the HBM<->VMEM blocks stay tile-aligned."""
    return ((w0 + 2 + 31) // 32) * 32


def _wps2(w0: int) -> int:
    """5-tap (\"zero2\") s8 carry width: content + 2 zero columns per side
    rounded up to the int8 tile (the deconv3 tail site's input form)."""
    return ((w0 + 4 + 31) // 32) * 32


def res_site_s8o(x: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
                 w9: jnp.ndarray, ws: jnp.ndarray, bias: jnp.ndarray,
                 qo=None, lo: float = -127.0, qlo: float = 0.0, *,
                 qa=None, qc=None, tau=None, halo: str = "zero",
                 sw: int | None = None, ts: int | None = None, mt: int = 4):
    """Static-scale 3x3 site emitting the NEXT site's s8 input directly.

    x: (B, H, W0, C) bf16 raw. a, c: (B, C) input quantize affine
    (q = clip(round(x·a + c), lo, 127); column halos per ``halo``).
    Output quantize: either a scalar ``qo`` (the next site's qin —
    BN-folded .t7 form) or per-channel ``qa``/``qc`` (CO,) rows folding a
    FROZEN norm affine (static-norm Johnson: qa = inv·scale·qin,
    qc = (bias − mean·inv·scale)·qin); ``qlo`` is the clamp floor (0.0
    folds the inter-conv ReLU). ``tau``: optional per-channel (CO,)
    pre-round floor (FRN ReCoNet's TLU, already scaled by qin — pair
    with qlo=-127). ``sw`` (zero halo only): content width
    < W0 when the caller padded a non-%8 net width up — padding columns
    are zeroed at quantize AND in the emitted codes (zero-pad semantics
    carry through the chain; NST static-norm form). Returns
    (B, H, WPS, CO) s8 with the column halos at [..., 0, :] /
    [..., W0+1, :] — feed straight to ``res_site_s8i_yadd`` /
    ``site_s8``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert sw is None or halo == "zero", \
        "sw content-width masking is zero-halo only"
    B, H, W0, C = x.shape
    CO = w9.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WPS = _wps(W0)
    NS = H // TS
    stat = jnp.stack([a, c], axis=1)                   # (B, 2, C)
    if qa is None:
        qa = jnp.full((CO,), qo, jnp.float32)
        qc = jnp.zeros((CO,), jnp.float32)
    rows_dq = [ws, bias, qa, qc]
    if tau is not None:
        rows_dq.append(tau)
    dq = jnp.stack(rows_dq, axis=0)                    # (4..5, CO)
    kern = functools.partial(_site_kernel_s8o, TS=TS, W0=W0, WPS=WPS,
                             LO=lo, QLO=qlo, MT=mt, NS=NS, HALO=halo, SW=sw,
                             TAU=tau is not None)
    hmap, tmap = _s8_row_maps(TS, H, halo)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dq.shape[0], CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TS, WPS, CO), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, WPS, CO), jnp.int8)],
        scratch_shapes=[pltpu.VMEM(((TS + 2) * WPS + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w9, dq, x, x, x)[0]


def res_site_s8i_yadd(xq: jnp.ndarray, y: jnp.ndarray, w9: jnp.ndarray,
                      ws: jnp.ndarray, bias: jnp.ndarray, *,
                      ts: int | None = None, mt: int = 4):
    """Consume a ``res_site_s8o`` tensor and fold the residual add.

    xq: (B, H, WPS, C) s8 (column halos pre-injected). y: (B, H, W0, C)
    bf16 — the block input, added to the dequantized conv output. Returns
    y_new = bf16(bf16(conv·ws + bias) + y), shape (B, H, W0, CO).
    Thin specialization of ``site_s8`` (3x3/PT=PL=1, YADD, bf16 out)."""
    return site_s8(xq, w9, ws, bias, w0=y.shape[2], y=y, ts=ts, mt=mt)


def _site_kernel_s8g(w_ref, dq_ref, qh_ref, qb_ref, qt_ref, *refs,
                     TS, W0, WPS, WPO, MT=4, NS=None, KH=3, KW=3,
                     PT=1, PL=1, YADD=False, S8OUT=False, AFF=False,
                     YAFF=False, QLO=0.0, HALO="zero", HALO_OUT=None,
                     SW=None):
    """Generic static-scale s8-INPUT site (the s8-carry workhorse):
    strips arrive as s8 with the column halos pre-injected
    (``_site_kernel_s8o`` / own output form), so the prologue is a plain
    copy; image-border row halos are zeroed (HALO="zero") or ride the
    wrapper's reflect/edge index maps (quantize is pointwise, so the
    carry's row 1 / row H−2 IS the reflect halo code). KHxKW taps with
    PT/PL pad offsets (3x3/1/1 res form; 2x2/0/0 k3-convT scatter).

    Epilogue combos (all rounding through bf16 at every materialization
    point, matching the XLA int8 reference bit-for-bit):
      AFF:   frozen norm affine  fv = bf16(f32(fv)·aa + ac)  (static-norm
             Johnson in2; applied after the raw's bf16 round, before YADD)
      YADD:  fold a residual add  y_new = bf16(f32(fv) + f32(y))
      YAFF:  the residual operand arrives RAW and a frozen affine + ReLU
             apply to it first: y_act = bf16(max(f32(y)·ya + yc, 0)) —
             the fused-head handoff, where the activated res input never
             exists in HBM (rows [ya, yc] appended to dq)
      S8OUT: STATIC output quantize q = clip(round(f32(fv)·qa + qc),
             QLO, 127), emitted at width WPO with the column halos
             injected — the next s8 site's input. Only valid when every
             intervening norm is a compile-time constant.
    Default epilogue (S8OUT=False) emits the bf16 raw at width W0.
    dq rows: [ws, bias] + ([aa, ac] if AFF) + ([qa, qc] if S8OUT).
    HALO_OUT: emitted-column-halo type when it differs from the input
    rows' (the Johnson res->dec bridge: reflect res carry in, edge dec
    carry out; "zero2" = the deconv3 tail layout)."""
    from jax.experimental import pallas as pl

    if YADD:
        yb_ref, o_ref, xs_ref = refs
    else:
        o_ref, xs_ref = refs
    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]
    row = 2
    if AFF:
        aa, ac = dq_ref[row, :], dq_ref[row + 1, :]
        row += 2
    if S8OUT:
        qa, qc = dq_ref[row, :], dq_ref[row + 1, :]
        row += 2
    if YAFF:
        ya, yc = dq_ref[row, :], dq_ref[row + 1, :]

    xh = qh_ref[0].reshape(WPS, C)
    xt = qt_ref[0].reshape(WPS, C)
    if HALO == "zero":
        z8 = jnp.zeros((WPS, C), jnp.int8)
        xh = jnp.where(j == 0, z8, xh)
        xt = jnp.where(j == NS - 1, z8, xt)
    xs_ref[0:WPS] = xh
    xs_ref[WPS:(TS + 1) * WPS] = qb_ref[0].reshape(TS * WPS, C)
    xs_ref[(TS + 1) * WPS:(TS + 2) * WPS] = xt
    xs_ref[(TS + 2) * WPS:] = jnp.zeros((32, C), jnp.int8)

    for r0, rows in _tiles(TS, MT):
        m0 = r0 * WPS
        MTn = rows * WPS
        acc = None
        for dy in range(KH):
            for dx in range(KW):
                s = m0 + (dy + 1 - PT) * WPS + (dx + 1 - PL)
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[dy * KW + dx],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WPS, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        if AFF:
            fv = (fv.astype(jnp.float32) * aa + ac).astype(jnp.bfloat16)
        if YADD:
            yv = yb_ref[0, r0:r0 + rows].astype(jnp.float32)
            if YAFF:
                yv = jnp.maximum(yv * ya + yc, 0.0).astype(
                    jnp.bfloat16).astype(jnp.float32)
            fv = (fv.astype(jnp.float32) + yv).astype(jnp.bfloat16)
        if S8OUT:
            q = jnp.clip(jnp.round(fv.astype(jnp.float32) * qa + qc),
                         QLO, 127.0).astype(jnp.int8)
            if SW is not None and SW < W0:
                # keep alignment-padding columns at zero codes (the input
                # strips already carry zeros there; the conv output does
                # not — bias/taps leak in — so mask the emit too)
                ci = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
                q = jnp.where(ci < SW, q, jnp.zeros_like(q))
            o_ref[0, r0:r0 + rows] = _s8_col_halo(
                q, W0, WPO, HALO if HALO_OUT is None else HALO_OUT)
        else:
            o_ref[0, r0:r0 + rows] = fv


def site_s8(xq: jnp.ndarray, w: jnp.ndarray, ws: jnp.ndarray,
            bias: jnp.ndarray, *, w0: int, y: jnp.ndarray | None = None,
            qo=None, qa=None, qc=None, aff=None, yaff=None,
            qlo: float = 0.0,
            halo: str = "zero", halo_out: str | None = None,
            sw: int | None = None, kh: int = 3, kw: int = 3,
            pt: int = 1, pl_: int = 1, ts: int | None = None, mt: int = 4):
    """Static-scale s8-input KHxKW site.

    xq: (B, H, WPS, C) s8, content at columns 1..w0 with the column
    halos pre-injected (``res_site_s8o`` / own S8OUT form); ``halo``
    ("zero"/"reflect"/"edge") picks the image-border ROW behavior and the
    emitted column halos. w: (kh*kw, C, CO) s8; ws, bias: (CO,) f32.
    aff: optional (aa, ac) per-channel (CO,) FROZEN norm affine applied
    after the raw's bf16 round (static-norm Johnson in2).
    y: optional (B, H, w0, C) bf16 residual folded into the epilogue.
    Output quantize: scalar ``qo`` or per-channel ``qa``/``qc`` (CO,)
    rows — when given the site emits (B, H, _wps(w0), CO) s8 (clamp
    floor qlo; 0.0 folds a trailing ReLU), else the (B, H, w0, CO)
    bf16 raw. ``halo_out``: emitted-column-halo type when it differs
    from the input carry's (Johnson res->dec bridge: reflect in, edge
    out; "zero2" emits the 5-tap deconv3-tail layout at _wps2(w0)).
    ``sw`` (zero halo only): content width < w0 — the emitted
    s8 codes beyond sw are masked to zero (the input carry already has
    zeros there), preserving zero-pad semantics through non-%8 chains."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, WPS, C = xq.shape
    CO = w.shape[2]
    assert sw is None or halo == "zero", \
        "sw content-width masking is zero-halo only"
    TS = ts if ts is not None else _pick_ts(H)
    NS = H // TS
    s8out = qo is not None or qa is not None
    WPO = w0
    if s8out:
        WPO = _wps2(w0) if halo_out == "zero2" else _wps(w0)
    rows = [ws, bias]
    if aff is not None:
        rows.extend([aff[0], aff[1]])
    if s8out:
        if qa is None:
            qa = jnp.full((CO,), qo, jnp.float32)
            qc = jnp.zeros((CO,), jnp.float32)
        rows.extend([qa, qc])
    if yaff is not None:
        # frozen affine + ReLU applied to the RAW residual operand
        # ((C,)-shaped rows; C == CO for every YAFF caller)
        rows.extend([jnp.reshape(yaff[0].astype(jnp.float32), (-1,)),
                     jnp.reshape(yaff[1].astype(jnp.float32), (-1,))])
    dq = jnp.stack(rows, axis=0)                       # (2..8, CO)
    kern = functools.partial(_site_kernel_s8g, TS=TS, W0=w0, WPS=WPS,
                             WPO=WPO, MT=mt, NS=NS, KH=kh, KW=kw, PT=pt,
                             PL=pl_, YADD=y is not None,
                             S8OUT=s8out, AFF=aff is not None,
                             YAFF=yaff is not None,
                             QLO=qlo, HALO=halo, HALO_OUT=halo_out, SW=sw)
    hmap, tmap = _s8_row_maps(TS, H, halo)
    in_specs = [
        pl.BlockSpec((kh * kw, C, CO), lambda b, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dq.shape[0], CO), lambda b, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WPS, C), hmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TS, WPS, C), lambda b, j: (b, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WPS, C), tmap, memory_space=pltpu.VMEM),
    ]
    args = [w, dq, xq, xq, xq]
    if y is not None:
        in_specs.append(pl.BlockSpec((1, TS, w0, C), lambda b, j: (b, j, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(y)
    odt = jnp.int8 if s8out else jnp.bfloat16
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, TS, WPO, CO), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, WPO, CO), odt)],
        scratch_shapes=[pltpu.VMEM(((TS + 2) * WPS + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(*args)[0]


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


def _d3s8_kernel(w_ref, sel_ref, dq_ref, b_ref, h2_ref, h1_ref, body_ref,
                 t1_ref, t2_ref, o_ref, xs_ref, ks_ref, *,
                 TS, W2, WPD, MT=4, NS=None):
    """s8-carry deconv3 tail site (the static-norm "tail_s8" form).

    Input strips are the next-site carry emitted by the d2 site with
    halo_out="zero2" (content at columns 2..W2+1, zero columns beyond —
    the 1x5 conv's zero-SAME pads). Phase 1 runs the tap-packed 1x5 s8
    rows conv (i32 acc on the MXU, per-channel dequant, bf16 round —
    bit-matching the XLA reference's materialized K rows) for the tile's
    TS rows PLUS two halo rows each side into a VMEM scratch; phase 2
    collapses the five shifted dy-slices with 0/1 selection dots (exact
    value pass-through; f32 accumulation in the same dy order as the
    reference's f32 adds), adds the deconv3 bias, and emits the final
    (TS, W2, 12) bf16 block. Image-border rows are zero (the top/bottom
    output rows are strip-fixed by the caller, exactly like the XLA
    zero-SAME branch in transformer_net_s2d2.apply).

    Reference math: /root/reference/transformer_net.py:52-56 (deconv3),
    tap-packed per models/transformer_net_s2d2._scatter_k9_f2."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    ws = dq_ref[0, :]
    z = jnp.zeros((WPD, C), jnp.int8)
    xs_ref[0:WPD] = jnp.where(j == 0, z, h2_ref[0].reshape(WPD, C))
    xs_ref[WPD:2 * WPD] = jnp.where(j == 0, z, h1_ref[0].reshape(WPD, C))
    xs_ref[2 * WPD:(TS + 2) * WPD] = body_ref[0].reshape(TS * WPD, C)
    xs_ref[(TS + 2) * WPD:(TS + 3) * WPD] = jnp.where(
        j == NS - 1, z, t1_ref[0].reshape(WPD, C))
    xs_ref[(TS + 3) * WPD:(TS + 4) * WPD] = jnp.where(
        j == NS - 1, z, t2_ref[0].reshape(WPD, C))
    xs_ref[(TS + 4) * WPD:] = jnp.zeros((32, C), jnp.int8)

    # phase 1: K rows (tile + 2-row halos) -> bf16 scratch
    for r0, rows in _tiles(TS + 4, MT):
        m0 = r0 * WPD
        MTn = rows * WPD
        acc = None
        for dx in range(5):
            p = jnp.dot(xs_ref[m0 + dx:m0 + dx + MTn, :], w_ref[dx],
                        preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        ks_ref[m0:m0 + MTn] = (acc.astype(jnp.float32) * ws).astype(
            jnp.bfloat16)

    # phase 2: the five shifted dy-slices collapse via selection dots
    for r0, rows in _tiles(TS, MT):
        MTn = rows * WPD
        acc = None
        for dy in range(5):
            s = (r0 + dy) * WPD
            p = jnp.dot(ks_ref[s:s + MTn, :], sel_ref[dy],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        v = acc + b_ref[0, :]
        o_ref[0, r0:r0 + rows] = (
            v.reshape(rows, WPD, 12)[:, 0:W2, :].astype(jnp.bfloat16))


def d3s8_supported(h2: int, w2: int) -> bool:
    return h2 >= 8 and w2 >= 16 and w2 % 8 == 0 and _pick_ts(h2) is not None


def d3_s8_site(xq: jnp.ndarray, w5: jnp.ndarray, ws: jnp.ndarray,
               bias: jnp.ndarray, *, w0: int,
               ts: int | None = None, mt: int = 4) -> jnp.ndarray:
    """The complete tap-packed deconv3 on an s8 carry, dy-sum in-kernel.

    xq: (B, H2, _wps2(w0), 128) s8, content at columns 2..w0+1 (the
    "zero2" layout from site_s8(halo_out="zero2") — the d2 site folds the
    frozen in5 affine + ReLU into its emit quantize). w5: (5, 128, 60) s8
    tap-packed rows weight; ws: (60,) f32 dequant; bias: (12,) f32
    applied post-sum. Returns (B, H2, w0, 12) bf16 — the deconv3 output
    with zero-SAME borders (the caller strip-fixes the 2-px frame).
    Unlike the bf16-dynamic d3_rows_site (a measured in-net regression —
    PERF.md round-3), neither the 60-lane K tensor nor the bf16 d2 raw
    ever exists in HBM."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, WPD, C = xq.shape
    CO = w5.shape[2]
    assert WPD == _wps2(w0), (WPD, w0)
    TS = ts if ts is not None else _pick_ts(H)
    NS = H // TS
    sel = np.zeros((5, CO, 12), np.float32)
    for dy in range(5):
        sel[dy, dy * 12:(dy + 1) * 12] = np.eye(12)
    sel = jnp.asarray(sel, jnp.bfloat16)
    dq = ws[None, :].astype(jnp.float32)               # (1, CO)
    bi = bias[None, :].astype(jnp.float32)             # (1, 12)
    h2m = lambda b, j: (b, jnp.maximum(TS * j - 2, 0), 0, 0)  # noqa: E731
    h1m = lambda b, j: (b, jnp.maximum(TS * j - 1, 0), 0, 0)  # noqa: E731
    t1m = lambda b, j: (b, jnp.minimum(TS * (j + 1), H - 1), 0, 0)  # noqa: E731
    t2m = lambda b, j: (b, jnp.minimum(TS * (j + 1) + 1, H - 1), 0, 0)  # noqa: E731
    kern = functools.partial(_d3s8_kernel, TS=TS, W2=w0, WPD=WPD, MT=mt,
                             NS=NS)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((5, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, CO, 12), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WPD, C), h2m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WPD, C), h1m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, WPD, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WPD, C), t1m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, WPD, C), t2m, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TS, w0, 12), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, w0, 12), jnp.bfloat16)],
        scratch_shapes=[
            pltpu.VMEM(((TS + 4) * WPD + 32, C), jnp.int8),
            pltpu.VMEM(((TS + 4) * WPD, CO), jnp.bfloat16),
        ],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(w5, sel, dq, bi, xq, xq, xq, xq, xq)[0]


def _stats(sout, n, eps=1e-5):
    mean = sout[:, 0] / n
    var = sout[:, 1] / n - mean * mean
    return mean, jax.lax.rsqrt(var + eps)


# ---------------------------------------------------------------------------
# int8 head chain: conv2 + conv3 as column-PAIR-packed sites
# (reference layers: /root/reference/transformer_net.py:10-14 conv2/conv3,
# restructured per models/transformer_net_s2d2.py c2/c3)
# ---------------------------------------------------------------------------


def _pair_c2_weights(wq) -> jnp.ndarray:
    """s8 c2 block weights (2,2,128,64) → (4,256,128) pair-packed
    [ka*2 + pair-tap]: input lanes [540col 2j | 2j+1] (each 128 = conv1's
    4 phases × 32), output lanes [c2 out 2j | 2j+1] (each 64)."""
    import numpy as np

    w = np.asarray(wq)
    out = np.zeros((4, 256, 128), np.int8)
    for ka in range(2):
        out[ka * 2 + 0, 128:, 0:64] = w[ka, 0]    # col 2j-1 → out 2j (kb=0)
        out[ka * 2 + 1, :128, 0:64] = w[ka, 1]    # col 2j   → out 2j (kb=1)
        out[ka * 2 + 1, :128, 64:] = w[ka, 0]     # col 2j   → out 2j+1 (kb=0)
        out[ka * 2 + 1, 128:, 64:] = w[ka, 1]     # col 2j+1 → out 2j+1 (kb=1)
    return jnp.asarray(out)


def _pair_c3_weights(wq) -> jnp.ndarray:
    """s8 c3 weights (3,3,64,128) → (6,128,128) [dy*2 + pair-tap]: the
    stride-2 column taps 2J-1/2J/2J+1 land on (pair J-1 high, pair J low,
    pair J high)."""
    import numpy as np

    w = np.asarray(wq)
    out = np.zeros((6, 128, 128), np.int8)
    for dy in range(3):
        out[dy * 2 + 0, 64:, :] = w[dy, 0]        # x[2J-1] (pair J-1 high)
        out[dy * 2 + 1, :64, :] = w[dy, 1]        # x[2J]   (pair J low)
        out[dy * 2 + 1, 64:, :] = w[dy, 2]        # x[2J+1] (pair J high)
    return jnp.asarray(out)


def _perm_row256() -> jnp.ndarray:
    """s8 (256,256) permutation: c2's TOP phase halo in pair view — halo
    row ch (h, u, v, c) ← row-0 ch (h, 1, v, c) (transformer_net_s2d
    ._pad_stride2_halo, phases [1,1] of block 0); lane-preserving per
    pair half h."""
    import numpy as np

    P = np.zeros((256, 256), np.int8)
    for h in range(2):
        for u in range(2):
            for v in range(2):
                for c in range(32):
                    P[h * 128 + 64 + v * 32 + c,
                      h * 128 + u * 64 + v * 32 + c] = 1
    return jnp.asarray(P)


def _perm_col256() -> jnp.ndarray:
    """s8 (256,256) permutation: c2's LEFT phase halo — halo pair =
    [junk | halo col] where halo col ch (u, v, c) ← col-0 ch (u, 1, c);
    col 0 is the LOW half of pair 0."""
    import numpy as np

    P = np.zeros((256, 256), np.int8)
    for u in range(2):
        for v in range(2):
            for c in range(32):
                P[u * 64 + 32 + c, 128 + u * 64 + v * 32 + c] = 1
    return jnp.asarray(P)


def _c2p_kernel(stat_ref, w_ref, dq_ref, pr_ref, pc_ref, head_ref, body_ref,
                o_ref, sout_ref, xs_ref, *, TS, W0, WP, MT=4):
    """c2 pair site: quantize (in1 affine + ReLU folded) -> phase-permuted
    top/left halos (s8 permutation dots) -> 2x2 pair conv (4 dots, K=256)
    -> dequant + bias -> bf16 pair raw + stats."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = 256
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    def quant(v):
        x = v.astype(jnp.float32) * a + c
        return jnp.clip(jnp.round(x), 0.0, 127.0).astype(jnp.int8)

    qh = quant(head_ref[0])                            # (1, W0, 256)
    qb = quant(body_ref[0])                            # (TS, W0, 256)
    # top halo: at j==0 the head ref IS row 0 → phase-permute it; at j>0
    # the head ref is the real previous row (plain). Both computed, scalar
    # select (the extra perm dot is ~W0·256·256 MACs — noise).
    hperm = jnp.dot(qh[0], pr_ref[...],
                    preferred_element_type=jnp.int32).astype(jnp.int8)
    hrow = jnp.where(j == 0, hperm[None], qh)          # (1, W0, 256)

    def inj(q):
        """(R, W0, 256) → (R, WP, 256): X[0] = left phase halo (perm dot
        of pair 0), X[1:W0+1] = q, zero junk beyond."""
        R = q.shape[0]
        X = jnp.pad(q, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        ch = jnp.dot(q[:, 0, :], pc_ref[...],
                     preferred_element_type=jnp.int32).astype(jnp.int8)
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
        return jnp.where(ci == 0, ch[:, None, :], X)

    xs_ref[0:WP] = inj(hrow).reshape(WP, C)
    xs_ref[WP:(TS + 1) * WP] = inj(qb).reshape(TS * WP, C)
    xs_ref[(TS + 1) * WP:] = jnp.zeros((32, C), jnp.int8)

    s1 = jnp.zeros((CO,), jnp.float32)
    s2 = jnp.zeros((CO,), jnp.float32)
    for r0, rows in _tiles(TS, MT):
        MTn = rows * WP
        acc = None
        for ka in range(2):
            for k in range(2):
                s = (r0 + ka) * WP + k
                p = jnp.dot(xs_ref[s:s + MTn, :], w_ref[ka * 2 + k],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        o_ref[0, r0:r0 + rows] = fv
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


def c2p_site(yp: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
             w4: jnp.ndarray, ws: jnp.ndarray, bias: jnp.ndarray,
             *, ts: int | None = None, mt: int = 4):
    """conv2 as a pair-packed int8 site. yp: (B, H2, W2/2, 256) conv1 raw
    in pair view. a, c: (B, 256) quant-folded in1 affine (ReLU → clamp 0).
    Returns (pair raw (B, H2, W2/2, 128), sout (B, 2, 128))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W0, C = yp.shape
    CO = w4.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WP = ((W0 + 2 + 7) // 8) * 8
    NS = H // TS
    stat = jnp.stack([a, c], axis=1)
    dq = jnp.stack([ws, bias], axis=0)
    kern = functools.partial(_c2p_kernel, TS=TS, W0=W0, WP=WP, MT=mt)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C),
                         lambda b, j: (b, jnp.maximum(TS * j - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TS, W0, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM(((TS + 1) * WP + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w4, dq, _perm_row256(), _perm_col256(), yp, yp)


def _c3p_kernel(stat_ref, w_ref, dq_ref, head_ref, body_ref,
                o_ref, sout_ref, xe_ref, xo_ref, *, TS, W0, WP, MT=4):
    """c3 pair site: stride-2 3x3 conv — even/odd input rows deinterleave
    into two scratch regions so every tap is a contiguous slice; the
    pixel-reflect column halo (col -1 = col 1) is a plain pair-0 copy
    (only its high rows are read)."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    C = w_ref.shape[1]
    CO = w_ref.shape[2]
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    ws = dq_ref[0, :]
    bi = dq_ref[1, :]

    def quant(v):
        x = v.astype(jnp.float32) * a + c
        return jnp.clip(jnp.round(x), 0.0, 127.0).astype(jnp.int8)

    def inj0(q):
        R = q.shape[0]
        X = jnp.pad(q, ((0, 0), (1, WP - W0 - 1), (0, 0)))
        ci = jax.lax.broadcasted_iota(jnp.int32, (R, WP, C), 1)
        return jnp.where(ci == 0, q[:, 0:1, :], X)

    qh = quant(head_ref[0])                            # (1, W0, C)
    qb = quant(body_ref[0]).reshape(TS, 2, W0, C)
    xe_ref[0:TS * WP] = inj0(qb[:, 0]).reshape(TS * WP, C)
    xe_ref[TS * WP:] = jnp.zeros((32, C), jnp.int8)
    xo_ref[0:WP] = inj0(qh).reshape(WP, C)
    xo_ref[WP:(TS + 1) * WP] = inj0(qb[:, 1]).reshape(TS * WP, C)
    xo_ref[(TS + 1) * WP:] = jnp.zeros((32, C), jnp.int8)

    s1 = jnp.zeros((CO,), jnp.float32)
    s2 = jnp.zeros((CO,), jnp.float32)
    for r0, rows in _tiles(TS, MT):
        MTn = rows * WP
        acc = None
        taps = [(xo_ref, r0 * WP, 0), (xe_ref, r0 * WP, 1),
                (xo_ref, (r0 + 1) * WP, 2)]
        for src, base, dy in taps:
            for k in range(2):
                p = jnp.dot(src[base + k:base + k + MTn, :],
                            w_ref[dy * 2 + k],
                            preferred_element_type=jnp.int32)
                acc = p if acc is None else acc + p
        f = acc.astype(jnp.float32) * ws + bi
        fv = f.reshape(rows, WP, CO)[:, 0:W0, :].astype(jnp.bfloat16)
        o_ref[0, r0:r0 + rows] = fv
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


def c3p_site(y2p: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
             w6: jnp.ndarray, ws: jnp.ndarray, bias: jnp.ndarray,
             *, ts: int | None = None, mt: int = 4):
    """conv3 (3x3 stride-2) as a pair-packed int8 site. y2p:
    (B, H2, W2/2, 128) c2 raw in pair view. a, c: (B, 128) quant-folded
    in2 affine. Returns (y3 raw (B, H2/2, W2/2, 128), sout (B, 2, 128))
    — the output grid is the standard 270-grid, no un-pairing needed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H2, W0, C = y2p.shape
    H = H2 // 2
    CO = w6.shape[2]
    TS = ts if ts is not None else _pick_ts(H)
    WP = ((W0 + 2 + 7) // 8) * 8
    NS = H // TS
    stat = jnp.stack([a, c], axis=1)
    dq = jnp.stack([ws, bias], axis=0)
    kern = functools.partial(_c3p_kernel, TS=TS, W0=W0, WP=WP, MT=mt)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, C, CO), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CO), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W0, C),
                         lambda b, j: (b, jnp.abs(2 * TS * j - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * TS, W0, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((TS * WP + 32, C), jnp.int8),
                        pltpu.VMEM(((TS + 1) * WP + 32, C), jnp.int8)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w6, dq, y2p, y2p)


def head_supported(h2: int, w2: int) -> bool:
    """c2 at the (h2, w2) 540-grid (pair width w2/2), c3 to (h2/2, w2/2)."""
    wp = w2 // 2
    return (h2 % 2 == 0 and w2 % 2 == 0 and wp >= 16 and h2 >= 16
            and wp % 8 == 0  # pair width is the Pallas block width
            and _pick_ts(h2) is not None and _pick_ts(h2 // 2) is not None)


def head_chain(y1: jnp.ndarray, m1: jnp.ndarray, inv1: jnp.ndarray,
               p: dict, quant: dict, static_stats: dict | None = None):
    """conv2 + conv3 as pair-packed fused int8 sites.

    y1: (B, H2, W2, 128) conv1 raw output (540 grid, 4 phases × 32).
    m1, inv1: its in1 stats per (B, 32). Returns ``(y3_raw, m3, inv3)``:
    the raw conv3 output on the 270 grid plus its in3 stats — the caller
    applies in3 exactly like after the XLA c3 (_apply_in_relu phases=1).

    static_stats: frozen ``in2``/``in3`` stats (the static-norm modes) —
    replaces the kernel-epilogue reductions so the head quantizes against
    the same frozen graph its scales were calibrated on."""
    B, H2, W2, _ = y1.shape
    q2, q3 = quant["c2"], quant["c3"]
    yp = y1.reshape(B, H2, W2 // 2, 256)              # pair view (lane fold)

    def _fz(site):
        if static_stats is not None and site in static_stats:
            ms, invs = static_stats[site]
            return (jnp.broadcast_to(ms.astype(jnp.float32),
                                     (B, ms.shape[-1])),
                    jnp.broadcast_to(invs.astype(jnp.float32),
                                     (B, invs.shape[-1])))
        return None

    sc = p["in2"]["scale"].astype(jnp.float32)
    sc1 = p["in1"]["scale"].astype(jnp.float32)
    bi1 = p["in1"]["bias"].astype(jnp.float32)
    a1 = jnp.tile((inv1 * sc1) * q2["qin"], (1, 8))
    c1 = jnp.tile((bi1 - m1 * inv1 * sc1) * q2["qin"], (1, 8))
    r2, sout = c2p_site(yp, a1, c1, _pair_c2_weights(q2["w"]),
                        jnp.tile(q2["ws"], 2),
                        jnp.tile(p["c2_b"].astype(jnp.float32), 2))
    fz2 = _fz("in2")
    m2, inv2 = fz2 if fz2 is not None else _stats_phased(
        sout, float(H2 * (W2 // 2)), 2, r2.shape[-1] // 2)

    bi2 = p["in2"]["bias"].astype(jnp.float32)
    a2 = jnp.tile((inv2 * sc) * q3["qin"], (1, 2))
    c2 = jnp.tile((bi2 - m2 * inv2 * sc) * q3["qin"], (1, 2))
    y3, sout3 = c3p_site(r2, a2, c2, _pair_c3_weights(q3["w"]),
                         q3["ws"], p["c3_b"].astype(jnp.float32))
    fz3 = _fz("in3")
    m3, inv3 = fz3 if fz3 is not None else _stats(
        sout3, float(y3.shape[1] * y3.shape[2]))
    return y3, m3, inv3


def _stats_phased(sout, n, phases, c, eps=1e-5):
    """IN stats per logical channel from per-conv-channel [sum, sum_sq]
    when the CO axis is (phases × c) — matches _in_stats(y, phases, c)."""
    b = sout.shape[0]
    s1 = sout[:, 0].reshape(b, phases, c).sum(1)
    s2 = sout[:, 1].reshape(b, phases, c).sum(1)
    nn = n * phases
    mean = s1 / nn
    var = s2 / nn - mean * mean
    return mean, jax.lax.rsqrt(var + eps)


def dec_supported(h4: int, w4: int) -> bool:
    """d1 runs at the (h4, w4) grid, d2 at (2·h4, 2·w4)."""
    return (res_supported(h4, w4) and res_supported(2 * h4, 2 * w4))


#: d2 as a column-PAIR-packed site (K=128, CO=256): the plain form's K=64
#: contraction half-fills the MXU and its 64-lane prologue half-fills the
#: VPU. Flag for the in-net A/B (experiments/mk24 PAIR_D2 env).
from ..adopt_overrides import flag as _adopt_flag

# Column-pair (K=128) d2 form vs the d2s+edge-halo (K=64) form; both exact
# (tests/test_int8.py dec parity covers both). Default OFF: the K=64 form
# is what the published 121.6 fps engine numbers measured; PAIR_D2=1
# opts the pair form in for its in-net TPU A/B (experiments/mk24), and
# adopt_from_queue --apply flips the default via i8_adopt.json on a win.
_PAIR_D2 = _adopt_flag("pair_d2", env="PAIR_D2")


def _pair_d2_weights(wq) -> jnp.ndarray:
    """(3,3,64,128) s8 d2 weights → (9,128,256) pair-packed: input lanes
    [col 2j | col 2j+1], output lanes [out 2j | out 2j+1], the 3 dx taps
    spread over 3 pair taps. Same s8 values (per-out-channel scales tile),
    so numerics are identical to the plain form."""
    import numpy as np

    w = np.asarray(wq)
    out = np.zeros((3, 3, 128, 256), np.int8)
    for dy in range(3):
        out[dy, 0, 64:, 0:128] = w[dy, 0]     # x[2j-1] → out 2j   (dx=0)
        out[dy, 1, 0:64, 0:128] = w[dy, 1]    # x[2j]   → out 2j   (dx=1)
        out[dy, 1, 64:, 0:128] = w[dy, 2]     # x[2j+1] → out 2j   (dx=2)
        out[dy, 1, 0:64, 128:] = w[dy, 0]     # x[2j]   → out 2j+1 (dx=0)
        out[dy, 1, 64:, 128:] = w[dy, 1]      # x[2j+1] → out 2j+1 (dx=1)
        out[dy, 2, 0:64, 128:] = w[dy, 2]     # x[2j+2] → out 2j+1 (dx=2)
    return jnp.asarray(out.reshape(9, 128, 256))


def res_chain_s8_static(y: jnp.ndarray, p: dict, quant: dict,
                        static_stats: dict, *, in_aff=None, emit_qo=None,
                        ts: int | None = None, mt: int = 4) -> jnp.ndarray:
    """The five Johnson res blocks on end-to-end s8 carries with FROZEN
    instance norms (the static-norm int8 mode, --quantize int8_static
    with "res_s8" adopted).

    With static stats every inter-conv scale is a compile-time constant,
    so the a-site emits the b-site's s8 input directly (the in1 affine +
    ReLU + quantize fold into the output rows — the bf16 a-raw never
    exists in HBM) and the b-site consumes s8, applies the frozen in2
    affine post-round, and folds the residual add. Per block the HBM
    boundary drops from bf16+bf16+stats to s8+bf16 — the same ~1 GB/block
    saving measured for the BN-folded .t7 s8 carry (PERF.md round-3).

    Matches the XLA static int8 reference
    (transformer_net_s2d2.apply(quant=, static_stats=, fused_sites=()))
    code-for-code: every materialization point rounds through bf16 in the
    same order, so the s8 carries are bit-identical; the bf16 outputs can
    differ by isolated 1-ulp f32-FMA-contraction flips (~1 element in 65k
    per block — tests/test_static_norm.py::test_static_s8_chain_bit_exact).

    in_aff: optional ``(a3, c3)`` frozen in3 affine rows ((1|B, C) f32) —
    the fused head's deferred apply folds into the FIRST a-site's input
    quantize (ReLU -> clamp floor 0), killing the standalone XLA apply
    pass between the head and res Pallas kernels.

    emit_qo: when set (the dec-s8 bridge), the LAST b-site also
    quantizes its combine output at this static scale and the chain
    returns deconv1's s8 input (B, H, WPS, C) with EDGE column halos
    (halo_out — d1's pad semantics) instead of bf16: the res-chain
    output never exists in HBM (the .t7/NST "ds8" structure).

    Reference math: /root/reference/transformer_net.py:60-99 (res blocks),
    restructured per models/transformer_net_s2d2.py."""
    B, H, W0, C = y.shape
    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa_, qb_ = quant[f"r{i}a"], quant[f"r{i}b"]
        m1, inv1 = (s.astype(jnp.float32) for s in static_stats[f"r{i}in1"])
        m2, inv2 = (s.astype(jnp.float32) for s in static_stats[f"r{i}in2"])
        sc1 = rp["in1"]["scale"].astype(jnp.float32)
        bi1 = rp["in1"]["bias"].astype(jnp.float32)
        sc2 = rp["in2"]["scale"].astype(jnp.float32)
        bi2 = rp["in2"]["bias"].astype(jnp.float32)
        # the b-site input quantize, exactly as the XLA _qc computes it
        qA = ((inv1 * sc1) * qb_["qin"])[0]            # (C,)
        qC = ((bi1 - m1 * inv1 * sc1) * qb_["qin"])[0]
        if i == 1 and in_aff is not None:
            # fused-head handoff: the frozen in3 affine + ReLU fold into
            # this quantize (q = clip(round(raw·a3·qin + c3·qin), 0, 127))
            aq = jnp.broadcast_to(
                (in_aff[0] * qa_["qin"]).astype(jnp.float32), (B, C))
            cq = jnp.broadcast_to(
                (in_aff[1] * qa_["qin"]).astype(jnp.float32), (B, C))
            lo1 = 0.0
        else:
            aq = jnp.full((B, C), qa_["qin"], jnp.float32)
            cq = jnp.zeros((B, C), jnp.float32)
            lo1 = -127.0
        qx = res_site_s8o(y, aq, cq, qa_["w"].reshape(9, C, C), qa_["ws"],
                          rp["conv1"]["b"].astype(jnp.float32),
                          qa=qA, qc=qC, lo=lo1, qlo=0.0, halo="reflect",
                          ts=ts, mt=mt)
        # frozen in2 affine, exactly as _apply_in_relu computes it
        aff = ((inv2 * sc2)[0], (bi2 - m2 * inv2 * sc2)[0])
        # block 1 under the fused-head handoff: the residual operand is
        # the RAW head output — the frozen in3 affine + ReLU apply to it
        # in the b-site's epilogue (yaff), so the activated tensor never
        # exists in HBM either
        yaff = None
        if i == 1 and in_aff is not None:
            yaff = (in_aff[0][0] if in_aff[0].ndim == 2 else in_aff[0],
                    in_aff[1][0] if in_aff[1].ndim == 2 else in_aff[1])
        if i == 5 and emit_qo is not None:
            return site_s8(qx, qb_["w"].reshape(9, C, C), qb_["ws"],
                           rp["conv2"]["b"].astype(jnp.float32), w0=W0,
                           y=y, aff=aff, yaff=yaff, qo=emit_qo, qlo=-127.0,
                           halo="reflect", halo_out="edge", ts=ts, mt=mt)
        y = site_s8(qx, qb_["w"].reshape(9, C, C), qb_["ws"],
                    rp["conv2"]["b"].astype(jnp.float32), w0=W0, y=y,
                    aff=aff, yaff=yaff, halo="reflect", ts=ts, mt=mt)
    return y


def dec_chain_s8_static(y: jnp.ndarray, p: dict, quant: dict,
                        static_stats: dict, *, w0: int | None = None,
                        tail: bool = False):
    """deconv1 + deconv2 on an s8 carry with FROZEN norms (static-norm
    Johnson, "dec_s8"): d1 consumes the res-chain output (bf16 with edge
    halos built in the quantize prologue — or, when ``y`` is already s8,
    the BRIDGED carry emitted by ``res_chain_s8_static(emit_qo=...)``)
    and emits deconv2's s8 input directly (the frozen in4 affine + ReLU
    fold into the output quantize — the bf16 d1 raw never exists in
    HBM); the d2s shuffle + edge-halo re-pad run at s8 (quantize is
    pointwise, so it commutes with the permutation and the halo copies —
    same argument as the .t7 dec-s8 carry); d2 emits the bf16 raw for
    the XLA tail with the static in5 stats.

    w0: content width of the res grid — required when ``y`` is the s8
    bridge carry (its padded width is not invertible).
    tail: run the "tail_s8" extension instead of emitting the d2 raw —
    d2 emits deconv3's s8 input (frozen in5 + ReLU folded, "zero2"
    layout) and the fused d3 site + border strip fixups produce the
    final 12-lane tensor; returns ``y12`` (B, 2H, 2W0, 12) bf16 (the
    caller d2s's it to pixels). Requires ``quant["d3"]``.

    Returns ``(d2_raw, m5, inv5)`` — the dynamic ``dec_chain`` contract —
    or ``y12`` when ``tail``.
    Reference math: /root/reference/transformer_net.py:40-56
    (UpsampleConvLayer), restructured per models/transformer_net_s2d2.py."""
    from .transformer_net_s2d import d2s

    q1, q2 = quant["d1"], quant["d2"]
    B, H = y.shape[0], y.shape[1]
    C = 128
    m4, inv4 = (s.astype(jnp.float32) for s in static_stats["in4"])
    sc4 = p["in4"]["scale"].astype(jnp.float32)
    bi4 = p["in4"]["bias"].astype(jnp.float32)
    # the d2 input quantize, exactly as the XLA _qc computes it at the
    # 540 grid (phases=1 over 64 ch) — tiled ×4 to d1's phase-major 256
    qA = jnp.tile(((inv4 * sc4) * q2["qin"])[0], 4)          # (256,)
    qC = jnp.tile(((bi4 - m4 * inv4 * sc4) * q2["qin"])[0], 4)
    if y.dtype == jnp.int8:
        assert w0 is not None, "bridged s8 carry needs the content width"
        W0 = w0
        qd1 = site_s8(y, q1["w"].reshape(9, C, -1), q1["ws"],
                      p["d1_b"].astype(jnp.float32), w0=W0,
                      qa=qA, qc=qC, qlo=0.0, halo="edge")
    else:
        W0 = y.shape[2]
        aq = jnp.full((B, C), q1["qin"], jnp.float32)
        cq = jnp.zeros((B, C), jnp.float32)
        qd1 = res_site_s8o(y, aq, cq, q1["w"].reshape(9, C, -1), q1["ws"],
                           p["d1_b"].astype(jnp.float32), qa=qA, qc=qC,
                           lo=-127.0, qlo=0.0, halo="edge")
    co = qd1.shape[-1] // 4                                  # 64
    qs = d2s(qd1[:, :, 1:W0 + 1], 2, co)                     # s8 @540 grid
    H2, W2 = 2 * H, 2 * W0
    WPS2 = _wps(W2)
    X = jnp.pad(qs, ((0, 0), (0, 0), (1, WPS2 - W2 - 1), (0, 0)))
    X = X.at[:, :, 0].set(qs[:, :, 0])                       # edge halos
    X = X.at[:, :, W2 + 1].set(qs[:, :, -1])
    if tail:
        return _tail_s8(X, p, quant, static_stats, w2=W2)
    r2 = site_s8(X, q2["w"].reshape(9, co, -1), q2["ws"],
                 p["d2_b"].astype(jnp.float32), w0=W2, halo="edge")
    m5, inv5 = static_stats["in5"]
    m5 = jnp.broadcast_to(m5.astype(jnp.float32), (B, m5.shape[-1]))
    inv5 = jnp.broadcast_to(inv5.astype(jnp.float32), (B, inv5.shape[-1]))
    return r2, m5, inv5


def _in5_emit_affine(p: dict, quant: dict, static_stats: dict):
    """deconv3's input quantize rows: the frozen in5 affine folded with
    d3's qin, tiled ×4 to d2's phase-major 128 channels (ReLU folds into
    the emit clamp's zero floor)."""
    q3 = quant["d3"]
    m5, inv5 = (s.astype(jnp.float32) for s in static_stats["in5"])
    sc5 = p["in5"]["scale"].astype(jnp.float32)
    bi5 = p["in5"]["bias"].astype(jnp.float32)
    qa5 = jnp.tile(((inv5 * sc5) * q3["qin"])[0], 4)         # (128,)
    qc5 = jnp.tile(((bi5 - m5 * inv5 * sc5) * q3["qin"])[0], 4)
    return qa5, qc5


def _d3_strip_i8(qsl: jnp.ndarray, q3: dict, bias: jnp.ndarray):
    """Border-strip deconv3 on s8 CODES with true phase-permuted reflect
    halos: quantize is pointwise, so the reflect gather commutes with it
    and the strip runs entirely on the emitted codes. Mirrors the bf16
    zero-SAME branch's ``_d3_strip`` (transformer_net_s2d2.apply) — i8
    conv is integer-exact, so fused path and XLA reference share this."""
    from ..ops.conv import conv2d_i8
    from .transformer_net_s2d2 import _pad_reflect_f2_4px

    ps = _pad_reflect_f2_4px(qsl, 32)                  # s8 reflect halos
    rs = conv2d_i8(ps, q3["w"])                        # VALID 1×5 → 60 lanes
    rs = (rs.astype(jnp.float32) * q3["ws"]).astype(jnp.bfloat16)
    n = rs.shape[1] - 4
    y = sum(rs[:, dy:dy + n, :, dy * 12:(dy + 1) * 12].astype(jnp.float32)
            for dy in range(5))
    return (y + bias.astype(jnp.float32)).astype(jnp.bfloat16)


def _tail_strips_fix(y12: jnp.ndarray, qd3: jnp.ndarray, q3: dict,
                     bias: jnp.ndarray, w2: int):
    """Replace the 2-px zero-SAME border frame with the exact reflect
    strips (recomputed from the emitted s8 codes)."""
    qc_ = qd3[:, :, 2:w2 + 2]                          # content codes
    top = _d3_strip_i8(qc_[:, :4], q3, bias)[:, :2]
    bot = _d3_strip_i8(qc_[:, -4:], q3, bias)[:, -2:]
    lef = _d3_strip_i8(qc_[:, :, :4], q3, bias)[:, :, :2]
    rig = _d3_strip_i8(qc_[:, :, -4:], q3, bias)[:, :, -2:]
    y12 = y12.at[:, :2].set(top)
    y12 = y12.at[:, -2:].set(bot)
    y12 = y12.at[:, :, :2].set(lef)
    y12 = y12.at[:, :, -2:].set(rig)
    return y12


def _tail_s8(X: jnp.ndarray, p: dict, quant: dict, static_stats: dict, *,
             w2: int) -> jnp.ndarray:
    """deconv2 + deconv3 on the s8 carry ("tail_s8"): d2 emits deconv3's
    s8 input directly (frozen in5 affine + ReLU folded into the emit
    quantize, "zero2" zero-SAME column layout — the 2.1 GB/B16 bf16 d2
    raw never exists in HBM), the fused d3 site runs the tap-packed 1×5
    i8 conv with the dy-sum collapsed in VMEM (the 60-lane K tensor and
    its 5-slice-add pass die too), and the 2-px border frame is
    strip-fixed from the codes. X: d2's s8 input at the 540 grid (edge
    halos). Returns (B, H2, w2, 12) bf16 — d2s to pixels is the caller's.

    Parity contract: ``tail_s8_xla`` (the pure-XLA reference) matches to
    isolated 1-ulp bf16 flips; see tests/test_static_norm.py."""
    q2, q3 = quant["d2"], quant["d3"]
    co = X.shape[-1]                                   # 64
    qa5, qc5 = _in5_emit_affine(p, quant, static_stats)
    qd3 = site_s8(X, q2["w"].reshape(9, co, -1), q2["ws"],
                  p["d2_b"].astype(jnp.float32), w0=w2,
                  qa=qa5, qc=qc5, qlo=0.0, halo="edge", halo_out="zero2")
    y12 = d3_s8_site(qd3, q3["w"].reshape(5, 128, -1), q3["ws"],
                     p["d3_b"].astype(jnp.float32), w0=w2)
    return _tail_strips_fix(y12, qd3, q3, p["d3_b"], w2)


def tail_s8_xla(X: jnp.ndarray, p: dict, quant: dict, static_stats: dict,
                *, w2: int) -> jnp.ndarray:
    """Pure-XLA reference for ``_tail_s8`` — the parity contract the
    fused kernels are tested against (integer convs are exact, so the
    two differ only by isolated 1-ulp bf16 FMA-contraction flips)."""
    from ..ops.conv import conv2d_i8

    q2, q3 = quant["d2"], quant["d3"]
    H2 = X.shape[1]
    # d2: edge row pads + VALID 3×3 over the carry (columns 0..w2+1
    # include the edge column halos)
    Xr = jnp.concatenate([X[:, :1], X, X[:, -1:]], axis=1)[:, :, :w2 + 2]
    r2 = (conv2d_i8(Xr, q2["w"]).astype(jnp.float32) * q2["ws"]
          + p["d2_b"].astype(jnp.float32)).astype(jnp.bfloat16)
    qa5, qc5 = _in5_emit_affine(p, quant, static_stats)
    qd3c = jnp.clip(jnp.round(r2.astype(jnp.float32) * qa5 + qc5),
                    0.0, 127.0).astype(jnp.int8)       # (B, H2, w2, 128)
    # d3 interior: zero-SAME (zero row/column pads), K rows bf16
    K = conv2d_i8(jnp.pad(qd3c, ((0, 0), (0, 0), (2, 2), (0, 0))), q3["w"])
    K = (K.astype(jnp.float32) * q3["ws"]).astype(jnp.bfloat16)
    Kp = jnp.pad(K, ((0, 0), (2, 2), (0, 0), (0, 0)))
    y12 = sum(Kp[:, dy:dy + H2, :, dy * 12:(dy + 1) * 12].astype(jnp.float32)
              for dy in range(5))
    y12 = (y12 + p["d3_b"].astype(jnp.float32)).astype(jnp.bfloat16)
    qd3 = jnp.pad(qd3c, ((0, 0), (0, 0), (2, _wps2(w2) - w2 - 2), (0, 0)))
    return _tail_strips_fix(y12, qd3, q3, p["d3_b"], w2)


def dec_chain(y: jnp.ndarray, p: dict, quant: dict, carry=None,
              static_stats: dict | None = None):
    """deconv1 + deconv2 as fused int8 sites (edge halos in-kernel).

    y: (B, H4, W4, 128) the res-chain output — or, when ``carry`` is the
    ``(r2, a2, c2)`` tuple from ``res_chain(..., ret_carry=True)``, the
    PRE-previous activation: block 5's residual add then folds into the
    d1 kernel's prologue instead of a standalone HBM pass. Returns
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

    def _site_stats(site, sout, n, phases, c):
        if static_stats is not None and site in static_stats:
            ms, invs = static_stats[site]
            return (jnp.broadcast_to(ms.astype(jnp.float32), (B, ms.shape[-1])),
                    jnp.broadcast_to(invs.astype(jnp.float32), (B, invs.shape[-1])))
        return _stats_phased(sout, n, phases, c)

    # d1: plain quantize (res output has no pending affine), 128 -> 256.
    aq = jnp.full((B, C), q1["qin"], jnp.float32)
    cq = jnp.zeros((B, C), jnp.float32)
    if carry is not None:
        r2p, a2p, c2p = carry
        r, sout, _ = res_site_skip(r2p, y, aq, cq, a2p, c2p,
                                   q1["w"].reshape(9, C, -1), q1["ws"],
                                   p["d1_b"].astype(jnp.float32), -127.0,
                                   halo="edge", yout=False)
    else:
        r, sout = res_site(y, aq, cq, q1["w"].reshape(9, C, -1), q1["ws"],
                           p["d1_b"].astype(jnp.float32), -127.0, halo="edge")
    m, inv = _site_stats("in4", sout, float(H * W0), 4, r.shape[-1] // 4)

    # d2: in4 affine folds into the quantize (ReLU -> clamp lo=0), 64 -> 128.
    sc = p["in4"]["scale"].astype(jnp.float32)
    bi = p["in4"]["bias"].astype(jnp.float32)
    a_eff = (inv * sc) * q2["qin"]
    c_eff = (bi - m * inv * sc) * q2["qin"]
    co = r.shape[-1] // 4                          # 64
    if _PAIR_D2:
        # column-pair form: expand the u phase into rows only (v stays in
        # lanes as the column pair) and prepend/append the edge halo pair
        # columns at the 270 grid so the whole prep is one relayout copy.
        Bq, H4, W4, _ = r.shape
        # channels of r: (u*2+v)*co + c. halo-left needs, per expanded row
        # u: [zeros(co) | x(col0, v=0, u)] = ch (u,0,c); halo-right:
        # [x(col W-1, v=1, u) | zeros(co)] = ch (u,1,c).
        rl = r[:, :, :1].reshape(Bq, H4, 1, 2, 2, co)
        hl = jnp.concatenate(
            [jnp.zeros((Bq, H4, 1, 2, 1, co), r.dtype), rl[:, :, :, :, 0:1]],
            axis=4).reshape(Bq, H4, 1, 4 * co)
        rr = r[:, :, -1:].reshape(Bq, H4, 1, 2, 2, co)
        hr = jnp.concatenate(
            [rr[:, :, :, :, 1:2], jnp.zeros((Bq, H4, 1, 2, 1, co), r.dtype)],
            axis=4).reshape(Bq, H4, 1, 4 * co)
        rh = jnp.concatenate([hl, r, hr], axis=2)  # (B, H4, W4+2, 256)
        yp = (rh.reshape(Bq, H4, W4 + 2, 2, 2 * co)
              .transpose(0, 1, 3, 2, 4)
              .reshape(Bq, 2 * H4, W4 + 2, 2 * co))  # (B, 540, 482, 128)
        a2p = jnp.tile(a_eff, (1, 2))
        c2p = jnp.tile(c_eff, (1, 2))
        r2p, sout2 = res_site(yp, a2p, c2p, _pair_d2_weights(q2["w"]),
                              jnp.tile(q2["ws"], 2),
                              jnp.tile(p["d2_b"].astype(jnp.float32), 2),
                              0.0, halo="prehalo")
        r2 = r2p.reshape(Bq, 2 * H4, W4, 2, 2 * co).reshape(
            Bq, 2 * H4, 2 * W4, 2 * co)
        m5, inv5 = _site_stats("in5", sout2, float(2 * H4 * W4), 8,
                               r2.shape[-1] // 4)
    else:
        yd = d2s(r, 2, co)                         # (B, 2H, 2W, 64) raw
        r2, sout2 = res_site(yd, a_eff, c_eff,
                             q2["w"].reshape(9, yd.shape[-1], -1), q2["ws"],
                             p["d2_b"].astype(jnp.float32), 0.0, halo="edge")
        m5, inv5 = _site_stats("in5", sout2, float(yd.shape[1] * yd.shape[2]),
                               4, r2.shape[-1] // 4)
    return r2, m5, inv5


def res_chain(y: jnp.ndarray, p: dict, quant: dict, *,
              ret_carry: bool = False, static_stats: dict | None = None):
    """The five residual blocks with all ten convs as fused int8 sites.

    y: (B, H4, W4, 128) the ACTIVATED res-chain input (post in3 apply).
    p: s2d2 param dict; quant: transformer_net_s2d2.quantize_net output
    (must contain all r{i}{a,b} sites). Matches the XLA int8 path
    (transformer_net_s2d2.apply with quant=) to bf16 rounding.

    Each block's deferred-in2 apply + residual add folds into the NEXT
    a-site's prologue (res_site_skip) — the standalone combine passes
    between kernels were 2.3-3.0 ms each at B16 (round-3 trace). With
    ret_carry=True the LAST combine is also left pending and
    ``(y4, (r2_5, a2, c2))`` is returned for the d1 site to fold
    (dec_chain); otherwise the final combine runs as one XLA pass.

    static_stats: optional frozen IN stats ({f"r{{i}}in{{1,2}}": (m, inv)},
    transformer_net_s2d2.calibrate_in_stats) — the STATIC-NORM int8 mode:
    the kernels' stats epilogues are ignored and every affine becomes a
    compile-time constant.
    """
    B, H, W0, C = y.shape
    n = float(H * W0)

    def _site_stats(site, sout):
        if static_stats is not None and site in static_stats:
            ms, invs = static_stats[site]
            return (jnp.broadcast_to(ms.astype(jnp.float32), (B, ms.shape[-1])),
                    jnp.broadcast_to(invs.astype(jnp.float32), (B, invs.shape[-1])))
        return _stats(sout, n)

    carry = None
    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa = quant[f"r{i}a"]
        qb = quant[f"r{i}b"]
        w9a = qa["w"].reshape(9, C, C)
        w9b = qb["w"].reshape(9, C, C)
        aq = jnp.full((B, C), qa["qin"], jnp.float32)
        cq = jnp.zeros((B, C), jnp.float32)
        ba = rp["conv1"]["b"].astype(jnp.float32)
        if carry is None:
            r, sout = res_site(y, aq, cq, w9a, qa["ws"], ba, -127.0)
        else:
            r2p, a2p, c2p = carry
            r, sout, y = res_site_skip(r2p, y, aq, cq, a2p, c2p, w9a,
                                       qa["ws"], ba, -127.0)
        m, inv = _site_stats(f"r{i}in1", sout)
        sc = rp["in1"]["scale"].astype(jnp.float32)
        bi = rp["in1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * qb["qin"]
        c_eff = (bi - m * inv * sc) * qb["qin"]
        r2, sout2 = res_site(r, a_eff, c_eff, w9b, qb["ws"],
                             rp["conv2"]["b"].astype(jnp.float32), 0.0)
        m2, inv2 = _site_stats(f"r{i}in2", sout2)
        sc2 = rp["in2"]["scale"].astype(jnp.float32)
        bi2 = rp["in2"]["bias"].astype(jnp.float32)
        carry = (r2, inv2 * sc2, bi2 - m2 * inv2 * sc2)
    if ret_carry:
        return y, carry
    r2, a2, c2 = carry
    return (r2.astype(jnp.float32) * a2[:, None, None, :]
            + c2[:, None, None, :]).astype(y.dtype) + y
