"""Pallas fused-site kernels for the f=2 space-to-depth Johnson net.

Each "site" replaces an [elementwise apply pass -> XLA conv] pair in
transformer_net_s2d2.apply with ONE Pallas kernel that applies the deferred
instance-norm affine (+ReLU) in its prologue while the conv runs from
VMEM-resident strips — eliminating whole HBM passes over GB-class
activations (PERF.md round-2b: the apply/pad passes are ~25 ms of the
85 ms/batch8 budget).

Design rules distilled from experiments/mk1-mk8 (measured on v5e):
- inputs arrive via auto-pipelined BlockSpecs (body strips); no manual DMA;
- all tap shifts are static slices of a flat (rows, C) view of a VMEM
  scratch; `dynamic_slice`, value concats of shifted copies, and
  cross-grid-step DMA double-buffering all crash this Mosaic;
- padded widths are multiples of 8 with interior at a fixed column offset;
  junk columns are sliced away before writes;
- per-tap dots run on M-tiles of 4·WP rows (mk5: MT sweep optimum);
- prologues are f32 (bf16 prologue measured SLOWER);
- every site must win an IN-NET A/B before adoption (the head-P lesson).

Reference math being accelerated: /root/reference/transformer_net.py:4-99
(deconv3 here), restructured per models/transformer_net_s2d2.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU



def _params():
    """Raise the per-kernel scoped-VMEM limit (default 16 MiB; v5e has 128
    MiB physical) — the tail/head sites run 17-24 MiB of blocks+stack."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_ts(hp: int) -> int | None:
    """Largest strip height ≤ 8 that divides hp (VMEM: TS=16 blocks OOM the
    16 MB scoped limit at 968×128 bf16 with double-buffered pipelining)."""
    for ts in range(8, 3, -1):
        if hp % ts == 0:
            return ts
    return None


def d3_supported(h2: int, w2: int) -> bool:
    return _pick_ts(h2 + 4) is not None and w2 % 2 == 0


def _d3_kernel(stat_ref, w_ref, body_ref, rows_ref, xs_ref, *, TS, WP, C, CO,
               W2, MT):
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    x = body_ref[0]                                   # (TS, WP, C) raw bf16
    x = jnp.maximum(x.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)
    xs_ref[0:TS] = x
    xs_ref[TS:TS + 1] = jnp.zeros((1, WP, C), jnp.bfloat16)
    x2 = xs_ref[:].reshape((TS + 1) * WP, C)
    N = TS * WP
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


def _relu_affine(x, a, c):
    """f32 deferred-IN affine + ReLU, cast back to bf16 (mk5: f32 prologue)."""
    return jnp.maximum(x.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Fused tail: d2-site -> perimeter fixup -> d3-site with in-kernel row sum.
#
# Replaces everything in transformer_net_s2d2.apply after deconv1's stats:
#   d2s -> edge pad -> in4 apply -> conv d2 -> in5 stats -> reflect halo ->
#   in5 apply -> 1x5 rows conv -> 5 shifted slice-adds -> bias
# with:
#   XLA copy (d2s + edge pad + junk-align pad, one fused pass)
#   P4  d2-site: in4 prologue -> 3x3 conv 64->128 -> interior-only in5 stats,
#       written INTO the d3 halo buffer (identity row/col indexing)
#   XLA perimeter fixup: 4 rows + 4 cols of phase-permuted reflect content
#   P5  d3-site: in5 prologue -> 1x5 conv to 60 lanes -> in-kernel 5-row
#       selection-fold -> (B, H2, W2, 16) narrow output
# so no GB-class elementwise pass survives and every Pallas boundary tensor
# is produced/consumed by layout-flexible XLA copies (PERF.md round-2b:
# partial adoption between XLA *convs* pays a relayout tax; copies do not).
#
# Reference math: /root/reference/transformer_net.py:70-99 (deconv2/deconv3
# + their instance norms), restructured per models/transformer_net_s2d2.py.
# ---------------------------------------------------------------------------


def _tail_geom(h2: int, w2: int):
    """(ho, hbuf, wp) for the fused tail, or None if unsupported.

    Requires (h2+4) % 8 == 0 (i.e. h2 = 4 mod 8 — true for 1080p/4K; pad
    the frame height otherwise) so the d2 site can build the reflect halos
    in-kernel: the bottom-halo rows and their interior sources then always
    share one 8-row strip (locals 3..7). ho: P5's 8-aligned output row
    count (>= h2, junk tail rows sliced by the caller). hbuf: the halo
    buffer height ho+8 (8-row-aligned for P4's grid; rows [h2+4, hbuf) are
    junk). wp: padded width, multiple of 8 >= w2+4.
    """
    if h2 < 20 or w2 < 16 or (h2 + 4) % 8 or w2 % 8:
        return None
    ho = h2 + 4
    hbuf = ho + 8
    wp = ((w2 + 4 + 7) // 8) * 8
    return ho, hbuf, wp


def tail_supported(h2: int, w2: int) -> bool:
    return _tail_geom(h2, w2) is not None


def _d2_kernel(stat_ref, w_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
               xs_ref, *, WP, H2, W2, JB):
    """P4: in4 prologue -> 3x3 conv 64->128 -> in-kernel reflect halos ->
    interior-masked in5 stats. Strip height 8.

    Instance (b, j) writes halo-buffer rows [8j, 8j+8); conv-out row k sits
    at buffer row k+2 (identity indexing vs the input buffer, which has two
    junk rows on top). The d3 reflect halo is a channel-phase mix of
    adjacent interior rows/cols (transformer_net_s2d2._pad_reflect_f2_4px);
    since h2 = 4 mod 8, halo rows 0,1 live in strip j=0 (sources locals
    2..4) and rows h2+2, h2+3 in strip JB at locals 6,7 (sources locals
    3..5), so every halo is a lane-select over rows/cols this instance
    already computed — no XLA fixup pass exists.
    """
    from jax.experimental import pallas as pl

    TS = 8
    j = pl.program_id(1)
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    xb = _relu_affine(body_ref[0], a, c)              # (TS, WP, 64)
    xt = _relu_affine(tail_ref[0], a, c)              # (2, WP, 64)
    xs_ref[0 : TS * WP] = xb.reshape(TS * WP, 64)
    xs_ref[TS * WP : (TS + 2) * WP] = xt.reshape(2 * WP, 64)
    xs_ref[(TS + 2) * WP : (TS + 3) * WP] = jnp.zeros((WP, 64), jnp.bfloat16)
    N = TS * WP
    MT = 2 * WP
    cb = cb_ref[0, :].astype(jnp.float32)
    # stream per-tile (2-row) writes + streamed stats: each M-tile covers
    # exactly rows [2t, 2t+2), so the interior-row exclusion (conv-out row
    # k = 8j + r - 2 in [0, H2)) is all-or-nothing per tile — a scalar
    # select, no masked full-tile multiply, no parts concat (the full-tile
    # f32 wheres of the first version pushed the Mosaic stack to 36 MB).
    s1 = jnp.zeros((128,), jnp.float32)
    s2 = jnp.zeros((128,), jnp.float32)
    for t in range(N // MT):
        r0 = t * MT
        acc = None
        for dy in range(3):
            for dx in range(3):
                s = r0 + dy * WP + dx
                p = jnp.dot(xs_ref[s : s + MT, :], w_ref[dy * 3 + dx],
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        acc = acc + cb
        y_ref[0, 2 * t : 2 * t + 2] = acc.reshape(2, WP, 128).astype(
            jnp.bfloat16)
        if t == 0:
            excl = (j == 0) | (j > JB)
        elif t == N // MT - 1:
            excl = (j >= JB)
        else:
            excl = j > JB
        ai = acc.reshape(2, WP, 128)[:, 2 : W2 + 2, :]
        s1 = s1 + jnp.where(excl, 0.0, jnp.sum(ai, axis=(0, 1)))
        s2 = s2 + jnp.where(excl, 0.0, jnp.sum(ai * ai, axis=(0, 1)))

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(j > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2

    # in-kernel reflect halos: a halo element keeps its channel index and
    # selects its source row/col by its row phase u = lane//64 (rows) or
    # col phase v = lane&32 (cols). Row halos are whole-row rewrites on the
    # two boundary strips; col halos rewrite small aligned 8/16-col windows
    # read back from the just-written block (bf16 copies — identical to the
    # XLA pad, which also copies the bf16 conv output).
    # masks are built at full operand shape with 2-D iotas — broadcasting a
    # 1-D i1 mask into a 2-D where is an unsupported relayout in this Mosaic.
    um_w = jax.lax.broadcasted_iota(jnp.int32, (WP, 128), 1) < 64  # u == 0
    vm_t = (jax.lax.broadcasted_iota(jnp.int32, (TS, 128), 1) & 32) == 0

    @pl.when(j == 0)
    def _():
        r4 = y_ref[0, 4]
        r3 = y_ref[0, 3]
        r2 = y_ref[0, 2]
        y_ref[0, 0] = jnp.where(um_w, r4, r3)         # buffer row 0
        y_ref[0, 1] = jnp.where(um_w, r3, r2)         # buffer row 1

    @pl.when(j == JB)
    def _():
        r5 = y_ref[0, 5]
        r4 = y_ref[0, 4]
        r3 = y_ref[0, 3]
        y_ref[0, 6] = jnp.where(um_w, r5, r4)         # buffer row H2+2
        y_ref[0, 7] = jnp.where(um_w, r4, r3)         # buffer row H2+3

    ci8 = jax.lax.broadcasted_iota(jnp.int32, (TS, 8, 128), 1)
    left8 = y_ref[0, :, 0:8]                          # (TS, 8, 128)
    cm2 = jnp.where(vm_t, left8[:, 4], left8[:, 3])   # buffer col 0
    cm1 = jnp.where(vm_t, left8[:, 3], left8[:, 2])   # buffer col 1
    left8 = jnp.where(ci8 == 0, cm2[:, None], left8)
    left8 = jnp.where(ci8 == 1, cm1[:, None], left8)
    y_ref[0, :, 0:8] = left8
    ci16 = jax.lax.broadcasted_iota(jnp.int32, (TS, 16, 128), 1)
    r16 = y_ref[0, :, W2 - 8 : W2 + 8]                # cols W2-8 .. W2+8
    cp1 = jnp.where(vm_t, r16[:, 9], r16[:, 8])       # buffer col W2+2
    cp2 = jnp.where(vm_t, r16[:, 8], r16[:, 7])       # buffer col W2+3
    r16 = jnp.where(ci16 == 10, cp1[:, None], r16)
    r16 = jnp.where(ci16 == 11, cp2[:, None], r16)
    y_ref[0, :, W2 - 8 : W2 + 8] = r16


def _d2_site(x4: jnp.ndarray, a4: jnp.ndarray, c4: jnp.ndarray,
             w9: jnp.ndarray, cb: jnp.ndarray, *, h2: int, w2: int,
             hbuf: int, wp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x4.shape[0]
    NS = hbuf // 8
    jb = (h2 + 2) // 8
    stat = jnp.stack([a4, c4], axis=1)                # (B, 2, 64)
    kern = functools.partial(_d2_kernel, WP=wp, H2=h2, W2=w2, JB=jb)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, 64), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 64, 128), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, wp, 64), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, wp, 64), lambda b, j: (b, 4 * j + 4, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, wp, 128), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, hbuf, wp, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((11 * wp, 64), jnp.bfloat16)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w9, cb, x4, x4)


def _d3s_kernel(stat_ref, w_ref, sel_ref, b_ref, body_ref, tail_ref, out_ref,
                xs_ref, rc_ref, *, WP, W2):
    """P5: in5 prologue -> 1x5 conv to 60 lanes (rc) -> 5-row selection-fold.

    Strip height 8: instance (b, j) emits output rows [8j, 8j+8); output row
    i reads halo-buffer rows [i, i+5) (interior row i sits at buffer row
    i+2, 5-tap conv centered). rc rows live in a bf16 scratch (same
    precision as the XLA form's materialized `rows`); the dy-fold is a 0/1
    selection matmul, exact per element.
    """
    TS = 8
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    xb = _relu_affine(body_ref[0], a, c)              # (TS, WP, 128)
    xt = _relu_affine(tail_ref[0], a, c)              # (4, WP, 128)
    xs_ref[0 : TS * WP] = xb.reshape(TS * WP, 128)
    xs_ref[TS * WP : (TS + 4) * WP] = xt.reshape(4 * WP, 128)
    xs_ref[(TS + 4) * WP : (TS + 5) * WP] = jnp.zeros((WP, 128), jnp.bfloat16)
    MT = 2 * WP
    NR = (TS + 4) * WP
    for t in range(NR // MT):
        r0 = t * MT
        acc = None
        for dx in range(5):
            p = jnp.dot(xs_ref[r0 + dx : r0 + dx + MT, :], w_ref[dx],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        rc_ref[r0 : r0 + MT] = acc.astype(jnp.bfloat16)
    NO = TS * WP
    b16 = b_ref[0, :].astype(jnp.float32)
    for t in range(NO // MT):
        m0 = t * MT
        acc = None
        for dy in range(5):
            s = m0 + dy * WP
            p = jnp.dot(rc_ref[s : s + MT], sel_ref[dy],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        acc = acc + b16
        out_ref[0, 2 * t : 2 * t + 2] = acc.reshape(2, WP, 16)[:, 0:W2, :] \
            .astype(jnp.bfloat16)


def _d3_sum_site(y5: jnp.ndarray, a5: jnp.ndarray, c5: jnp.ndarray,
                 w_row: jnp.ndarray, b12: jnp.ndarray, *, ho: int,
                 w2: int, wp: int) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = y5.shape[0]
    NS = ho // 8
    stat = jnp.stack([a5, c5], axis=1)                # (B, 2, 128)
    w5 = jnp.pad(w_row[0].astype(jnp.bfloat16), ((0, 0), (0, 0), (0, 4)))
    sel = np.zeros((5, 64, 16), np.float32)
    for dy in range(5):
        for ch in range(12):
            sel[dy, dy * 12 + ch, ch] = 1.0
    sel = jnp.asarray(sel, jnp.bfloat16)
    b16 = jnp.pad(b12.astype(jnp.float32), (0, 4))[None, :]
    kern = functools.partial(_d3s_kernel, WP=wp, W2=w2)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 128, 64), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 64, 16), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, wp, 128), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, wp, 128), lambda b, j: (b, 2 * j + 2, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, w2, 16), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ho, w2, 16), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((13 * wp, 128), jnp.bfloat16),
            pltpu.VMEM((12 * wp, 64), jnp.bfloat16),
        ],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w5, sel, b16, y5, y5)


def tail(y_d1_raw: jnp.ndarray, m4: jnp.ndarray, inv4: jnp.ndarray,
         in4: dict, d2_w: jnp.ndarray, d2_b: jnp.ndarray, in5: dict,
         d3_w_row: jnp.ndarray, d3_b: jnp.ndarray, *, tap=None) -> jnp.ndarray:
    """Fused deconv2+deconv3 tail. y_d1_raw: (B, H4, W4, 256) raw deconv1
    conv output (pre in4 apply, pre d2s). Returns (B, H2, W2, 12) —
    the pre-d2s stylized block tensor with deconv3's bias applied.

    Matches transformer_net_s2d2.apply's XLA tail up to bf16 reassociation.
    """
    from .transformer_net_s2d import _pad_edge_blocks, d2s

    if tap is None:
        tap = lambda name, t: None  # noqa: E731
    B, h4, w4, _ = y_d1_raw.shape
    h2, w2 = 2 * h4, 2 * w4
    ho, hbuf, wp = _tail_geom(h2, w2)

    sc4 = in4["scale"].astype(jnp.float32)
    bi4 = in4["bias"].astype(jnp.float32)
    a4 = inv4 * sc4                                   # (B, 64)
    c4 = bi4 - m4 * inv4 * sc4

    x = d2s(y_d1_raw, 2, 64)                          # (B, H2, W2, 64) raw
    tap("d2", x)
    x = _pad_edge_blocks(x)                           # (B, H2+2, W2+2, 64)
    x4 = jnp.pad(x, ((0, 0), (2, hbuf - h2 - 2), (2, wp - (w2 + 2) - 2),
                     (0, 0)))                         # (B, hbuf+2, wp, 64)

    w9 = d2_w.astype(jnp.bfloat16).reshape(9, 64, 128)
    cb = d2_b.astype(jnp.float32)[None, :]
    y5, sout = _d2_site(x4, a4, c4, w9, cb, h2=h2, w2=w2, hbuf=hbuf, wp=wp)
    tap("d3", y5[:, 2 : 2 + h2, 2 : 2 + w2])

    n = float(h2 * w2 * 4)
    s1 = jnp.sum(sout[:, 0].reshape(B, 4, 32), axis=1)
    s2 = jnp.sum(sout[:, 1].reshape(B, 4, 32), axis=1)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv5 = jax.lax.rsqrt(var + 1e-5)
    sc5 = in5["scale"].astype(jnp.float32)
    bi5 = in5["bias"].astype(jnp.float32)
    a5 = jnp.tile(inv5 * sc5, (1, 4))                 # (B, 128)
    c5 = jnp.tile(bi5 - mean * inv5 * sc5, (1, 4))

    out16 = _d3_sum_site(y5, a5, c5, d3_w_row, d3_b[:12], ho=ho, w2=w2,
                         wp=wp)
    return out16[:, :h2, :, :12].astype(y_d1_raw.dtype)


# ---------------------------------------------------------------------------
# Fused head: c2-site (reads conv1's raw output in place) -> XLA border
# fixup -> one XLA s2d copy -> c3-site as a 2x2 block conv (K=256).
#
# Replaces, in transformer_net_s2d2.apply:
#   in1 halo+apply pass (1 GB-class) -> conv c2 -> in2 stats -> reflect pad
#   + in2 apply pass -> strided conv c3 (XLA strided convs run ~31 TF/s)
# with:
#   P2 c2-site: in1 prologue -> 2x2 block conv 128->64; the stride-2 halo
#      (top/left, phase-permuted) is NOT materialized: the kernel reads the
#      raw conv1 tensor directly via a clamped head-row BlockSpec, its
#      first-row/first-col outputs are garbage, and a thin XLA strip fixup
#      recomputes them (2-row / 2-col strips) and completes the in2 stats.
#   XLA copy: s2d to the 270 grid + stride-2 halo + junk-col pad, one pass.
#   P3 c3-site: in2 prologue -> 2x2 block conv 256->128 (the 3x3 stride-2
#      pixel conv in f2-of-540p form -> full-K MXU instead of XLA's strided
#      conv path) -> in3 stats.
# Reference math: /root/reference/transformer_net.py:52-60 (conv2/conv3 +
# norms), restructured per models/transformer_net_s2d2.py.
# ---------------------------------------------------------------------------


def _head_geom(h2: int, w2: int):
    """(ts_c2, ts_c3) or None. c2 strips tile h2; c3 strips tile h4 = h2/2."""
    if h2 < 24 or w2 < 16 or h2 % 4 or w2 % 8 or (w2 // 2) % 8:
        return None
    h4 = h2 // 2
    ts2 = next((t for t in (12, 8, 4) if h2 % t == 0), None)
    ts3 = next((t for t in (10, 6, 2) if h4 % t == 0), None)
    if ts2 is None or ts3 is None:
        return None
    if w2 > 1000:
        ts2 = min(ts2, 4)
        ts3 = min(ts3, 2)
    return ts2, ts3


def head_supported(h2: int, w2: int) -> bool:
    return _head_geom(h2, w2) is not None


def _c2_kernel(stat_ref, w_ref, cb_ref, head_ref, body_ref, y_ref, sout_ref,
               xs_ref, *, TS, W2, NS):
    """P2: in1 prologue -> 2x2 block conv 128->64 on the raw conv1 tensor.

    Out row i, col c reads input rows/cols (i-1+a, c-1+b); the head spec
    supplies row TS*j-1 (clamped to 0 at j=0). Row-0 and col-0 outputs are
    garbage (they need the phase-permuted halo) — excluded from the stats
    and overwritten by the XLA strip fixup.
    """
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    xh = _relu_affine(head_ref[0], a, c)              # (1, W2, 128)
    xb = _relu_affine(body_ref[0], a, c)              # (TS, W2, 128)
    xs_ref[0:W2] = jnp.zeros((W2, 128), jnp.bfloat16)
    xs_ref[W2 : 2 * W2] = xh.reshape(W2, 128)
    xs_ref[2 * W2 : (TS + 2) * W2] = xb.reshape(TS * W2, 128)
    xs_ref[(TS + 2) * W2 : (TS + 3) * W2] = jnp.zeros((W2, 128), jnp.bfloat16)
    N = TS * W2
    MT = 2 * W2
    cb = cb_ref[0, :].astype(jnp.float32)
    s1 = jnp.zeros((64,), jnp.float32)
    s2 = jnp.zeros((64,), jnp.float32)
    for t in range(N // MT):
        m0 = t * MT
        acc = None
        for ab in range(4):
            aa, bb = divmod(ab, 2)
            s = m0 + (aa + 1) * W2 + (bb - 1)
            p = jnp.dot(xs_ref[s : s + MT, :], w_ref[ab],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        acc = acc + cb
        a2 = acc.reshape(2, W2, 64)
        y_ref[0, 2 * t : 2 * t + 2] = a2.astype(jnp.bfloat16)
        # stats: garbage col 0 always excluded; garbage row 0 (j==0, t==0).
        ai = a2[:, 1:W2, :]
        st1 = jnp.sum(ai, axis=(0, 1))
        st2 = jnp.sum(ai * ai, axis=(0, 1))
        if t == 0:
            r0 = a2[0, 1:W2, :]
            st1 = st1 - jnp.where(j == 0, jnp.sum(r0, axis=0), 0.0)
            st2 = st2 - jnp.where(j == 0, jnp.sum(r0 * r0, axis=0), 0.0)
        s1 = s1 + st1
        s2 = s2 + st2

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(j > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2


def _c2_site(raw1: jnp.ndarray, a1: jnp.ndarray, c1: jnp.ndarray,
             w22: jnp.ndarray, cb: jnp.ndarray, *, ts2: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, h2, w2, _ = raw1.shape
    NS = h2 // ts2
    stat = jnp.stack([a1, c1], axis=1)                # (B, 2, 128)
    kern = functools.partial(_c2_kernel, TS=ts2, W2=w2, NS=NS)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, 128), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128, 64), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w2, 128),
                         lambda b, j: (b, jnp.maximum(ts2 * j - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts2, w2, 128), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ts2, w2, 64), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 64), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h2, w2, 64), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, 64), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM(((ts2 + 3) * w2, 128), jnp.bfloat16)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w22, cb, raw1, raw1)


def _c2_fixup(y2, sout, raw1, m1, inv1, in1, c2_w, c2_b):
    """Recompute row-0 / col-0 outputs from thin halo'd strips of raw1 and
    fold their sums into the in2 stats. Returns (y2, m2, inv2)."""
    from ..ops.conv import conv2d
    from .transformer_net_s2d import _apply_in_relu, _pad_stride2_halo

    B, h2, w2, _ = raw1.shape
    w22 = c2_w.reshape(2, 2, 128, 64) if c2_w.ndim == 3 else c2_w

    rs = _pad_stride2_halo(raw1[:, 0:2], 32)          # (B, 3, W2+1, 128)
    rs = _apply_in_relu(rs, m1, inv1, in1["scale"], in1["bias"], 4)
    row = conv2d(rs, w22, c2_b)[:, 0:1]               # (B, 1, W2, 64)

    cs = _pad_stride2_halo(raw1[:, :, 0:2], 32)       # (B, H2+1, 3, 128)
    cs = _apply_in_relu(cs, m1, inv1, in1["scale"], in1["bias"], 4)
    col = conv2d(cs, w22, c2_b)[:, :, 0:1]            # (B, H2, 1, 64)

    y2 = y2.at[:, 0:1].set(row.astype(y2.dtype))
    y2 = y2.at[:, :, 0:1].set(col.astype(y2.dtype))

    rowf = row.astype(jnp.float32)
    colf = col[:, 1:].astype(jnp.float32)             # row 0 counted above
    s1 = sout[:, 0] + jnp.sum(rowf, axis=(1, 2)) + jnp.sum(colf, axis=(1, 2))
    s2 = (sout[:, 1] + jnp.sum(rowf * rowf, axis=(1, 2))
          + jnp.sum(colf * colf, axis=(1, 2)))
    n = float(h2 * w2)
    mean = s1 / n
    var = s2 / n - mean * mean
    inv = jax.lax.rsqrt(var + 1e-5)
    return y2, mean, inv


def _c3_kernel(stat_ref, w_ref, cb_ref, body_ref, tail_ref, y_ref, sout_ref,
               xs_ref, *, TS, WP, W4):
    """P3: in2 prologue -> 2x2 block conv 256->128 on the halo'd s2d tensor."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    a = stat_ref[0, 0, :]
    c = stat_ref[0, 1, :]
    xb = _relu_affine(body_ref[0], a, c)              # (TS, WP, 256)
    xt = _relu_affine(tail_ref[0], a, c)              # (1, WP, 256)
    xs_ref[0 : TS * WP] = xb.reshape(TS * WP, 256)
    xs_ref[TS * WP : (TS + 1) * WP] = xt.reshape(WP, 256)
    xs_ref[(TS + 1) * WP : (TS + 2) * WP] = jnp.zeros((WP, 256), jnp.bfloat16)
    N = TS * WP
    MT = 2 * WP
    cb = cb_ref[0, :].astype(jnp.float32)
    s1 = jnp.zeros((128,), jnp.float32)
    s2 = jnp.zeros((128,), jnp.float32)
    for t in range(N // MT):
        m0 = t * MT
        acc = None
        for ab in range(4):
            aa, bb = divmod(ab, 2)
            s = m0 + aa * WP + bb
            p = jnp.dot(xs_ref[s : s + MT, :], w_ref[ab],
                        preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        acc = acc + cb
        ai = acc.reshape(2, WP, 128)[:, 0:W4, :]
        y_ref[0, 2 * t : 2 * t + 2] = ai.astype(jnp.bfloat16)
        s1 = s1 + jnp.sum(ai, axis=(0, 1))
        s2 = s2 + jnp.sum(ai * ai, axis=(0, 1))

    @pl.when(j == 0)
    def _():
        sout_ref[0, 0, :] = s1
        sout_ref[0, 1, :] = s2

    @pl.when(j > 0)
    def _():
        sout_ref[0, 0, :] = sout_ref[0, 0, :] + s1
        sout_ref[0, 1, :] = sout_ref[0, 1, :] + s2


def _c3_site(x3: jnp.ndarray, a2: jnp.ndarray, c2v: jnp.ndarray,
             w4: jnp.ndarray, cb: jnp.ndarray, *, ts3: int, h4: int,
             w4dim: int, wp: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x3.shape[0]
    NS = h4 // ts3
    stat = jnp.stack([a2, c2v], axis=1)               # (B, 2, 256)
    kern = functools.partial(_c3_kernel, TS=ts3, WP=wp, W4=w4dim)
    return pl.pallas_call(
        kern,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec((1, 2, 256), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 256, 128), lambda b, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts3, wp, 256), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wp, 256), lambda b, j: (b, ts3 * (j + 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ts3, w4dim, 128), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, h4, w4dim, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, 2, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM(((ts3 + 2) * wp, 256), jnp.bfloat16)],
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w4, cb, x3, x3)


def head(raw1: jnp.ndarray, m1: jnp.ndarray, inv1: jnp.ndarray, in1: dict,
         c2_w: jnp.ndarray, c2_b: jnp.ndarray, in2: dict,
         c3_wb: jnp.ndarray, c3_b: jnp.ndarray, *, tap=None):
    """Fused c2+c3 chain. raw1: (B, H2, W2, 128) raw conv1 output (pre in1
    apply). c3_wb: the 2x2 block form of conv3 ([2,2,256,128], see
    transformer_net_s2d._scatter_stride2_s2d2). Returns (raw3, m3, inv3):
    the raw c3 output on the 270 grid plus its in3 stats.

    Matches transformer_net_s2d2.apply's XLA c2/c3 segment up to bf16
    reassociation.
    """
    from .transformer_net_s2d import _pad_stride2_halo, s2d

    if tap is None:
        tap = lambda name, t: None  # noqa: E731
    B, h2, w2, _ = raw1.shape
    ts2, ts3 = _head_geom(h2, w2)
    h4, w4dim = h2 // 2, w2 // 2
    wp = ((w4dim + 1 + 7) // 8) * 8

    sc1 = in1["scale"].astype(jnp.float32)
    bi1 = in1["bias"].astype(jnp.float32)
    a1 = jnp.tile(inv1 * sc1, (1, 4))                 # (B, 128)
    c1 = jnp.tile(bi1 - m1 * inv1 * sc1, (1, 4))

    tap("c2", raw1)
    w22 = c2_w.astype(jnp.bfloat16).reshape(4, 128, 64)
    cb2 = c2_b.astype(jnp.float32)[None, :]
    y2, sout2 = _c2_site(raw1, a1, c1, w22, cb2, ts2=ts2)
    y2, m2, inv2 = _c2_fixup(y2, sout2, raw1, m1, inv1, in1, c2_w, c2_b)

    tap("c3", y2)
    x3 = _pad_stride2_halo(s2d(y2, 2), 64)            # (B, H4+1, W4+1, 256)
    x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, wp - (w4dim + 1)), (0, 0)))

    sc2 = in2["scale"].astype(jnp.float32)
    bi2 = in2["bias"].astype(jnp.float32)
    a2 = jnp.tile(inv2 * sc2, (1, 4))                 # (B, 256)
    c2v = jnp.tile(bi2 - m2 * inv2 * sc2, (1, 4))

    w4 = c3_wb.astype(jnp.bfloat16).reshape(4, 256, 128)
    cb3 = c3_b.astype(jnp.float32)[None, :]
    raw3, sout3 = _c3_site(x3, a2, c2v, w4, cb3, ts3=ts3, h4=h4,
                           w4dim=w4dim, wp=wp)
    raw3 = raw3.astype(raw1.dtype)
    n = float(h4 * w4dim)
    mean3 = sout3[:, 0] / n
    var3 = sout3[:, 1] / n - mean3 * mean3
    inv3 = jax.lax.rsqrt(var3 + 1e-5)
    return raw3, mean3, inv3


def d3_rows(x_raw: jnp.ndarray, a: jnp.ndarray, c: jnp.ndarray,
            w_row: jnp.ndarray, pad_fn) -> jnp.ndarray:
    """Fused deconv3 'rows' stage.

    x_raw: (B, H2, W2, 128) RAW d2 output (pre instance-norm apply).
    a, c:  (B, 128) f32 deferred-IN affine (phase-invariant per logical ch).
    w_row: (1, 5, 128, 60) tap-packed kernel (transformer_net_s2d2.d3_w).
    pad_fn: the XLA phase-reflect pad (raw halo build; replaces today's
            pad+apply pass at identical traffic).
    Returns rows (B, H2+4, W2, 60) bf16 == conv2d(apply(pad(x)), w_row).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H2, W2, C = x_raw.shape
    HP = H2 + 4
    TS = _pick_ts(HP)
    WP = ((W2 + 4 + 7) // 8) * 8
    NS = HP // TS
    CO = 64

    xp = pad_fn(x_raw)                               # (B, HP, W2+4, C) raw
    xpad = jnp.pad(xp, ((0, 0), (0, 0), (0, WP - (W2 + 4)), (0, 0)))
    stat = jnp.stack([a, c], axis=1)                 # (B, 2, C)
    w5 = jnp.pad(w_row[0].astype(jnp.bfloat16), ((0, 0), (0, 0), (0, 4)))

    kern = functools.partial(_d3_kernel, TS=TS, WP=WP, C=C, CO=CO, W2=W2,
                             MT=2 * WP)
    rows = pl.pallas_call(
        kern,
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
        interpret=_INTERPRET,
        compiler_params=None if _INTERPRET else _params(),
    )(stat, w5, xpad)
    return rows[..., :60]
