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

_INTERPRET = False  # flipped by tests on CPU


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
    )(stat, w5, xpad)
    return rows[..., :60]
