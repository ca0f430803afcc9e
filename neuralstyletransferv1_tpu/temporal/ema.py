"""Temporal-coherence stages as in-graph scans.

The reference runs three recurrences per frame, on host, in sequence
(reference: pipeline.py:1884-1940 flow EMA, 1942-1978 LAB EMA,
2072-2092 motion-adaptive blend). Frame t depends on t-1, so the stylizer
batch axis can't be a pure map — here the whole chain is a single
``lax.scan`` over the batch's time axis, fused into one XLA program. Across
chips, each shard scans its chunk and the boundary frame travels over the ICI
ring (parallel.mesh.temporal_halo_exchange).

Constants mirror the reference (pipeline.py:1074-1077): MOTION_NORM=8px,
MIN_ALPHA=0.40, GAUSS_SIGMA=3.0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.blur import gaussian_blur
from ..ops.color import lab_u8_to_rgb, rgb_to_lab_u8
from ..ops.warp import warp_flow, warp_flow_packed_u8

MOTION_NORM = 8.0
MIN_ALPHA = 0.40
GAUSS_SIGMA = 3.0


def flow_ema_fuse(
    curr_styled01: jnp.ndarray,
    prev_styled01: jnp.ndarray,
    flow: jnp.ndarray,
    alpha: float,
) -> jnp.ndarray:
    """a*curr + (1-a)*warp(prev, flow), clipped (reference: pipeline.py:1925-1929)."""
    prev_warp = warp_flow(prev_styled01, flow, border="replicate")
    a = jnp.clip(alpha, 0.0, 1.0)
    return jnp.clip(a * curr_styled01 + (1.0 - a) * prev_warp, 0.0, 1.0)


def lab_ema_step(
    rgb01: jnp.ndarray,
    prev_lab: jnp.ndarray | None,
    *,
    smooth_alpha: float = 0.7,
    chroma_alpha: float = 0.85,
    smooth_lightness: bool = True,
    smooth_chroma: bool = False,
):
    """One LAB EMA step on an HWC frame; returns (rgb01_out, new_prev_lab).

    EMA runs on PIL-convention LAB byte planes (reference:
    pipeline.py:1944-1978): L_sm = a*L + (1-a)*prev; prev ← L_sm.
    """
    lab = rgb_to_lab_u8(rgb01)
    if prev_lab is None:
        prev_lab = lab
    a_l = smooth_alpha if smooth_lightness else 1.0
    a_c = chroma_alpha if smooth_chroma else 1.0
    alphas = jnp.array([a_l, a_c, a_c], jnp.float32)
    sm = alphas * lab + (1.0 - alphas) * prev_lab
    out = lab_u8_to_rgb(jnp.clip(sm, 0.0, 255.0))
    return out, sm


def motion_adaptive_blend(
    styled01: jnp.ndarray,
    orig01: jnp.ndarray,
    flow: jnp.ndarray,
    blend: float,
) -> jnp.ndarray:
    """Per-pixel blend by flow magnitude (reference: pipeline.py:2072-2086).

    alpha = blend − (blend − 0.40)·blur(clip(|flow|/8, 0, 1), σ=3).
    """
    mag = jnp.sqrt(flow[..., 0] ** 2 + flow[..., 1] ** 2)
    m = jnp.clip(mag / MOTION_NORM, 0.0, 1.0)
    m = gaussian_blur(m, GAUSS_SIGMA)
    alpha = blend - (blend - MIN_ALPHA) * m
    alpha = alpha[..., None]
    return jnp.clip(alpha * styled01 + (1.0 - alpha) * orig01, 0.0, 1.0)


def uniform_blend(styled01: jnp.ndarray, orig01: jnp.ndarray, blend: float) -> jnp.ndarray:
    """Global style/original blend (reference: pipeline.py:2089-2092)."""
    if 0.0 <= blend < 1.0:
        return jnp.clip(blend * styled01 + (1.0 - blend) * orig01, 0.0, 1.0)
    return styled01


class TemporalState(NamedTuple):
    """Carry for the temporal scan (reference caches at pipeline.py:1064-1071)."""

    prev_styled01: jnp.ndarray  # pre-LAB stylized frame t-1, HWC
    prev_lab: jnp.ndarray  # smoothed LAB planes, HWC(3)


def temporal_postprocess_scan(
    styled01: jnp.ndarray,
    orig01: jnp.ndarray,
    flows: jnp.ndarray | None,
    *,
    flow_ema: bool = False,
    flow_alpha: float = 0.6,
    smooth_lightness: bool = True,
    smooth_chroma: bool = False,
    smooth_alpha: float = 0.7,
    chroma_alpha: float = 0.85,
    motion_blend: bool = False,
    blend: float = 1.0,
    init: TemporalState | None = None,
    mask_alphas: jnp.ndarray | None = None,
    mask_has: jnp.ndarray | None = None,
    composite_keep: bool = True,
    warmup: jnp.ndarray | bool | None = None,
    split: bool = True,
    fast_warp: bool = True,
) -> tuple[jnp.ndarray, TemporalState]:
    """Run the full per-frame temporal chain over a THWC batch in one scan.

    flows[t] is the dense flow from frame t-1 → t (flows[0] is ignored for
    the first frame when ``init`` is None, matching the reference's warm-up
    behavior). Returns (output THWC, final state for the next chunk).

    ``mask_alphas`` [T,H,W,1] + ``mask_has`` [T] enable the per-frame mask
    composite between the LAB EMA and the final blend — the reference's
    ordering (pipeline.py:1982-2048 then 2072-2092); a masked frame always
    takes the uniform blend, never the motion-adaptive one
    (reference: pipeline.py:2074 ``not mask_used``). ``composite_keep``:
    keep = stylize masked region, replace = stylize unmasked
    (reference: pipeline.py:2040-2043).

    ``split`` (default True) runs the mathematically identical split form
    (_temporal_postprocess_split): only the two true recurrences stay
    sequential, everything elementwise in t runs batched over T.
    ``fast_warp`` (default True) uses the u8-corner i32-packed warp
    (ops.warp.warp_flow_packed_u8) in the flow-EMA step — 3.5x the exact
    warp's speed (PERF.md mk39/mk46) with a bounded quality cost: exact
    coords away from the right/bottom source edges (0.1% pre-clamp blend
    there) and u8 corner quantization (<=2e-3 max, ~6e-4 mean on [0,1]
    pixels; contract pinned in tests/test_warp.py, long-sequence
    accumulation bounded in tests/test_temporal_split.py).
    Pass ``fast_warp=False`` (engine: ``--exact_warp``) for bit-parity
    with the per-frame/reference path.
    """
    T = styled01.shape[0]
    use_lab = smooth_lightness or smooth_chroma
    use_mask = mask_alphas is not None

    if flows is None:
        flows = jnp.zeros(styled01.shape[:3] + (2,), jnp.float32)
    if not use_mask:
        mask_alphas = jnp.zeros((T, 1, 1, 1), jnp.float32)
        mask_has = jnp.zeros((T,), bool)

    if split:
        return _temporal_postprocess_split(
            styled01, orig01, flows,
            flow_ema=flow_ema, flow_alpha=flow_alpha,
            smooth_lightness=smooth_lightness, smooth_chroma=smooth_chroma,
            smooth_alpha=smooth_alpha, chroma_alpha=chroma_alpha,
            motion_blend=motion_blend, blend=blend, init=init,
            mask_alphas=mask_alphas, mask_has=mask_has,
            composite_keep=composite_keep, warmup=warmup,
            use_lab=use_lab, use_mask=use_mask, fast_warp=fast_warp)

    # ``warmup``: frame 0 has no real predecessor — skip its flow fusion and
    # seed the LAB EMA from itself. Defaults from ``init`` presence; pass a
    # traced bool to decide per shard inside shard_map (the chunked ICI
    # temporal stage: only shard 0 of the first batch warms up).
    if init is None:
        init_state = TemporalState(styled01[0], rgb_to_lab_u8(styled01[0]))
        first_is_warmup = True if warmup is None else warmup
    else:
        init_state = init
        first_is_warmup = False if warmup is None else warmup

    ts = jnp.arange(T)

    # Motion-adaptive blend alphas depend ONLY on the flows — hoist them out
    # of the sequential scan so the |flow| maps and the sigma-3 blur run
    # batched over T (one fused NHWC pass) instead of per scan step.
    # Bitwise-identical to calling motion_adaptive_blend inside the step:
    # gaussian_blur's NHWC path is the same depthwise conv the HW path
    # wraps, applied per batch element.
    if motion_blend:
        mag = jnp.sqrt(flows[..., 0] ** 2 + flows[..., 1] ** 2)  # [T,H,W]
        m = gaussian_blur(
            jnp.clip(mag / MOTION_NORM, 0.0, 1.0)[..., None], GAUSS_SIGMA)
        motion_alphas = blend - (blend - MIN_ALPHA) * m          # [T,H,W,1]
    else:
        motion_alphas = jnp.zeros((T, 1, 1, 1), jnp.float32)

    def step(state: TemporalState, inp):
        t, curr, orig, flow, alpha, has_mask, m_alpha = inp
        out = curr
        if flow_ema:
            fused = flow_ema_fuse(curr, state.prev_styled01, flow, flow_alpha)
            # Frame 0 of a fresh video has no predecessor: keep it unfused.
            skip = jnp.logical_and(t == 0, first_is_warmup)
            out = jnp.where(skip, curr, fused)
        new_prev_styled = out
        if use_lab:
            lab = rgb_to_lab_u8(out)
            a_l = smooth_alpha if smooth_lightness else 1.0
            a_c = chroma_alpha if smooth_chroma else 1.0
            alphas = jnp.array([a_l, a_c, a_c], jnp.float32)
            prev_lab = jnp.where(
                jnp.logical_and(t == 0, first_is_warmup), lab, state.prev_lab
            )
            sm = alphas * lab + (1.0 - alphas) * prev_lab
            out = lab_u8_to_rgb(jnp.clip(sm, 0.0, 255.0))
            new_lab = sm
        else:
            new_lab = state.prev_lab
        if use_mask:
            comp = (out * alpha + orig * (1.0 - alpha)) if composite_keep \
                else (orig * alpha + out * (1.0 - alpha))
            out = jnp.where(has_mask, comp, out)
        if motion_blend:
            blended = jnp.clip(m_alpha * out + (1.0 - m_alpha) * orig,
                               0.0, 1.0)
            skip = jnp.logical_and(t == 0, first_is_warmup)
            if use_mask:
                skip = jnp.logical_or(skip, has_mask)
            out = jnp.where(skip, uniform_blend(out, orig, blend), blended)
        else:
            out = uniform_blend(out, orig, blend)
        return TemporalState(new_prev_styled, new_lab), out

    final_state, outs = jax.lax.scan(
        step, init_state,
        (ts, styled01, orig01, flows, mask_alphas, mask_has, motion_alphas)
    )
    return outs, final_state


def _temporal_postprocess_split(
    styled01, orig01, flows, *,
    flow_ema, flow_alpha, smooth_lightness, smooth_chroma, smooth_alpha,
    chroma_alpha, motion_blend, blend, init, mask_alphas, mask_has,
    composite_keep, warmup, use_lab, use_mask, fast_warp,
) -> tuple[jnp.ndarray, TemporalState]:
    """Split form of the temporal chain — same math, minimal scans.

    The monolithic scan (``split=False``) pays per-frame XLA kernel launches
    for work that doesn't depend on the recurrence: the LAB round trip, mask
    composite, and blends are elementwise in t. Here only the two true
    recurrences stay sequential — the flow-EMA warp scan (a bilinear gather
    per frame; the frame t-1 output is its input) and the tiny LAB EMA
    multiply-add scan — and everything else runs batched over T in fused
    NHWC passes. Outputs match ``split=False`` exactly (same elementwise
    ops in the same per-element order; tests/test_temporal_split.py pins
    it — with ``fast_warp=False``; fast_warp trades the bounded warp
    drift documented on temporal_postprocess_scan).
    """
    T = styled01.shape[0]
    if init is None:
        init_state = TemporalState(styled01[0], rgb_to_lab_u8(styled01[0]))
        first_is_warmup = True if warmup is None else warmup
    else:
        init_state = init
        first_is_warmup = False if warmup is None else warmup
    skip0 = jnp.logical_and(jnp.arange(T) == 0, first_is_warmup)  # [T]
    skip0_b = skip0[:, None, None, None]

    # Stage 1 — flow EMA: the only heavy recurrence. Scan body is just
    # warp + blend + clip.
    if flow_ema:
        a = jnp.clip(flow_alpha, 0.0, 1.0)

        def fstep(prev, inp):
            curr, flow, skip = inp
            if fast_warp:
                # quality-gated path: i32-packed u8-corner gather, 3.5x the
                # exact warp's speed (mk39/mk46: 35.8 -> 16.0 -> 10.2
                # ms/warp @1080p; u8 corner rounding <=2e-3, mean 6e-4)
                prev_warp = warp_flow_packed_u8(prev, flow)
                fused = jnp.clip(a * curr + (1.0 - a) * prev_warp, 0.0, 1.0)
            else:
                fused = flow_ema_fuse(curr, prev, flow, flow_alpha)
            out = jnp.where(skip, curr, fused)
            return out, out

        last_fused, fused = jax.lax.scan(
            fstep, init_state.prev_styled01, (styled01, flows, skip0))
    else:
        fused = styled01
        last_fused = styled01[-1]

    # Stage 2 — LAB EMA: batched round trip, scalar-alpha scan in between.
    if use_lab:
        lab = rgb_to_lab_u8(fused)                                 # [T,H,W,3]
        a_l = smooth_alpha if smooth_lightness else 1.0
        a_c = chroma_alpha if smooth_chroma else 1.0
        alphas = jnp.array([a_l, a_c, a_c], jnp.float32)
        prev0 = jnp.where(first_is_warmup, lab[0], init_state.prev_lab)

        def lstep(prev, lab_t):
            sm = alphas * lab_t + (1.0 - alphas) * prev
            return sm, sm

        last_lab, sm = jax.lax.scan(lstep, prev0, lab)
        out = lab_u8_to_rgb(jnp.clip(sm, 0.0, 255.0))
    else:
        out = fused
        last_lab = init_state.prev_lab

    # Stage 3 — mask composite + blends: fully batched over T.
    if use_mask:
        comp = (out * mask_alphas + orig01 * (1.0 - mask_alphas)) \
            if composite_keep \
            else (orig01 * mask_alphas + out * (1.0 - mask_alphas))
        out = jnp.where(mask_has[:, None, None, None], comp, out)
    if motion_blend:
        mag = jnp.sqrt(flows[..., 0] ** 2 + flows[..., 1] ** 2)
        m = gaussian_blur(
            jnp.clip(mag / MOTION_NORM, 0.0, 1.0)[..., None], GAUSS_SIGMA)
        m_alpha = blend - (blend - MIN_ALPHA) * m                  # [T,H,W,1]
        blended = jnp.clip(m_alpha * out + (1.0 - m_alpha) * orig01, 0.0, 1.0)
        skip = skip0_b
        if use_mask:
            skip = jnp.logical_or(skip, mask_has[:, None, None, None])
        out = jnp.where(skip, uniform_blend(out, orig01, blend), blended)
    else:
        out = uniform_blend(out, orig01, blend)
    return out, TemporalState(last_fused, last_lab)
