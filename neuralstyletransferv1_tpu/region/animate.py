"""Animated region masks: rotation and organic morph warps, in-graph.

Per-frame mask animation is part of the hot loop, so everything here is
jittable JAX operating on stacked [R, H, W] masks. Parity targets:
- rotation + coverage renormalization (reference: region_blend.py:25-66)
- multi-octave sin/cos noise fields, flow-field warp, per-mode displacement
  (reference: region_blend.py:604-734)
- iterative max-pool gap fill + renormalize (reference: region_blend.py:768-810)
- morph-spec parser (reference: region_blend.py:813-872)

RNG parity: the reference draws ``np.random.default_rng(seed).random()`` per
octave for noise offsets — those draws are precomputed host-side per seed, so
the in-graph field evaluation is deterministic and frame-index is just a
traced scalar.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import bilinear_sample
from .masks import feather_mask

MIN_COVERAGE = 0.1
GAP_KERNELS = (5, 11, 21, 41)


@dataclass
class MorphAnimation:
    """Organic morph config (reference: region_blend.py:523-532)."""

    enabled: bool = False
    speed: float = 1.0
    amplitude: float = 0.15
    frequency: float = 3.0
    octaves: int = 3
    mode: str = "blob"
    seed: int = 42


def parse_morph_animation(spec: str | None) -> MorphAnimation:
    """Parse 'speed,amplitude,frequency,mode' / bare mode / off
    (reference: region_blend.py:813-872)."""
    if not spec or spec.lower() in ("none", "off", "0", "static"):
        return MorphAnimation(enabled=False)
    modes = ["blob", "tentacle", "wave", "pulse"]
    if spec.lower() in modes:
        return MorphAnimation(enabled=True, mode=spec.lower())
    parts = spec.split(",")
    try:
        if len(parts) >= 4:
            return MorphAnimation(
                enabled=True,
                speed=float(parts[0]),
                amplitude=float(parts[1]),
                frequency=float(parts[2]),
                mode=parts[3].strip().lower(),
            )
        if len(parts) == 3:
            return MorphAnimation(
                enabled=True, speed=float(parts[0]), amplitude=float(parts[1]), frequency=float(parts[2])
            )
        if len(parts) == 2:
            return MorphAnimation(enabled=True, speed=float(parts[0]), amplitude=float(parts[1]))
        if len(parts) == 1:
            return MorphAnimation(enabled=True, speed=float(parts[0]))
    except ValueError:
        return MorphAnimation(enabled=True, mode=spec.lower())
    return MorphAnimation(enabled=False)


def rotate_all_masks(masks: jnp.ndarray, angle_degrees: float | jnp.ndarray) -> jnp.ndarray:
    """Rotate stacked [R, H, W] masks about (W/2, H/2) with replicate border,
    then renormalize coverage (reference: region_blend.py:25-66)."""
    R, H, W = masks.shape
    theta = jnp.deg2rad(jnp.asarray(angle_degrees, jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    gx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    gy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    map_x = cos * gx - sin * gy + cx
    map_y = sin * gx + cos * gy + cy
    rotated = jax.vmap(lambda m: bilinear_sample(m, map_x, map_y, border="replicate"))(masks)
    total = jnp.clip(jnp.sum(rotated, axis=0, keepdims=True), 1e-6, None)
    return rotated / total


@lru_cache(maxsize=256)
def _octave_offsets(seed: int, octaves: int) -> tuple:
    """The reference's per-octave rng.random()*1000 draws, in draw order
    (region_blend.py:629-632)."""
    rng = np.random.default_rng(seed)
    return tuple((float(rng.random() * 1000), float(rng.random() * 1000)) for _ in range(octaves))


def _noise_field(H, W, frequency, octaves, seed, time_offset):
    """Multi-octave sin/cos noise in [0,1] (reference:
    region_blend.py:604-652). time_offset may be traced."""
    offsets = _octave_offsets(int(seed), int(octaves))
    y = jnp.linspace(0.0, frequency, H)[:, None]
    x = jnp.linspace(0.0, frequency, W)[None, :]
    result = jnp.zeros((H, W), jnp.float32)
    amplitude, total_amplitude, freq_mult = 1.0, 0.0, 1.0
    for octave in range(octaves):
        rx, ry = offsets[octave]
        ox = time_offset * (0.5 + 0.3 * octave) + rx
        oy = time_offset * (0.3 + 0.2 * octave) + ry
        noise = jnp.sin(x * freq_mult + ox) * jnp.cos(y * freq_mult + oy)
        noise += jnp.sin((x + y) * freq_mult * 0.7 + ox * 0.8) * 0.5
        noise += jnp.cos((x - y) * freq_mult * 0.5 + oy * 0.6) * 0.3
        result = result + noise * amplitude
        total_amplitude += amplitude
        amplitude *= 0.5
        freq_mult *= 2.0
    result = result / total_amplitude
    return (result - result.min()) / (result.max() - result.min() + 1e-6)


def _flow_field(H, W, frequency, seed, time_offset):
    """(dx, dy) in [-1,1] (reference: region_blend.py:655-666)."""
    fx = _noise_field(H, W, frequency, 2, seed, time_offset) * 2 - 1
    fy = _noise_field(H, W, frequency, 2, seed + 1000, time_offset * 1.3) * 2 - 1
    return fx, fy


def _reflect_coords(c: jnp.ndarray, size: int) -> jnp.ndarray:
    """cv2.BORDER_REFLECT coordinate folding (edge included)."""
    period = 2.0 * size
    c = jnp.mod(c, period)
    return jnp.minimum(c, period - 1.0 - c).clip(0.0, size - 1.0)


def warp_mask_organic(
    mask: jnp.ndarray,
    amplitude: float,
    frequency: float,
    frame_idx,
    speed: float,
    seed: int,
    mode: str = "blob",
) -> jnp.ndarray:
    """Warp one [H, W] mask by an organic displacement field
    (reference: region_blend.py:670-734). frame_idx may be traced."""
    H, W = mask.shape
    t = jnp.asarray(frame_idx, jnp.float32) * speed * 0.02
    if mode == "tentacle":
        fx, fy = _flow_field(H, W, frequency * 2, seed, t)
        y01 = jnp.linspace(0.0, 1.0, H)[:, None]
        fy = fy + jnp.sin(y01 * jnp.pi * 3 + t) * 0.5
    elif mode == "wave":
        yc = jnp.linspace(0.0, jnp.pi * frequency, H)[:, None]
        xc = jnp.linspace(0.0, jnp.pi * frequency, W)[None, :]
        fx = jnp.broadcast_to(jnp.sin(yc + t * 2), (H, W))
        fy = jnp.broadcast_to(jnp.cos(xc + t * 1.5), (H, W))
    elif mode == "pulse":
        cy, cx = H // 2, W // 2
        y = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
        x = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
        r = jnp.sqrt(x * x + y * y) + 1e-6
        theta = jnp.arctan2(y, x)
        pulse = jnp.sin(r * 0.05 - t * 3) * 0.5 + 0.5
        fx, fy = jnp.cos(theta) * pulse, jnp.sin(theta) * pulse
    else:  # blob
        fx, fy = _flow_field(H, W, frequency, seed, t)

    max_disp = max(H, W) * amplitude
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    map_x = _reflect_coords(gx + fx * max_disp, W)
    map_y = _reflect_coords(gy + fy * max_disp, H)
    return bilinear_sample(mask, map_x, map_y, border="replicate")


def _gap_fill(masks: jnp.ndarray) -> jnp.ndarray:
    """Iterative max-pool dilation into low-coverage pixels
    (reference: region_blend.py:768-810). Runs all kernel sizes
    unconditionally — a no-op where no gap remains."""
    from ..ops.morphology import grey_dilate

    total = jnp.sum(masks, axis=0, keepdims=True)
    gap = (total < MIN_COVERAGE).astype(masks.dtype)
    for k in GAP_KERNELS:
        dilated = grey_dilate(masks[..., None], k)[..., 0]
        masks = masks * (1 - gap) + dilated * gap
        total = jnp.sum(masks, axis=0, keepdims=True)
        gap = (total < MIN_COVERAGE).astype(masks.dtype)
    return masks


def warp_all_masks_organic(masks: jnp.ndarray, morph: MorphAnimation, frame_idx) -> jnp.ndarray:
    """Warp all [R, H, W] masks (per-region seed offset), gap-fill and
    renormalize (reference: region_blend.py:737-810)."""
    if not morph.enabled:
        return masks
    R = masks.shape[0]
    warped = jnp.stack(
        [
            warp_mask_organic(
                masks[i],
                amplitude=morph.amplitude,
                frequency=morph.frequency,
                frame_idx=frame_idx,
                speed=morph.speed,
                seed=morph.seed + i * 100,
                mode=morph.mode,
            )
            for i in range(R)
        ],
        axis=0,
    )
    warped = _gap_fill(warped)
    total = jnp.clip(jnp.sum(warped, axis=0, keepdims=True), 1e-6, None)
    return warped / total
