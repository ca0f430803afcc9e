"""Johnson TransformerNet in space-to-depth form — the TPU speed path.

Same math as models/transformer_net.py (bit-level up to float reassociation),
restructured so every convolution runs at 1/4 or 1/2 resolution with ≥48
channels. Small-channel full-resolution convs are the reason the naive port
runs at ~3% MXU utilization (C=3..32 uses 2-25% of the 128-wide vector
lanes); in block space the same FLOPs run as dense MXU-aligned contractions.

Mapping (f = space-to-depth factor; phases are pixel positions in a block):
  conv1 9×9 s1 @1080p  → 3×3 block conv  48→512 @270p  (input pixel-padded)
  conv2 3×3 s2 @1080p  → 2×2 block conv 128→ 64 @540p  (phase-permuted halo)
  conv3 3×3 s2 @540p   → 2×2 block conv 256→128 @270p  (phase-permuted halo)
  res ×5 @270p         → unchanged
  deconv1 up2+3×3 @540p → 3×3 conv 128→256 @270p (upsample taps merged)
  deconv2 up2+3×3 @1080p→ 3×3 conv  64→128 @540p (upsample taps merged)
  deconv3 9×9 s1 @1080p → 3×3 block conv 512→48 @270p (reflect halo), d2s

Reflect padding of intermediate feature maps is exact: out-of-range pixel
reads map to phase permutations of the first/last block rows (reflect) or
edge copies (the nearest-upsample layers), constructed as halo blocks before
each VALID conv.

Instance norm normalizes each *logical* channel across all its phases.

Weight conversion happens once at load (numpy scatter); see
``from_johnson_params``. Requires H, W divisible by 4 — the engine falls
back to the reference-form net otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.norm import instance_norm


# ---------------------------------------------------------------------------
# space-to-depth reshapes; channel index = (u*f + v)*C + c
# ---------------------------------------------------------------------------


def s2d(x: jnp.ndarray, f: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // f, w // f, f * f * c)


def d2s(x: jnp.ndarray, f: int, c: int) -> jnp.ndarray:
    b, hb, wb, _ = x.shape
    x = x.reshape(b, hb, wb, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hb * f, wb * f, c)


def _repack(x: jnp.ndarray, f_in: int, c: int, f_out: int) -> jnp.ndarray:
    """Change the s2d factor of a block tensor (pure transpose)."""
    return s2d(d2s(x, f_in, c), f_out)


# ---------------------------------------------------------------------------
# Weight scatter (host-side, once at load)
# ---------------------------------------------------------------------------


def _scatter_k9_f4(w: np.ndarray) -> np.ndarray:
    """9×9 s1 pixel conv (pad 4) → 3×3 block conv at f=4.

    w: HWIO [9,9,ci,co] → [3,3,16*ci,16*co]. Valid over a grid pre-padded by
    one block (4 px) per side."""
    k, _, ci, co = w.shape
    assert k == 9
    out = np.zeros((3, 3, 16 * ci, 16 * co), np.float32)
    for u in range(4):
        for v in range(4):
            for a in range(9):
                for b in range(9):
                    al, u2 = divmod(u + a, 4)
                    be, v2 = divmod(v + b, 4)
                    out[al, be, (u2 * 4 + v2) * ci : (u2 * 4 + v2 + 1) * ci,
                        (u * 4 + v) * co : (u * 4 + v + 1) * co] += w[a, b]
    return out


def _scatter_stride2_s2d2(w: np.ndarray) -> np.ndarray:
    """3×3 s2 pixel conv (pad 1) on an s2d2 input → 2×2 block conv.

    Input channels: 2×2 phases × ci (one block = 2×2 source pixels at the
    output's resolution×2). Output: plain co. w: [3,3,ci,co] →
    [2,2,4*ci,co]. Valid over a grid left/top-padded by one halo block."""
    _, _, ci, co = w.shape
    out = np.zeros((2, 2, 4 * ci, co), np.float32)
    # output pixel j reads source pixels 2j+a-1, a∈[0,3):
    #   a=0 → block j-1 phase 1 ; a=1 → block j phase 0 ; a=2 → block j phase 1
    # padded grid: kernel index κ ↔ block j-1+κ.
    taps = [(0, 1, 0), (1, 0, 1), (1, 1, 2)]  # (κ, phase, a)
    for ka, pa, a in taps:
        for kb, pb, b in taps:
            out[ka, kb, (pa * 2 + pb) * ci : (pa * 2 + pb + 1) * ci, :] += w[a, b]
    return out


def _scatter_upconv(w: np.ndarray) -> np.ndarray:
    """nearest ×2 upsample + 3×3 s1 conv (pad 1) → 3×3 conv on the
    low-res grid with s2d2 output phases.

    w: [3,3,ci,co] → [3,3,ci,4*co]. Output channel layout (q*2+r)*co+c.
    Valid over a grid padded by one edge-copied block per side."""
    _, _, ci, co = w.shape
    out = np.zeros((3, 3, ci, 4 * co), np.float32)
    # output hi-res pixel 2J+q reads upsampled(2J+q+a-1) = X[(2J+q+a-1)//2]:
    #   q=0: a=0→J-1 ; a=1→J ; a=2→J
    #   q=1: a=0→J   ; a=1→J ; a=2→J+1
    # padded grid: kernel index κ ↔ block J-1+κ.
    def taps(q):
        return [(0 if q == 0 and a == 0 else (2 if q == 1 and a == 2 else 1), a) for a in range(3)]

    for q in range(2):
        for r in range(2):
            for ka, a in taps(q):
                for kb, b in taps(r):
                    out[ka, kb, :, (q * 2 + r) * co : (q * 2 + r + 1) * co] += w[a, b]
    return out


# ---------------------------------------------------------------------------
# Halo construction (in-graph)
# ---------------------------------------------------------------------------


def _phase_rows(x, idx_blocks, idx_phases, f, c, axis):
    """Build one halo slab from (block, phase) picks along an axis.

    x: [..., Hb, Wb, f*f*C]; returns a slab shaped like one block row/col.
    idx_* are length-f lists: halo phase p takes block idx_blocks[p],
    phase idx_phases[p] (same-axis phase; the other axis phase passes
    through).

    Perf note: the block row/col is SLICED before any phase reshape —
    reshaping the full tensor to [..., f, f, C] first forces XLA to
    relayout the whole ~1 GB activation (measured 3.2 ms per halo at
    1080p); on a 1-block strip the relayout is microseconds."""
    b, hb, wb, _ = x.shape
    parts = []
    for p in range(f):
        blk, ph = idx_blocks[p], idx_phases[p]
        blk = blk % (hb if axis == 1 else wb)  # negative = from the end
        if axis == 1:
            strip = x[:, blk : blk + 1]                      # [B,1,Wb,f*f*C]
            sr = strip.reshape(b, 1, wb, f, f, c)
            parts.append(sr[:, :, :, ph, None, :, :])        # [B,1,Wb,1,f,C]
        else:
            strip = x[:, :, blk : blk + 1]                   # [B,Hb,1,f*f*C]
            sr = strip.reshape(b, hb, 1, f, f, c)
            parts.append(sr[:, :, :, :, ph, None, :])        # [B,Hb,1,f,1,C]
    halo = jnp.concatenate(parts, axis=3 if axis == 1 else 4)
    return halo.reshape((b, 1, wb, f * f * c) if axis == 1 else (b, hb, 1, f * f * c))


def _pad_reflect_s2d(x, f, c, pad_px):
    """Reflect-pad a block tensor by one halo block per side, where the halo
    encodes the pixel-space reflect of ``pad_px`` pixels (pad_px ≤ f).

    Halo phase p (counting from the block edge) holds pixel -(f-p), which is
    in-pad iff f-p ≤ pad_px; out-of-pad phases are never read (zero weights)
    and reuse phase 0 arbitrarily."""
    # left halo: pixel -(f-p) reflects to pixel (f-p): block (f-p)//f... for
    # f=4,pad=4: pixels -4..-1 → F[4],F[3],F[2],F[1]
    left_blocks, left_phases = [], []
    for p in range(f):
        k = f - p  # halo phase p = pixel -k → reflect F[k]
        left_blocks.append(k // f)
        left_phases.append(k % f)
    # right halo: pixel (N+t) → reflect F[N-2-t], N = total pixels, t = phase
    right_blocks, right_phases = [], []
    for t in range(f):
        # index from the end: F[N-2-t] = block Hb-1-( (t+2-1)//f ... compute
        # via offset o = t+2: F[N-o] → block (N-o)//f = Hb - 1 - (o-1)//f,
        # phase (f - (o % f)) % f
        o = t + 2
        right_blocks.append(-1 - (o - 1) // f)
        right_phases.append((f - (o % f)) % f)
    lh = _phase_rows(x, left_blocks, left_phases, f, c, axis=1)
    rh = _phase_rows(x, right_blocks, right_phases, f, c, axis=1)
    x = jnp.concatenate([lh, x, rh], axis=1)
    lw = _phase_rows(x, left_blocks, left_phases, f, c, axis=2)
    rw = _phase_rows(x, right_blocks, right_phases, f, c, axis=2)
    return jnp.concatenate([lw, x, rw], axis=2)


def _pad_stride2_halo(x, c):
    """Left/top halo for the stride-2 layers (f=2, pixel pad 1): halo phase 1
    = reflect pixel -1 = block0 phase1; phase 0 unread."""
    lh = _phase_rows(x, [0, 0], [1, 1], 2, c, axis=1)
    x = jnp.concatenate([lh, x], axis=1)
    lw = _phase_rows(x, [0, 0], [1, 1], 2, c, axis=2)
    return jnp.concatenate([lw, x], axis=2)


def _pad_edge_blocks(x):
    """Edge-copied halo blocks on all sides (the upsample-conv layers)."""
    x = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    return jnp.concatenate([x[:, :, :1], x, x[:, :, -1:]], axis=2)


# ---------------------------------------------------------------------------
# Phase-aware instance norm
# ---------------------------------------------------------------------------


def _in_phased(x, scale, bias, phases: int):
    """IN over (spatial × phases) per logical channel."""
    b, hb, wb, _ = x.shape
    c = scale.shape[0]
    xr = x.reshape(b, hb, wb, phases, c).astype(jnp.float32)
    mean = jnp.mean(xr, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean(jnp.square(xr - mean), axis=(1, 2, 3), keepdims=True)
    y = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.reshape(x.shape).astype(x.dtype)


def _in_stats(x, phases: int, c: int):
    """Per-(N, logical-channel) affine (a, b) such that norm(x) = a·x + b.

    One reduction read of x; the apply is deferred so it can fuse into the
    next layer's halo-pad pass (halo values are copies of real pixels, so
    normalizing after padding is exact)."""
    bsz, hb, wb, _ = x.shape
    xr = x.reshape(bsz, hb, wb, phases, c).astype(jnp.float32)
    mean = jnp.mean(xr, axis=(1, 2, 3))  # [B, C]
    var = jnp.mean(jnp.square(xr), axis=(1, 2, 3)) - mean * mean
    inv = jax.lax.rsqrt(var + 1e-5)
    return mean, inv


def _apply_in_relu(x, mean, inv, scale, bias, phases: int, *, relu=True):
    """Elementwise a·x+b (+ReLU) with per-logical-channel a,b; fuses into
    whatever pass produced/padded x."""
    b, hb, wb, _ = x.shape
    c = scale.shape[0]
    a = (inv * scale.astype(jnp.float32))  # [B, C]
    bb = (bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32))
    a = jnp.tile(a, (1, phases))[:, None, None, :]
    bb = jnp.tile(bb, (1, phases))[:, None, None, :]
    y = x.astype(jnp.float32) * a + bb
    if relu:
        y = jax.nn.relu(y)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conversion + apply
# ---------------------------------------------------------------------------


def from_johnson_params(p: dict) -> dict:
    """Convert reference-layout Johnson params (models/transformer_net) to
    block-space params. Pure host work, done once at load."""
    g = lambda a: np.asarray(a, np.float32)  # noqa: E731

    def bias_tile(b, phases):
        return np.tile(g(b), phases)

    out: dict = {}
    out["c1_w"] = _scatter_k9_f4(g(p["conv1"]["w"]))
    out["c1_b"] = bias_tile(p["conv1"]["b"], 16)
    out["in1"] = {"scale": g(p["in1"]["scale"]), "bias": g(p["in1"]["bias"])}
    out["c2_w"] = _scatter_stride2_s2d2(g(p["conv2"]["w"]))
    out["c2_b"] = g(p["conv2"]["b"])
    out["in2"] = {"scale": g(p["in2"]["scale"]), "bias": g(p["in2"]["bias"])}
    out["c3_w"] = _scatter_stride2_s2d2(g(p["conv3"]["w"]))
    out["c3_b"] = g(p["conv3"]["b"])
    out["in3"] = {"scale": g(p["in3"]["scale"]), "bias": g(p["in3"]["bias"])}
    for i in range(1, 6):
        out[f"res{i}"] = jax.tree.map(g, p[f"res{i}"])
    out["d1_w"] = _scatter_upconv(g(p["deconv1"]["w"]))
    out["d1_b"] = bias_tile(p["deconv1"]["b"], 4)
    out["in4"] = {"scale": g(p["in4"]["scale"]), "bias": g(p["in4"]["bias"])}
    out["d2_w"] = _scatter_upconv(g(p["deconv2"]["w"]))
    out["d2_b"] = bias_tile(p["deconv2"]["b"], 4)
    out["in5"] = {"scale": g(p["in5"]["scale"]), "bias": g(p["in5"]["bias"])}
    out["d3_w"] = _scatter_k9_f4(g(p["deconv3"]["w"]))
    out["d3_b"] = bias_tile(p["deconv3"]["b"], 16)
    return jax.tree.map(jnp.asarray, out)


def apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass, same contract as transformer_net.apply.

    x: NHWC with H, W divisible by 4.

    Schedule note: every instance norm is split into a stats reduction right
    after its conv and a deferred affine+ReLU applied AFTER the next layer's
    halo padding/repack — exact (halos are copies of real pixels, and the
    per-channel affine commutes with copying), and it lets XLA fuse the
    normalize pass into the pad/transpose pass instead of a separate
    full-tensor read+write per layer."""
    from ..ops.pad import reflect_pad_2d

    b, h, w, _ = x.shape
    assert h % 4 == 0 and w % 4 == 0, "s2d path needs H,W divisible by 4"
    p = params

    # conv1: pixel pad 4 then s2d4 → VALID 3×3 (the pad becomes the halo).
    y = s2d(reflect_pad_2d(x, 4), 4)  # [B, H/4+2, W/4+2, 48]
    y = conv2d(y, p["c1_w"], p["c1_b"])
    m, inv = _in_stats(y, 16, 32)
    y = _repack(y, 4, 32, 2)  # [B, H/2, W/2, 128]
    y = _pad_stride2_halo(y, 32)
    y = _apply_in_relu(y, m, inv, p["in1"]["scale"], p["in1"]["bias"], 4)

    y = conv2d(y, p["c2_w"], p["c2_b"])  # [B, H/2, W/2, 64]
    m, inv = _in_stats(y, 1, 64)
    y = s2d(y, 2)  # [B, H/4, W/4, 256]
    y = _pad_stride2_halo(y, 64)
    y = _apply_in_relu(y, m, inv, p["in2"]["scale"], p["in2"]["bias"], 4)

    y = conv2d(y, p["c3_w"], p["c3_b"])  # [B, H/4, W/4, 128]
    m, inv = _in_stats(y, 1, 128)
    y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)

    for i in range(1, 6):
        rp = p[f"res{i}"]
        r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"], rp["conv1"]["b"])
        m, inv = _in_stats(r, 1, 128)
        r = reflect_pad_2d(r, 1)
        r = _apply_in_relu(r, m, inv, rp["in1"]["scale"], rp["in1"]["bias"], 1)
        r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"])
        y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y

    # deconv1: up×2 + conv → s2d2-of-540p output on the 270p grid.
    y = _pad_edge_blocks(y)
    y = conv2d(y, p["d1_w"], p["d1_b"])  # [B, H/4, W/4, 256]
    m, inv = _in_stats(y, 4, 64)
    y = d2s(y, 2, 64)  # [B, H/2, W/2, 64]
    y = _pad_edge_blocks(y)
    y = _apply_in_relu(y, m, inv, p["in4"]["scale"], p["in4"]["bias"], 1)

    # deconv2: runs on the 540p grid.
    y = conv2d(y, p["d2_w"], p["d2_b"])  # [B, H/2, W/2, 128]
    m, inv = _in_stats(y, 4, 32)
    y = _repack(y, 2, 32, 4)  # [B, H/4, W/4, 512] (16 phases × 32)
    y = _pad_reflect_s2d(y, 4, 32, 4)
    y = _apply_in_relu(y, m, inv, p["in5"]["scale"], p["in5"]["bias"], 16)

    # deconv3: VALID 3×3 over the reflect halo, then depth-to-space.
    y = conv2d(y, p["d3_w"], p["d3_b"])  # [B, H/4, W/4, 48]
    return d2s(y, 4, 3)
