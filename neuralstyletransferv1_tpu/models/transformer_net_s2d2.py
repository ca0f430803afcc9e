"""Johnson TransformerNet in space-to-depth f=2 form — the round-2 TPU
speed path.

Round-1 profiling (memory/nst-tpu-perf-ledger.md + /tmp ablations) showed
XLA's convs already run at ~MXU peak on this net; the f=4 form
(transformer_net_s2d.py) lost ~110 of its 139 ms/batch8 to *phase repacks*
(f4↔f2 transposes of ~1 GB tensors) and materialized halo concats at
540p/1080p. This form keeps every tensor in ONE s2d layout (f=2 of the
1080p grid == pixels of the 540p grid) so no repack ever happens:

  conv1 9×9 s1 @1080p  → 5×5 block conv 12→128 on the 540 grid
                         (input pixel-padded 4 before the only input s2d)
  conv2 3×3 s2 @1080p  → 2×2 block conv 128→64 @540 grid (phase halo)
  conv3 3×3 s2 @540p   → plain 3×3 stride-2 conv (the f=2 tensor IS the
                         540p pixel grid) → 270 grid
  res ×5 @270p         → unchanged (already peak-speed)
  deconv1 up2+3×3@540p → 3×3 conv 128→256 @270 grid, d2s → 540 grid
  deconv2 up2+3×3@1080p→ 3×3 conv 64→128 @540 grid (edge halo)
  deconv3 9×9 s1@1080p → 5×5 block conv 128→12 @540 grid (reflect halo), d2s

Same math as models/transformer_net.py (parity test: tests/test_s2d.py);
weight conversion is a host-side scatter at load. Requires H, W divisible
by 4 (two stride-2 levels), like the f=4 form.

Reference for the layer semantics being restructured:
/root/reference/transformer_net.py:4-99 and the hot loop
/root/reference/pipeline.py:1444-1486.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.norm import instance_norm
from ..ops.pad import reflect_pad_2d
from .transformer_net_s2d import (
    _apply_in_relu,
    _in_stats,
    _pad_edge_blocks,
    _pad_stride2_halo,
    _scatter_stride2_s2d2,
    _scatter_upconv,
    d2s,
    s2d,
)

_C3_BLOCK = False  # A/B flag: conv3 as 2×2 block conv (experiments/mk16)
_HEAD_PIX = False  # A/B flag: conv1 as 10×10 s2 pixel conv (experiments/mk16)
_BUILD_HEAD_SITE = False  # build c3_wb for the gated Pallas head site


def _pad_reflect_f2_4px(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Reflect-pad an f=2 block tensor by TWO halo blocks per side, encoding
    a 4-pixel reflect (torch ReflectionPad2d semantics, no edge repeat).

    Pixel-space reflect around the first pixel: px -k := px k. At f=2:
      halo block -1 = px (-2,-1) → px (2,1) = (block1 p0, block0 p1)
      halo block -2 = px (-4,-3) → px (4,3) = (block2 p0, block1 p1)
    Right side (N pixels): px N+t := px N-2-t:
      halo block +1 = px (N,N+1) → (N-2,N-3) = (blk[-1] p0, blk[-2] p1)
      halo block +2 = px (N+2,N+3) → (N-4,N-5) = (blk[-2] p0, blk[-3] p1)
    """
    from .transformer_net_s2d import _phase_rows

    l1_b, l1_p = [1, 0], [0, 1]   # halo block -1
    l2_b, l2_p = [2, 1], [0, 1]   # halo block -2
    r1_b, r1_p = [-1, -2], [0, 1]
    r2_b, r2_p = [-2, -3], [0, 1]
    for axis in (1, 2):
        h2 = _phase_rows(x, l2_b, l2_p, 2, c, axis=axis)
        h1 = _phase_rows(x, l1_b, l1_p, 2, c, axis=axis)
        g1 = _phase_rows(x, r1_b, r1_p, 2, c, axis=axis)
        g2 = _phase_rows(x, r2_b, r2_p, 2, c, axis=axis)
        x = jnp.concatenate([h2, h1, x, g1, g2], axis=axis)
    return x


def _scatter_k9_f2(w: np.ndarray) -> np.ndarray:
    """9×9 s1 pixel conv (pad 4) → 5×5 block conv at f=2.

    w: HWIO [9,9,ci,co] → [5,5,4*ci,4*co]. Valid over a grid pre-padded by
    two blocks (4 px) per side. Channel layout (u*2+v)*c + ch, matching s2d.
    """
    k, _, ci, co = w.shape
    assert k == 9
    out = np.zeros((5, 5, 4 * ci, 4 * co), np.float32)
    for u in range(2):          # output phase rows
        for v in range(2):      # output phase cols
            for a in range(9):
                for b in range(9):
                    # output pixel 2J+u reads input pixel 2J+u+a-4 =
                    # block J-2+κ phase u2, with pre-pad 2 blocks: kernel
                    # index κ = (u+a)//2, phase u2 = (u+a)%2
                    al, u2 = divmod(u + a, 2)
                    be, v2 = divmod(v + b, 2)
                    out[al, be, (u2 * 2 + v2) * ci : (u2 * 2 + v2 + 1) * ci,
                        (u * 2 + v) * co : (u * 2 + v + 1) * co] += w[a, b]
    return out


def _scatter_k9_pixel_s2(w: np.ndarray) -> np.ndarray:
    """9×9 s1 pixel conv → 10×10 stride-2 pixel conv whose 128 outputs are
    the 4 f=2 phases × 32 channels.

    Output phase (u,v) at 540-grid (I,J) is the 9×9 conv at pixel
    (2I+u, 2J+v); the union of supports over u,v ∈ {0,1} is a 10×10 window,
    so w10[a+u, b+v, :, (u*2+v)*co] += w9[a, b].  This head form runs the
    conv on the DENSE 3-channel pixel tensor — measured 2.2× faster than
    s2d + [5,5,12,128] because XLA lane-pads 12-channel bf16 tensors 10.7×
    (see PERF.md round-2b).
    """
    k, _, ci, co = w.shape
    assert k == 9
    out = np.zeros((10, 10, ci, 4 * co), np.float32)
    for u in range(2):
        for v in range(2):
            out[u:u + 9, v:v + 9, :, (u * 2 + v) * co:(u * 2 + v + 1) * co] \
                += w
    return out


def from_johnson_params(p: dict) -> dict:
    """Reference-layout Johnson params → f=2 block-space params."""
    g = lambda a: np.asarray(a, np.float32)  # noqa: E731

    def bias_tile(b, phases):
        return np.tile(g(b), phases)

    out: dict = {}
    out["c1_w"] = _scatter_k9_f2(g(p["conv1"]["w"]))
    if _HEAD_PIX:
        # pixel-space head form (10×10 stride-2 dense conv; same math) for
        # the experiments/mk16 A/B — measured in-net NEGATIVE (PERF.md);
        # built only when the flag is set so production params don't carry
        # the dead tensor.
        out["c1p_w"] = _scatter_k9_pixel_s2(g(p["conv1"]["w"]))
    out["c1_b"] = bias_tile(p["conv1"]["b"], 4)
    out["in1"] = {"scale": g(p["in1"]["scale"]), "bias": g(p["in1"]["bias"])}
    out["c2_w"] = _scatter_stride2_s2d2(g(p["conv2"]["w"]))
    out["c2_b"] = g(p["conv2"]["b"])
    out["in2"] = {"scale": g(p["in2"]["scale"]), "bias": g(p["in2"]["bias"])}
    out["c3_w"] = g(p["conv3"]["w"])  # plain pixel conv on the 540 grid
    if _C3_BLOCK or _BUILD_HEAD_SITE:
        # block form (2x2 block conv, K=256) for the _C3_BLOCK A/B and the
        # gated Pallas head site — both measured in-net NEGATIVE at bf16
        # (PERF.md round-2c); built only on demand.
        out["c3_wb"] = _scatter_stride2_s2d2(g(p["conv3"]["w"]))
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
    # d3 in tap-packed f2 form: the plain [5,5,128,12] conv wastes 116/128
    # MXU output lanes (measured 17.4 ms) and the f4 alternative costs two
    # ~1 GB phase transposes (8-9 ms each). Instead the 5 kernel ROWS pack
    # into output channels — a 1×5 conv to 5·12=60 lanes — and the row sums
    # combine as five shifted slice-adds (exact reassociation; the reflect
    # halo already provides the +/-2 rows).
    w5 = _scatter_k9_f2(g(p["deconv3"]["w"]))        # [5,5,128,12]
    w_row = np.zeros((1, 5, w5.shape[2], 5 * w5.shape[3]), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * w5.shape[3] : (dy + 1) * w5.shape[3]] = w5[dy]
    out["d3_w"] = w_row                               # [1,5,128,60]
    out["d3_b"] = bias_tile(p["deconv3"]["b"], 4)     # [12], applied post-sum
    return jax.tree.map(jnp.asarray, out)


def bake_io_affine(bp: dict, preset: str) -> dict:
    """Fold an IO preset's pre/post per-channel affines (+BGR permutations)
    into conv1/deconv3, so ``apply(baked, x01)`` consumes [0,1] RGB directly
    and returns the postprocessed (pre-clip) [0,1] RGB — the separate
    preprocess/postprocess elementwise passes vanish (round-2c trace:
    ~3 ms/B8 at 1080p). Exact: conv(a*x+b) == conv_{w*a}(x) + const, and
    reflect/edge pads are value copies so the strip fixups stay consistent.
    Internal activations are bit-identical; only the IO interpretation of
    the first/last layer changes. Caller applies ``jnp.clip(y, 0, 1)``.
    """
    from . import io_presets as iop

    pperm, pa, pb, operm, os_, ot = iop.preset_affine(preset)
    out = dict(bp)
    c1w = np.asarray(bp["c1_w"], np.float32)          # (5,5,12,128)
    c1b = np.asarray(bp["c1_b"], np.float32)
    w1 = np.zeros_like(c1w)
    const = np.zeros_like(c1b)
    for ph in range(4):
        for c in range(3):
            src = ph * 3 + c                          # model-input channel
            dst = ph * 3 + pperm[c]                   # raw [0,1] RGB channel
            w1[:, :, dst, :] += c1w[:, :, src, :] * pa[c]
            const += c1w[:, :, src, :].sum(axis=(0, 1)) * pb[c]
    out["c1_w"] = jnp.asarray(w1).astype(bp["c1_w"].dtype)
    out["c1_b"] = jnp.asarray(c1b + const).astype(bp["c1_b"].dtype)
    if "c1p_w" in bp:
        c1p = np.asarray(bp["c1p_w"], np.float32)     # (10,10,3,128)
        w1p = np.zeros_like(c1p)
        for c in range(3):
            w1p[:, :, pperm[c], :] += c1p[:, :, c, :] * pa[c]
        # same bias const: sum over taps/in-ch of w*pb equals the block-form
        # one only for interior pixels, which is exactly where SAME applies;
        # borders are strip-fixed with reflect pads (value copies), where the
        # same const holds.
        out["c1p_w"] = jnp.asarray(w1p).astype(bp["c1p_w"].dtype)

    d3w = np.asarray(bp["d3_w"], np.float32)          # (1,5,128,60)
    d3b = np.asarray(bp["d3_b"], np.float32)          # (12,)
    w3 = np.zeros_like(d3w)
    b3 = np.zeros_like(d3b)
    for ph in range(4):
        for c in range(3):
            co, src = ph * 3 + c, ph * 3 + operm[c]
            for dy in range(5):
                w3[..., dy * 12 + co] = d3w[..., dy * 12 + src] * os_[c]
            b3[co] = d3b[src] * os_[c] + ot[c]
    out["d3_w"] = jnp.asarray(w3).astype(bp["d3_w"].dtype)
    out["d3_b"] = jnp.asarray(b3).astype(bp["d3_b"].dtype)
    return out


def _conv1_same_fixed(ys: jnp.ndarray, w: jnp.ndarray,
                      b: jnp.ndarray) -> jnp.ndarray:
    """conv1 as a zero-SAME block conv + exact reflect border-strip fixup.

    The materialized phase-reflect halo pad on the 12-channel s2d tensor
    costs 6.5 ms/B8 at 1080p (two dynamic-update-slice passes, ~10x
    lane-padding waste on narrow bf16 — round-2c trace). Zero padding rides
    the conv for free; only the 2-block border frame is wrong, and four
    strip convs over properly reflect-padded 4-row/4-col slices recompute
    it exactly (the strip pads include both axes, so corners are exact and
    write order is irrelevant)."""
    y = conv2d(ys, w, b, padding=2)
    t = conv2d(_pad_reflect_f2_4px(ys[:, :4], 3), w, b)[:, :2]
    bo = conv2d(_pad_reflect_f2_4px(ys[:, -4:], 3), w, b)[:, -2:]
    le = conv2d(_pad_reflect_f2_4px(ys[:, :, :4], 3), w, b)[:, :, :2]
    r = conv2d(_pad_reflect_f2_4px(ys[:, :, -4:], 3), w, b)[:, :, -2:]
    y = y.at[:, :2].set(t)
    y = y.at[:, -2:].set(bo)
    y = y.at[:, :, :2].set(le)
    y = y.at[:, :, -2:].set(r)
    return y


def apply(params: dict, x: jnp.ndarray, *, tap=None,
          fused_sites: tuple = (), quant: dict | None = None,
          static_stats: dict | None = None,
          stats_out: dict | None = None) -> jnp.ndarray:
    """Forward pass, same contract as transformer_net.apply.

    x: NHWC with H, W divisible by 4. Instance norms split into a stats
    reduction + deferred affine (exact — see transformer_net_s2d.apply).

    tap: optional ``tap(site, tensor)`` callback invoked with the tensor
    feeding each conv (pre-halo; halos copy values so maxima agree) —
    instrumentation for calibration/profiling experiments (e.g. activation
    ranges for quantization studies; see PERF.md "int8" section).

    fused_sites: names of conv sites to run as Pallas fused kernels
    (models/s2d2_sites.py) — TPU only; each site applies the deferred IN
    affine in its prologue instead of a separate HBM pass. Currently:
    "tail" (the fused deconv2+deconv3 chain — the production fast path)
    and "d3" (legacy single-site form, kept for the PERF.md record).
    Unsupported geometries silently fall back to the XLA form.
    For fused sites, ``tap`` receives the RAW (pre-apply) tensor.

    static_stats: optional ``{site: (mean, inv)}`` (sites ``in1..in5``,
    ``r{i}in1``/``r{i}in2``) freezing every instance norm to
    calibration-time statistics (``calibrate_in_stats``). This is the
    opt-in STATIC-NORM mode (engine ``--quantize bf16_static`` /
    ``int8_static``): per-image stats reductions disappear and every IN
    affine becomes a compile-time constant that XLA folds into the conv
    epilogues — the same structure that makes BN-folded .t7 graphs the
    fastest backend. NOT exact vs the reference (IN is per-image by
    definition); quality is gated at the engine/bench level. The bf16
    "head"/"tail" sites compute stats internally and are ignored under
    static_stats (the XLA head runs instead); "head_i8" rides the frozen
    in2/in3 stats (head_chain(static_stats=...)).

    stats_out: optional dict the forward fills with each computed
    ``(mean, inv)`` under its site name — the calibration hook.
    """
    b, h, w, _ = x.shape
    assert h % 4 == 0 and w % 4 == 0, "s2d2 path needs H,W divisible by 4"
    p = params
    if tap is None:
        tap = lambda name, t: None  # noqa: E731
    if static_stats is not None:
        # the bf16 "head"/"tail" sites compute stats internally and cannot
        # take frozen ones — static mode runs the XLA forms instead.
        # "head_i8" CAN ride static stats (head_chain(static_stats=...))
        # when the in2/in3 freezes exist; drop it only when they don't.
        drop = {"head", "tail"}
        if not ("in2" in static_stats and "in3" in static_stats):
            drop.add("head_i8")
        fused_sites = tuple(s for s in fused_sites if s not in drop)

    def _st(site, t, phases, c):
        """Deferred-IN stats: frozen when static, measured (and optionally
        recorded) otherwise."""
        if static_stats is not None and site in static_stats:
            ms, invs = static_stats[site]
            return ms.astype(jnp.float32), invs.astype(jnp.float32)
        ms, invs = _in_stats(t, phases, c)
        if stats_out is not None:
            stats_out[site] = (ms, invs)
        return ms, invs

    def _qc(site, xin, wkey_w, bias=None, affine=None, **kw):
        """Site conv: int8 (quantize folded into this read, per-channel
        dequant into the conv's output fusion) when the site is in
        ``quant``, plain bf16/f32 conv2d otherwise.

        affine: optional deferred-IN ``(mean, inv, scale, bias, phases)``
        (ReLU implied) that precedes the conv. In the bf16 path it runs as
        the usual `_apply_in_relu` (fuses into the conv's input). In the
        int8 path it folds INTO the quantize: q = clamp(round(x·(a·qin)
        + b·qin), 0, 127) — one mul+add per element instead of the
        affine→relu→bf16→f32→scale→round chain (the standalone quant
        passes were 56.8 ms/B16 before folding; trace in PERF.md)."""
        qs = quant.get(site) if quant is not None else None
        if qs is None:
            if affine is not None:
                xin = _apply_in_relu(xin, *affine)
            return conv2d(xin, wkey_w, bias, **kw)
        from ..ops.conv import conv2d_i8

        xf = xin.astype(jnp.float32)
        if affine is not None:
            m_, inv_, sc, bi, ph = affine
            scf = sc.astype(jnp.float32)
            a = (inv_ * scf) * qs["qin"]
            bb = (bi.astype(jnp.float32) - m_ * inv_ * scf) * qs["qin"]
            a = jnp.tile(a, (1, ph))[:, None, None, :]
            bb = jnp.tile(bb, (1, ph))[:, None, None, :]
            # qin > 0 so the ReLU folds into the clamp's lower bound
            xq = jnp.clip(jnp.round(xf * a + bb), 0.0, 127.0)
        else:
            xq = jnp.clip(jnp.round(xf * qs["qin"]), -127.0, 127.0)
        xq = xq.astype(jnp.int8)
        y = conv2d_i8(xq, qs["w"], **kw).astype(jnp.float32) * qs["ws"]
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(xin.dtype)
    tap("c1", x)

    # conv1: the only input s2d, then a 2-block phase-reflect halo (padding
    # AFTER s2d skips the full-res [H+8, W+8, 3] pad copy; identical math —
    # pixel reflect == phase-permuted block reflect).  NOTE: the 10×10
    # stride-2 pixel-conv alternative (_scatter_k9_pixel_s2) looked 2.2×
    # faster in isolation but is a 14 ms/B16 net REGRESSION — see PERF.md
    # "Head-P negative"; trust only in-net A/Bs here.
    if _HEAD_PIX and "c1p_w" in p and h >= 32 and w >= 32:
        # 10×10 stride-2 dense pixel conv (no input s2d pass); zero-SAME
        # with reflect border strips like the block form.
        def _pstrip(sl, rp, cp):
            ps = jnp.pad(sl, ((0, 0), rp, cp, (0, 0)), mode="reflect")
            return conv2d(ps, p["c1p_w"], p["c1_b"], stride=2)
        y = conv2d(x, p["c1p_w"], p["c1_b"], stride=2, padding=4)
        y = y.at[:, :2].set(_pstrip(x[:, :8], (4, 0), (4, 4)))
        y = y.at[:, -2:].set(_pstrip(x[:, -8:], (0, 4), (4, 4)))
        y = y.at[:, :, :2].set(_pstrip(x[:, :, :8], (4, 4), (4, 0)))
        y = y.at[:, :, -2:].set(_pstrip(x[:, :, -8:], (4, 4), (0, 4)))
    else:
        ys = s2d(x, 2)                            # [B, H/2, W/2, 12]
        if h >= 16 and w >= 16:
            y = _conv1_same_fixed(ys, p["c1_w"], p["c1_b"])
        else:
            y = conv2d(_pad_reflect_f2_4px(ys, 3), p["c1_w"], p["c1_b"])
    m, inv = _st("in1", y, 4, 32)                 # [B, H/2, W/2, 128]

    use_head_i8 = False
    if "head_i8" in fused_sites and quant is not None:
        from . import s2d2_sites_i8
        use_head_i8 = ("c2" in quant and "c3" in quant
                       and s2d2_sites_i8.head_supported(h // 2, w // 2))
    use_head = False
    if "head" in fused_sites and "c3_wb" in p:
        from . import s2d2_sites
        use_head = s2d2_sites.head_supported(h // 2, w // 2)
    pend3 = None
    if use_head_i8:
        # conv2 + conv3 as pair-packed Pallas int8 sites: the in1/in2
        # applies fold into the kernels' quantize prologues, the phase
        # halos become s8 permutation dots, and c3's stride-2 runs as
        # even/odd-row pair dots at full MXU depth (K=128/256) — the XLA
        # strided conv ran at ~46 TF/s (round-2c trace).
        tap("c2", y)
        y, m, inv = s2d2_sites_i8.head_chain(y, m, inv, p, quant,
                                             static_stats=static_stats)
        if static_stats is not None:
            # defer the in3 apply: when the static s8 res chain follows,
            # the frozen affine folds into its first quantize prologue
            # instead of a standalone HBM pass between two Pallas kernels
            pend3 = (m, inv)
        else:
            y = _apply_in_relu(y, m, inv, p["in3"]["scale"],
                               p["in3"]["bias"], 1)
    elif use_head:
        # fused c2+c3: Pallas sites + strip fixup kill the in1/in2 apply
        # passes and XLA's strided conv3.
        y, m, inv = s2d2_sites.head(y, m, inv, p["in1"], p["c2_w"],
                                    p["c2_b"], p["in2"], p["c3_wb"],
                                    p["c3_b"], tap=tap)
        y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)
    else:
        # "c2"/"c3" in quant ride the Pallas head only — when head_i8 was
        # requested but the geometry is unsupported, fall back to bf16
        # (XLA-i8 on them is a measured loss, PERF.md round-3).
        hsfx = "" if "head_i8" not in fused_sites else "_bf16"
        y = _pad_stride2_halo(y, 32)              # left/top phase halo
        af = (m, inv, p["in1"]["scale"], p["in1"]["bias"], 4)
        tap("c2", _apply_in_relu(y, *af))         # DCE'd when tap is a no-op
        y = _qc("c2" + hsfx, y, p["c2_w"], p["c2_b"], affine=af)
        m, inv = _st("in2", y, 1, 64)
        if _C3_BLOCK and "c3_wb" in p:
            # 2×2 block conv at K=256 on the s2d'd tensor instead of XLA's
            # strided-conv path (~46 TF/s in the round-2c trace); the s2d
            # is a 0.5 GB copy, the pixel-reflect-1 halo is the stride-2
            # phase halo at f2 and rides the copy as fused concat slabs.
            y = _apply_in_relu(y, m, inv, p["in2"]["scale"],
                               p["in2"]["bias"], 1)
            tap("c3", y)
            x3 = _pad_stride2_halo(s2d(y, 2), 64)
            y = conv2d(x3, p["c3_wb"], p["c3_b"])      # [B, H/4, W/4, 128]
        else:
            y = reflect_pad_2d(y, 1)              # plain pixel reflect @540p
            af = (m, inv, p["in2"]["scale"], p["in2"]["bias"], 1)
            tap("c3", _apply_in_relu(y, *af))
            y = _qc("c3" + hsfx, y, p["c3_w"], p["c3_b"], stride=2, affine=af)
        m, inv = _st("in3", y, 1, 128)
        y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)

    use_res_i8 = use_res_s8 = use_dec_i8 = use_dec_s8 = False
    res_carry = None
    if quant is not None and ({"res_i8", "res_s8", "dec_i8", "dec_s8"}
                              & set(fused_sites)):
        from . import s2d2_sites_i8
        have_r = all(f"r{i}{ab}" in quant
                     for i in range(1, 6) for ab in "ab")
        ok_geo = s2d2_sites_i8.res_supported(y.shape[1], y.shape[2])
        if "res_s8" in fused_sites and static_stats is not None:
            # s8-carry chain (frozen norms make every scale static);
            # falls back to res_i8 when stats/geometry don't allow it.
            use_res_s8 = (have_r and ok_geo
                          and all(f"r{i}in{j}" in static_stats
                                  for i in range(1, 6) for j in (1, 2)))
        if "res_i8" in fused_sites and not use_res_s8:
            use_res_i8 = have_r and ok_geo
        have_d = ("d1" in quant and "d2" in quant
                  and s2d2_sites_i8.dec_supported(y.shape[1], y.shape[2]))
        if "dec_s8" in fused_sites and static_stats is not None:
            # d1 emits d2's s8 input (frozen in4 folded); d2s runs at s8
            use_dec_s8 = (have_d and "in4" in static_stats
                          and "in5" in static_stats)
        if "dec_i8" in fused_sites and not use_dec_s8:
            use_dec_i8 = have_d
    use_tail_s8 = False
    if use_dec_s8 and "tail_s8" in fused_sites and "d3" in quant:
        # d2 emits deconv3's s8 input and the fused d3 site + strip
        # fixups replace the whole XLA tail (frozen in5 folded)
        use_tail_s8 = s2d2_sites_i8.d3s8_supported(2 * y.shape[1],
                                                   2 * y.shape[2])
    in_aff = None
    if pend3 is not None:
        m3p, inv3p = pend3
        sc3p = p["in3"]["scale"].astype(jnp.float32)
        bi3p = p["in3"]["bias"].astype(jnp.float32)
        if use_res_s8:
            in_aff = (inv3p * sc3p, bi3p - m3p * inv3p * sc3p)
        else:
            y = _apply_in_relu(y, m3p, inv3p, p["in3"]["scale"],
                               p["in3"]["bias"], 1)
    w0res = y.shape[2]
    if use_res_s8:
        # bridge when the s8 dec chain follows: the last b-site emits
        # d1's s8 input directly (edge column halos)
        y = s2d2_sites_i8.res_chain_s8_static(
            y, p, quant, static_stats, in_aff=in_aff,
            emit_qo=quant["d1"]["qin"] if use_dec_s8 else None)
    elif use_res_i8:
        # all ten res-site convs as Pallas int8 fused kernels: the quantize
        # runs in each kernel's prologue from VMEM (the standalone XLA
        # quantize passes were 56.8 ms/B16 — PERF.md int8 section) and the
        # IN stats ride the epilogue. When the d1 site follows, block 5's
        # residual add folds into it (carry) instead of an HBM pass.
        if use_dec_i8:
            y, res_carry = s2d2_sites_i8.res_chain(y, p, quant,
                                                   ret_carry=True,
                                                   static_stats=static_stats)
        else:
            y = s2d2_sites_i8.res_chain(y, p, quant,
                                        static_stats=static_stats)
    else:
        for i in range(1, 6):
            rp = p[f"res{i}"]
            tap(f"r{i}a", y)
            r = _qc(f"r{i}a", reflect_pad_2d(y, 1), rp["conv1"]["w"], rp["conv1"]["b"])
            m, inv = _st(f"r{i}in1", r, 1, 128)
            r = reflect_pad_2d(r, 1)
            af = (m, inv, rp["in1"]["scale"], rp["in1"]["bias"], 1)
            tap(f"r{i}b", _apply_in_relu(r, *af))
            r = _qc(f"r{i}b", r, rp["conv2"]["w"], rp["conv2"]["b"], affine=af)
            if static_stats is None and stats_out is None:
                y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y
            else:
                # deferred form of the same norm (needed to freeze/record
                # the stats); bf16 dynamic path keeps instance_norm so the
                # exact-parity tests stay byte-stable.
                m2, inv2 = _st(f"r{i}in2", r, 1, 128)
                y = _apply_in_relu(r, m2, inv2, rp["in2"]["scale"],
                                   rp["in2"]["bias"], 1, relu=False) + y

    if use_dec_s8:
        # deconv1+deconv2 on an s8 carry (frozen in4 folded into d1's
        # output quantize; d2s shuffle + edge re-pad run at s8). When
        # the res chain bridged, y is already d1's s8 input.
        from . import s2d2_sites_i8
        tap("d1", y)
        if use_tail_s8:
            y12 = s2d2_sites_i8.dec_chain_s8_static(y, p, quant,
                                                    static_stats,
                                                    w0=w0res, tail=True)
            return d2s(y12, 2, 3)
        y, m, inv = s2d2_sites_i8.dec_chain_s8_static(y, p, quant,
                                                      static_stats,
                                                      w0=w0res)
    elif use_dec_i8:
        # deconv1+deconv2 as Pallas int8 fused sites (edge halos + the in4
        # affine in the d2 kernel's quantize prologue; d2s stays XLA).
        from . import s2d2_sites_i8
        tap("d1", y)
        y, m, inv = s2d2_sites_i8.dec_chain(y, p, quant, carry=res_carry,
                                            static_stats=static_stats)
    else:
        # deconv1: up×2 + conv → f2-of-540p on the 270 grid, then ONE d2s.
        tap("d1", y)
        y = _pad_edge_blocks(y)
        y = _qc("d1", y, p["d1_w"], p["d1_b"])    # [B, H/4, W/4, 256]
        m, inv = _st("in4", y, 4, 64)

        if "tail" in fused_sites:
            from . import s2d2_sites
            if s2d2_sites.tail_supported(h // 2, w // 2):
                # fused deconv2+deconv3: two Pallas sites + XLA perimeter
                # fixup replace every remaining full-tensor elementwise pass.
                y12 = s2d2_sites.tail(y, m, inv, p["in4"], p["d2_w"],
                                      p["d2_b"], p["in5"], p["d3_w"],
                                      p["d3_b"], tap=tap)
                return d2s(y12, 2, 3)

        y = d2s(y, 2, 64)                         # [B, H/2, W/2, 64] = 540p px
        y = _pad_edge_blocks(y)                   # nearest-up edge copies

        # deconv2: 3×3 on the 540 grid → 32ch@1080p as f2 phases.
        af = (m, inv, p["in4"]["scale"], p["in4"]["bias"], 1)
        tap("d2", _apply_in_relu(y, *af))
        y = _qc("d2", y, p["d2_w"], p["d2_b"], affine=af)  # [B,H/2,W/2,128]
        m, inv = _st("in5", y, 4, 32)

    # deconv3: tap-packed — 1×5 conv to 60 lanes on the padded rows, then
    # five shifted slice-adds collapse the kernel-row axis; only output d2s.
    hb = h // 2
    if "d3" in fused_sites:
        from . import s2d2_sites
    use_fused_d3 = ("d3" in fused_sites
                    and s2d2_sites.d3_supported(y.shape[1], y.shape[2]))
    wb = y.shape[2]
    if use_fused_d3:
        # fused kernel: raw phase-reflect halo build (XLA) + Pallas
        # [apply_in5 prologue → 1×5 conv] — the separate apply pass dies.
        sc = p["in5"]["scale"].astype(jnp.float32)
        bi = p["in5"]["bias"].astype(jnp.float32)
        a_ph = jnp.tile(inv * sc, (1, 4))          # (B, 128) phase-invariant
        c_ph = jnp.tile(bi - m * inv * sc, (1, 4))
        tap("d3", y)
        rows = s2d2_sites.d3_rows(
            y, a_ph, c_ph, p["d3_w"],
            pad_fn=lambda t: _pad_reflect_f2_4px(t, 32))
        y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                for dy in range(5))
    elif hb >= 8 and wb >= 8:
        # zero-SAME width pad on the 1×5 rows conv + exact strip fixups —
        # kills the materialized 2-block reflect halo (two dus passes,
        # 6.5 ms/B8 at 1080p, round-2c trace). Only the 2-block border
        # frame of the summed output is wrong (top/bottom rows lack the
        # halo rows in the dy-sum, border cols hit the zero pad); four
        # strip convs over reflect-padded 4-row/4-col slices of the RAW
        # tensor recompute that frame exactly (strip pads cover both axes,
        # so corners are exact).
        def _d3_strip(sl):
            ps = _pad_reflect_f2_4px(sl, 32)
            ps = _apply_in_relu(ps, m, inv, p["in5"]["scale"],
                                p["in5"]["bias"], 4)
            rs = conv2d(ps, p["d3_w"])             # VALID 1×5
            n = rs.shape[1] - 4
            return sum(rs[:, dy : dy + n, :, dy * 12 : (dy + 1) * 12]
                       for dy in range(5))
        top = _d3_strip(y[:, :4])[:, :2]        # (B, 2, W/2, 12)
        bot = _d3_strip(y[:, -4:])[:, -2:]
        lef = _d3_strip(y[:, :, :4])[:, :, :2]  # (B, hb, 2, 12)
        rig = _d3_strip(y[:, :, -4:])[:, :, -2:]
        use_d3_i8 = False
        if "d3_i8" in fused_sites and quant is not None and "d3" in quant:
            from . import s2d2_sites_i8
            use_d3_i8 = s2d2_sites_i8.d3_supported(hb, wb)
        if use_d3_i8:
            # rows conv as a fused int8 site: the in5 affine + ReLU fold
            # into the kernel's quantize prologue (the standalone apply
            # pass dies) and the 1×5 conv rides the int8 MXU. Borders
            # stay strip-fixed, same as the XLA zero-SAME branch.
            qd = quant["d3"]
            scf = p["in5"]["scale"].astype(jnp.float32)
            bif = p["in5"]["bias"].astype(jnp.float32)
            a5 = jnp.tile(inv * scf, (1, 4)) * qd["qin"]
            c5 = jnp.tile(bif - m * inv * scf, (1, 4)) * qd["qin"]
            tap("d3", y)
            K = s2d2_sites_i8.d3_rows_site(
                y, a5, c5, qd["w"].reshape(5, y.shape[-1], -1), qd["ws"])
            rows = jnp.pad(K, ((0, 0), (2, 2), (0, 0), (0, 0)))
        else:
            ya = _apply_in_relu(y, m, inv, p["in5"]["scale"],
                                p["in5"]["bias"], 4)
            tap("d3", ya)
            # XLA int8 d3 is catastrophic (the 60-lane i32 conv output
            # refuses to fuse with the slice-add consumers — s32 OOM at
            # B48; PERF.md), so "d3" in quant ONLY runs through the Pallas
            # sites: when the caller asked for d3_i8/tail_s8 but the
            # geometry is unsupported, fall back to bf16, not XLA-i8.
            d3_site = ("d3" if not ({"d3_i8", "tail_s8"} & set(fused_sites))
                       else "_d3_bf16")
            rows = _qc(d3_site, ya, p["d3_w"], padding=(2, 2))
        y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                for dy in range(5))
        y = y.at[:, :2].set(top)
        y = y.at[:, -2:].set(bot)
        y = y.at[:, :, :2].set(lef)
        y = y.at[:, :, -2:].set(rig)
    else:
        y = _pad_reflect_f2_4px(y, 32)            # 2-block reflect halo
        y = _apply_in_relu(y, m, inv, p["in5"]["scale"], p["in5"]["bias"], 4)
        tap("d3", y)
        rows = conv2d(y, p["d3_w"])               # [B, H/2+4, W/2, 60]
        y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                for dy in range(5))
    y = y + p["d3_b"].astype(y.dtype)             # [B, H/2, W/2, 12]
    return d2s(y, 2, 3)


# ---------------------------------------------------------------------------
# int8 engine mode (opt-in): per-out-channel int8 weights + per-site static
# activation scales, with the FUSION-AWARE structure the round-2 PTQ lacked:
# the quantize rides the existing apply-affine pass (bf16 read, int8 write),
# the int8 conv accumulates in i32 on the MXU's 394-TOPS path, and the
# per-channel dequant folds into the conv's output fusion (raws stay bf16 —
# int8 raws measured slower, experiments/mk22_int8_xla_unit.py: bf16 2.75 /
# int8 1.45 / int8-raws 1.56 ms per res unit). conv1 stays bf16 (shallow
# 12-channel contraction was 4 -> 21 ms in s8, PERF.md round 2).
# ---------------------------------------------------------------------------

#: conv sites that ride int8 (site name -> param key); res sites are
#: (res{i}, conv{1,2}). conv1 stays bf16 (shallow 12-ch contraction was
#: 4 -> 21 ms in s8) and d3 stays bf16: its 60-lane i32 conv output
#: refuses to fuse with the 5-row slice-add consumers, so XLA
#: materializes s32[B,544,960,60] (OOM at B48; +26 ms at B16 —
#: experiments/mk24_ab_int8.py with ONLY_SITES=d3).
QUANT_SITES = ("c2", "c3", "r1a", "r1b", "r2a", "r2b", "r3a", "r3b",
               "r4a", "r4b", "r5a", "r5b", "d1", "d2")

#: sites that additionally ride int8 when their Pallas fused kernel is on
#: (models/s2d2_sites_i8) — NEVER through the XLA _qc path (see the d3
#: branch note in apply).
QUANT_SITES_PALLAS = QUANT_SITES + ("d3",)


def _site_weight(bp: dict, site: str):
    if site.startswith("r"):
        i, ab = int(site[1]), site[2]
        rp = bp[f"res{i}"][f"conv{'1' if ab == 'a' else '2'}"]
        return rp["w"]
    return bp[f"{site}_w"]


def calibrate_act_scales(bp: dict, x_cal: jnp.ndarray,
                         sites: tuple = QUANT_SITES,
                         static_stats: dict | None = None) -> dict:
    """Per-site max|activation| from ONE jitted calibration forward: the tap
    hook fires at trace time with exactly the tensor each conv consumes
    (halos copy values, so maxima agree).

    Note the "d3" tap fires with the APPLIED (post-in5) tensor in the XLA
    branch but the RAW tensor under d3_i8 — calibration always runs with
    fused_sites=() so the scale is the applied maximum either way.

    static_stats: calibrate against the STATIC-NORM graph instead (the
    int8_static mode quantizes that graph, so its maxima are the right
    ones)."""
    def run(x):
        vals: dict = {}

        def tap(site, t):
            if site in sites:
                vals[site] = jnp.max(jnp.abs(t.astype(jnp.float32)))

        apply(bp, x, tap=tap, static_stats=static_stats)
        return vals

    out = jax.jit(run)(x_cal)
    return {k: float(v) for k, v in out.items()}


def calibrate_in_stats(bp: dict, x_cal: jnp.ndarray) -> dict:
    """Frozen per-site instance-norm ``(mean, inv)`` from ONE jitted f32
    calibration forward — the STATIC-NORM mode's statistics
    (``apply(..., static_stats=...)``).

    Freezing IN is a deliberate quality trade (the reference's IN is
    per-image by definition, /root/reference/transformer_net.py:4-33);
    the engine calibrates on the job's own first batch and gates output
    MAE, so drift only comes from frame-to-frame statistics motion within
    one video. Stats are averaged over the calibration batch (shape
    (1, C)) so any runtime batch broadcasts."""
    def run(x):
        so: dict = {}
        apply(bp, x, stats_out=so)
        return {k: (jnp.mean(mv[0], axis=0, keepdims=True),
                    jnp.mean(mv[1], axis=0, keepdims=True))
                for k, mv in so.items()}

    out = jax.jit(run)(x_cal.astype(jnp.float32))
    return {k: (jnp.asarray(m, jnp.float32), jnp.asarray(iv, jnp.float32))
            for k, (m, iv) in out.items()}


def quantize_net(bp: dict, act_scales: dict) -> dict:
    """Build the ``quant=`` dict for ``apply``: per-out-channel symmetric
    int8 weights; the activation scale folds into both the input quantizer
    (qin = 127/A) and the dequant row (ws = w_scale * A / 127)."""
    q = {}
    for site in act_scales:
        w = np.asarray(_site_weight(bp, site), np.float32)
        ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
        wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
        a = max(float(act_scales[site]), 1e-6)
        q[site] = {
            "w": jnp.asarray(wq),
            "ws": jnp.asarray(ws * (a / 127.0), jnp.float32),
            "qin": jnp.float32(127.0 / a),
        }
    return q
