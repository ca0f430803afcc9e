"""NST_Train TransformerNet in f=2 block form — the TPU speed path for the
``down1.``-keyed checkpoints (weight-ladder families).

Same math as models/transformer_net_nst.apply (reference:
transformer_net_nst.py:12-127): global ReflectionPad2d(40), zero-padded
convs, ConvTranspose2d(k3 s2 p1 op1) upsampling, crop-back. Because every
conv is ZERO padded, the f=2 restructure needs no halo builds or border
fixups at all — the pads ride the convs — and the instance norms are exact
over the padded tensor (the reference also normalizes over the pad region).
The transposed convs reuse io/t7_fast's phase scatter; conv1/final reuse
the s2d2 scatters. ~5x the naive NHWC form at 1080p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from .transformer_net_s2d import (
    _apply_in_relu,
    _in_stats,
    _scatter_stride2_s2d2,
    d2s,
    s2d,
)
from .transformer_net_s2d2 import _scatter_k9_f2

_PAD = 40


def from_nst_params(p: dict) -> dict:
    """Reference-layout NST params → f=2 block-space params."""
    from ..io.t7_fast import _scatter_convT_f2

    g = lambda a: np.asarray(a, np.float32)  # noqa: E731
    out: dict = {}
    out["c1_w"] = _scatter_k9_f2(g(p["down1"]["conv"]["w"]))
    out["c1_b"] = np.tile(g(p["down1"]["conv"]["b"]), 4)
    out["in1"] = {k: g(v) for k, v in p["down1"]["norm"].items()}
    out["c2_w"] = _scatter_stride2_s2d2(g(p["down2"]["conv"]["w"]))
    out["c2_b"] = g(p["down2"]["conv"]["b"])
    out["in2"] = {k: g(v) for k, v in p["down2"]["norm"].items()}
    out["c3_w"] = g(p["down3"]["conv"]["w"])
    out["c3_b"] = g(p["down3"]["conv"]["b"])
    out["in3"] = {k: g(v) for k, v in p["down3"]["norm"].items()}
    for i in range(1, 6):
        out[f"res{i}"] = jax.tree.map(g, p[f"res{i}"])
    for name, tag in (("up1", "d1"), ("up2", "d2")):
        w = g(p[name]["conv"]["w"])               # (3,3,cout,cin)
        wb, (lo, hi) = _scatter_convT_f2(w, 3, 1, 1)
        out[f"{tag}_w"] = wb
        out[f"{tag}_b"] = np.tile(g(p[name]["conv"]["b"]), 4)
        out[f"{tag}_pad"] = (lo, hi)
        out[f"in_{tag}"] = {k: g(v) for k, v in p[name]["norm"].items()}
    w5 = _scatter_k9_f2(g(p["final"]["w"]))       # (5,5,128,12)
    w_row = np.zeros((1, 5, w5.shape[2], 60), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * 12 : (dy + 1) * 12] = w5[dy]
    out["d3_w"] = w_row
    out["d3_b"] = np.tile(g(p["final"]["b"]), 4)
    res = {}
    for k, v in out.items():
        if isinstance(v, tuple):
            res[k] = v
        else:
            res[k] = jax.tree.map(jnp.asarray, v)
    return res


def _frozen(static_stats, site):
    """Frozen (mean, inv) for ``site`` from the static-norm stats dict, or
    ``None`` when the site is dynamic."""
    if static_stats is not None and site in static_stats:
        ms, invs = static_stats[site]
        return ms.astype(jnp.float32), invs.astype(jnp.float32)
    return None


def _res_quant_xla(y, p, quant, static_stats=None):
    """XLA int8 res chain — the parity reference and CPU fallback (every
    site pays a standalone HBM quantize pass under XLA, the measured int8
    structural loss; TPU runs _res_chain_i8 instead). Matches the exact
    path's structure: deferred-IN stats over the bf16-rounded conv
    outputs, ReLU folded into the b-site's quantize clamp floor."""
    from ..ops.conv import conv2d_i8

    def stats_affine(r, nrm, q, site):
        fz = _frozen(static_stats, site)
        m, inv = fz if fz is not None else _in_stats(r, 1, 128)
        sc = nrm["scale"].astype(jnp.float32)
        bi = nrm["bias"].astype(jnp.float32)
        a = (inv * sc)[:, None, None, :]
        c = (bi[None] - m * inv * sc)[:, None, None, :]
        if q is not None:
            a, c = a * q["qin"], c * q["qin"]
        return a, c

    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        xq = jnp.clip(jnp.round(y.astype(jnp.float32) * qa["qin"]),
                      -127.0, 127.0).astype(jnp.int8)
        ra = (conv2d_i8(xq, qa["w"], padding=1).astype(jnp.float32)
              * qa["ws"]
              + rp["conv1"]["b"].astype(jnp.float32)).astype(y.dtype)
        a1, c1 = stats_affine(ra, rp["norm1"], qb, f"r{i}in1")
        rq = jnp.clip(jnp.round(ra.astype(jnp.float32) * a1 + c1),
                      0.0, 127.0).astype(jnp.int8)   # ReLU folds into lo=0
        rb = (conv2d_i8(rq, qb["w"], padding=1).astype(jnp.float32)
              * qb["ws"]
              + rp["conv2"]["b"].astype(jnp.float32)).astype(y.dtype)
        a2, c2 = stats_affine(rb, rp["norm2"], None, f"r{i}in2")
        y = (rb.astype(jnp.float32) * a2 + c2).astype(y.dtype) + y
    return y


def _res_chain_i8(y, p, quant, static_stats=None):
    """The five res blocks as Pallas fused int8 sites (zero halos; each
    residual add folds into the next a-site's prologue). Non-%8 widths
    (e.g. 500 at 1080p on the pad-40 grid) are zero-padded up once — the
    kernels mask the padding columns at quantize and exclude them from
    the deferred-IN stats (sw)."""
    from . import s2d2_sites_i8 as si8

    B, H, W0c, C = y.shape
    dt = y.dtype
    sw = None
    if W0c % 8:
        wp = ((W0c + 7) // 8) * 8
        y = jnp.pad(y, ((0, 0), (0, 0), (0, wp - W0c), (0, 0)))
        sw = W0c
    n = float(H * W0c)
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)

    def _site_stats(site, sout, nn):
        fz = _frozen(static_stats, site)
        if fz is not None:
            ms, invs = fz
            return (jnp.broadcast_to(ms, (B, ms.shape[-1])),
                    jnp.broadcast_to(invs, (B, invs.shape[-1])))
        return si8._stats(sout, nn)

    carry = None
    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        aq = ones * qa["qin"]
        b1 = rp["conv1"]["b"].astype(jnp.float32)
        w9a = qa["w"].reshape(9, C, C)
        w9b = qb["w"].reshape(9, C, C)
        if carry is None:
            r, sout = si8.res_site(y, aq, zeros, w9a, qa["ws"], b1,
                                   -127.0, halo="zero", sw=sw)
        else:
            r2p, a2p, c2p = carry
            r, sout, y = si8.res_site_skip(r2p, y, aq, zeros, a2p, c2p,
                                           w9a, qa["ws"], b1, -127.0,
                                           halo="zero", sw=sw)
        m, inv = _site_stats(f"r{i}in1", sout, n)
        sc = rp["norm1"]["scale"].astype(jnp.float32)
        bi = rp["norm1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * qb["qin"]
        c_eff = (bi - m * inv * sc) * qb["qin"]
        r2, sout2 = si8.res_site(r, a_eff, c_eff, w9b, qb["ws"],
                                 rp["conv2"]["b"].astype(jnp.float32), 0.0,
                                 halo="zero", sw=sw)
        m2, inv2 = _site_stats(f"r{i}in2", sout2, n)
        sc2 = rp["norm2"]["scale"].astype(jnp.float32)
        bi2 = rp["norm2"]["bias"].astype(jnp.float32)
        carry = (r2, inv2 * sc2, bi2 - m2 * inv2 * sc2)
    r2, a2, c2 = carry
    y = ((r2.astype(jnp.float32) * a2[:, None, None, :]
          + c2[:, None, None, :]).astype(y.dtype) + y).astype(dt)
    if sw is not None:
        y = y[:, :, :sw]
    return y


def _res_chain_s8_static(y, p, quant, static_stats, emit_qo=None):
    """The five NST res blocks on end-to-end s8 carries with FROZEN
    instance norms (--quantize int8_static with "res_s8" adopted for the
    nst_static set).

    Zero-halo variant of s2d2_sites_i8.res_chain_s8_static: every NST conv
    is zero-padded (reference: transformer_net_nst.py:12-127), so the
    carry's column halos are zero codes and non-%8 widths (500 on the
    1080p pad-40 grid) pad to %8 with the kernels masking BOTH the
    quantize and the emitted codes beyond ``sw`` — junk never enters a
    dot. The a-site emits the b-site's s8 input directly (frozen norm1
    affine + ReLU folded into the output quantize; the bf16 a-raw never
    exists in HBM); the b-site applies the frozen norm2 affine post-round
    and folds the residual add. Matches the XLA static int8 reference
    (_res_quant_xla with static_stats) to bf16 rounding.

    emit_qo: when set (the dec-s8 extension), the LAST b-site also
    quantizes its combine output at this static scale and the chain
    returns deconv1's s8 input (B, H, WPS, C) instead of bf16 — the
    res-chain output never exists in HBM either."""
    from . import s2d2_sites_i8 as si8

    B, H, W0c, C = y.shape
    dt = y.dtype
    sw = None
    if W0c % 8:
        wp = ((W0c + 7) // 8) * 8
        y = jnp.pad(y, ((0, 0), (0, 0), (0, wp - W0c), (0, 0)))
        sw = W0c
    W0 = y.shape[2]
    zeros = jnp.zeros((B, C), jnp.float32)
    for i in range(1, 6):
        rp = p[f"res{i}"]
        qa_, qb_ = quant[f"r{i}a"], quant[f"r{i}b"]
        m1, inv1 = (s.astype(jnp.float32) for s in static_stats[f"r{i}in1"])
        m2, inv2 = (s.astype(jnp.float32) for s in static_stats[f"r{i}in2"])
        sc1 = rp["norm1"]["scale"].astype(jnp.float32)
        bi1 = rp["norm1"]["bias"].astype(jnp.float32)
        sc2 = rp["norm2"]["scale"].astype(jnp.float32)
        bi2 = rp["norm2"]["bias"].astype(jnp.float32)
        # the b-site input quantize, exactly as _res_quant_xla computes it
        qA = ((inv1 * sc1) * qb_["qin"])[0]            # (C,)
        qC = ((bi1 - m1 * inv1 * sc1) * qb_["qin"])[0]
        aq = jnp.full((B, C), qa_["qin"], jnp.float32)
        qx = si8.res_site_s8o(y, aq, zeros, qa_["w"].reshape(9, C, C),
                              qa_["ws"],
                              rp["conv1"]["b"].astype(jnp.float32),
                              qa=qA, qc=qC, lo=-127.0, qlo=0.0,
                              halo="zero", sw=sw)
        aff = ((inv2 * sc2)[0], (bi2 - m2 * inv2 * sc2)[0])
        if emit_qo is not None and i == 5:
            return si8.site_s8(qx, qb_["w"].reshape(9, C, C), qb_["ws"],
                               rp["conv2"]["b"].astype(jnp.float32), w0=W0,
                               y=y, aff=aff, qo=emit_qo, qlo=-127.0,
                               halo="zero", sw=sw)
        y = si8.site_s8(qx, qb_["w"].reshape(9, C, C), qb_["ws"],
                        rp["conv2"]["b"].astype(jnp.float32), w0=W0, y=y,
                        aff=aff, halo="zero", sw=sw)
    if sw is not None:
        y = y[:, :, :sw]
    return y.astype(dt)


def _dec_s8_static(xq, p, quant, static_stats, w0c, dt, tail=False):
    """deconv1+deconv2 on an s8 carry with FROZEN norms ("dec_s8" under
    int8_static): deconv1 consumes the res chain's s8 output and emits
    deconv2's s8 input directly — the frozen in4 affine + ReLU fold into
    the output quantize (tiled ×4 to the phase-major block channels;
    quantizing BEFORE the d2s shuffle commutes with the permutation, the
    .t7 dec-s8 argument) — so neither the res-chain output nor the d1 raw
    ever exists in HBM as bf16. d2 emits the bf16 raw and the frozen in5
    affine + ReLU run in XLA. w0c: pre-pad content width of the res grid
    (non-%8 widths carry masked zero codes beyond sw, so the doubled d2
    grid's content is 2·sw).

    tail: "tail_s8" — d2 instead emits the tap-packed output conv's s8
    input (frozen in5 affine + ReLU folded into the emit quantize,
    "zero2" zero-SAME layout; masked codes beyond the content width stay
    zero, so the 1x5 conv reads true zero-SAME pads at the crop seam —
    exactly what the XLA path sees after its crop) and the fused
    d3_s8_site collapses the dy-sum in VMEM; returns the (B, hp/2,
    2·w0c, 12) bf16 pre-d2s tensor."""
    from ..io.t7_fast import _dec_kform
    from . import s2d2_sites_i8 as si8

    q1, q2 = quant["d1"], quant["d2"]
    kh1, pt1 = _dec_kform(p["d1_pad"])
    kh2, pt2 = _dec_kform(p["d2_pad"])
    sw = w0c if w0c % 8 else None
    w0 = ((w0c + 7) // 8) * 8
    C = 128
    m4, inv4 = (s.astype(jnp.float32) for s in static_stats["in4"])
    sc4 = p["in_d1"]["scale"].astype(jnp.float32)
    bi4 = p["in_d1"]["bias"].astype(jnp.float32)
    qA = jnp.tile(((inv4 * sc4) * q2["qin"])[0], 4)          # (256,)
    qC = jnp.tile(((bi4 - m4 * inv4 * sc4) * q2["qin"])[0], 4)
    w1 = q1["w"].reshape(kh1 * kh1, C, -1)
    r8 = si8.site_s8(xq, w1, q1["ws"], p["d1_b"].astype(jnp.float32),
                     w0=w0, qa=qA, qc=qC, qlo=0.0, kh=kh1, kw=kh1,
                     pt=pt1, pl_=pt1, sw=sw)
    yd = d2s(r8[:, :, 1:w0 + 1], 2, 64)                      # s8 shuffle
    w02 = 2 * w0
    wps2 = si8._wps(w02)
    yd = jnp.pad(yd, ((0, 0), (0, 0), (1, wps2 - w02 - 1), (0, 0)))
    w2 = q2["w"].reshape(kh2 * kh2, 64, -1)
    m5, inv5 = (s.astype(jnp.float32) for s in static_stats["in5"])
    sc5 = p["in_d2"]["scale"].astype(jnp.float32)
    bi5 = p["in_d2"]["bias"].astype(jnp.float32)
    a5 = jnp.tile(inv5 * sc5, (1, 4))[0]                     # (128,)
    b5 = jnp.tile(bi5[None] - m5 * inv5 * sc5, (1, 4))[0]
    if tail:
        q3 = quant["d3"]
        qd3 = si8.site_s8(yd, w2, q2["ws"], p["d2_b"].astype(jnp.float32),
                          w0=w02, kh=kh2, kw=kh2, pt=pt2, pl_=pt2,
                          qa=(a5 * q3["qin"]).astype(jnp.float32),
                          qc=(b5 * q3["qin"]).astype(jnp.float32),
                          qlo=0.0, halo_out="zero2",
                          sw=2 * sw if sw is not None else None)
        y12 = si8.d3_s8_site(qd3, q3["w"].reshape(5, C, -1), q3["ws"],
                             p["d3_b"].astype(jnp.float32), w0=w02)
        return y12 if sw is None else y12[:, :, :2 * sw]
    r2 = si8.site_s8(yd, w2, q2["ws"], p["d2_b"].astype(jnp.float32),
                     w0=w02, kh=kh2, kw=kh2, pt=pt2, pl_=pt2)
    if sw is not None:
        r2 = r2[:, :, :2 * sw]
    return jax.nn.relu(r2.astype(jnp.float32) * a5[None, None, None]
                       + b5[None, None, None]).astype(dt)


def _dec_quant_xla(y, p, quant, static_stats=None, tail=False):
    """XLA int8 deconv1+deconv2 — the parity reference for _dec_i8.

    tail: continue as the parity reference for the fused s8 tail —
    quantize the output conv's input from the d2 RAW with the frozen
    in5 affine folded (one f32 affine, mirroring the kernel's emit;
    quantizing the *activated bf16* instead would double-round), then
    the integer 1x5 rows conv + f32 dy-sum; returns the 12-lane
    pre-d2s tensor."""
    from ..ops.conv import conv2d_i8

    q1, q2 = quant["d1"], quant["d2"]
    pd = tuple(p["d1_pad"])
    xq = jnp.clip(jnp.round(y.astype(jnp.float32) * q1["qin"]),
                  -127.0, 127.0).astype(jnp.int8)
    r = (conv2d_i8(xq, q1["w"], padding=(pd, pd)).astype(jnp.float32)
         * q1["ws"] + p["d1_b"].astype(jnp.float32)).astype(y.dtype)
    m, inv = _frozen(static_stats, "in4") or _in_stats(r, 4, 64)
    yd = d2s(r, 2, 64)
    sc = p["in_d1"]["scale"].astype(jnp.float32)
    bi = p["in_d1"]["bias"].astype(jnp.float32)
    a1 = ((inv * sc) * q2["qin"])[:, None, None, :]
    c1 = ((bi[None] - m * inv * sc) * q2["qin"])[:, None, None, :]
    rq = jnp.clip(jnp.round(yd.astype(jnp.float32) * a1 + c1),
                  0.0, 127.0).astype(jnp.int8)
    pd2 = tuple(p["d2_pad"])
    r2 = (conv2d_i8(rq, q2["w"], padding=(pd2, pd2)).astype(jnp.float32)
          * q2["ws"] + p["d2_b"].astype(jnp.float32)).astype(y.dtype)
    m2, inv2 = _frozen(static_stats, "in5") or _in_stats(r2, 4, 32)
    if tail:
        q3 = quant["d3"]
        sc2 = p["in_d2"]["scale"].astype(jnp.float32)
        bi2 = p["in_d2"]["bias"].astype(jnp.float32)
        a5 = jnp.tile((inv2 * sc2) * q3["qin"], (1, 4))      # (1, 128)
        b5 = jnp.tile((bi2[None] - m2 * inv2 * sc2) * q3["qin"], (1, 4))
        qd3 = jnp.clip(jnp.round(r2.astype(jnp.float32)
                                 * a5[:, None, None, :]
                                 + b5[:, None, None, :]),
                       0.0, 127.0).astype(jnp.int8)
        K = conv2d_i8(qd3, q3["w"], padding=((2, 2), (2, 2)))
        K = (K.astype(jnp.float32) * q3["ws"]).astype(jnp.bfloat16)
        H2 = r2.shape[1]
        y12 = sum(K[:, dy:dy + H2, :, dy * 12:(dy + 1) * 12]
                  .astype(jnp.float32) for dy in range(5))
        return (y12 + p["d3_b"].astype(jnp.float32)).astype(jnp.bfloat16)
    return _apply_in_relu(r2, m2, inv2, p["in_d2"]["scale"],
                          p["in_d2"]["bias"], 4)


def _dec_i8(y, p, quant, static_stats=None):
    """deconv1+deconv2 as fused int8 sites (the t7 structure with
    always-present deferred INs): KHxKW zero-halo block kernels, stats
    from the kernel epilogues, d2s in XLA. Non-%8 widths pad up with sw
    masking — d2s keeps the padding columns contiguous at the right edge
    (it doubles column positions), so the d2 site runs sw*2."""
    from ..io.t7_fast import _dec_kform
    from . import s2d2_sites_i8 as si8

    B, H, W0c, C = y.shape
    dt = y.dtype
    q1, q2 = quant["d1"], quant["d2"]
    kh1, pt1 = _dec_kform(p["d1_pad"])
    kh2, pt2 = _dec_kform(p["d2_pad"])
    sw = None
    if W0c % 8:
        wp = ((W0c + 7) // 8) * 8
        y = jnp.pad(y, ((0, 0), (0, 0), (0, wp - W0c), (0, 0)))
        sw = W0c
    n = float(H * W0c)
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)

    def _phased_stats(site, sout, nn, phases, c):
        fz = _frozen(static_stats, site)
        if fz is not None:
            ms, invs = fz
            return (jnp.broadcast_to(ms, (B, ms.shape[-1])),
                    jnp.broadcast_to(invs, (B, invs.shape[-1])))
        return si8._stats_phased(sout, nn, phases, c)

    w1 = q1["w"].reshape(kh1 * kh1, C, -1)
    r, sout = si8.res_site(y, ones * q1["qin"], zeros, w1, q1["ws"],
                           p["d1_b"].astype(jnp.float32), -127.0,
                           halo="zero", kh=kh1, kw=kh1, pt=pt1, pl_=pt1,
                           sw=sw)
    m, inv = _phased_stats("in4", sout, n, 4, 64)
    yd = d2s(r, 2, 64)
    sc = p["in_d1"]["scale"].astype(jnp.float32)
    bi = p["in_d1"]["bias"].astype(jnp.float32)
    a_eff = (inv * sc) * q2["qin"]
    c_eff = (bi - m * inv * sc) * q2["qin"]
    w2 = q2["w"].reshape(kh2 * kh2, 64, -1)
    r2, sout2 = si8.res_site(yd, a_eff, c_eff, w2, q2["ws"],
                             p["d2_b"].astype(jnp.float32), 0.0,
                             halo="zero", kh=kh2, kw=kh2, pt=pt2, pl_=pt2,
                             sw=None if sw is None else 2 * sw)
    m2, inv2 = _phased_stats("in5", sout2, 4.0 * n, 4, 32)
    if sw is not None:
        r2 = r2[:, :, :2 * sw]
    sc2 = p["in_d2"]["scale"].astype(jnp.float32)
    bi2 = p["in_d2"]["bias"].astype(jnp.float32)
    a2 = jnp.tile(inv2 * sc2, (1, 4))[:, None, None, :]
    b2 = jnp.tile(bi2[None] - m2 * inv2 * sc2, (1, 4))[:, None, None, :]
    return jax.nn.relu(r2.astype(jnp.float32) * a2 + b2).astype(dt)


def calibrate_act_scales(p: dict, x_cal, static_stats: dict | None = None) -> dict:
    """Per-res-site max|activation| from one jitted f32 forward (x_cal:
    raw_01 NHWC, H, W divisible by 4). Same contract as
    transformer_net_s2d2.calibrate_act_scales.

    static_stats: calibrate against the STATIC-NORM graph (the int8_static
    mode quantizes that graph, so its maxima are the right ones)."""

    def run(x):
        vals: dict = {}

        def tap(site, t):
            vals[site] = jnp.max(jnp.abs(t.astype(jnp.float32)))

        apply(p, x, tap=tap, static_stats=static_stats)
        return vals

    out = jax.jit(run)(x_cal)
    return {k: float(v) for k, v in out.items()}


def calibrate_in_stats(p: dict, x_cal) -> dict:
    """Frozen per-site instance-norm ``(mean, inv)`` from ONE jitted f32
    calibration forward — the STATIC-NORM mode's statistics (same contract
    as transformer_net_s2d2.calibrate_in_stats; x_cal is the PREPROCESSED
    raw_01 input). Stats average over the calibration batch (shape (1, C))
    so any runtime batch broadcasts."""

    def run(x):
        so: dict = {}
        apply(p, x, stats_out=so)
        return {k: (jnp.mean(mv[0], axis=0, keepdims=True),
                    jnp.mean(mv[1], axis=0, keepdims=True))
                for k, mv in so.items()}

    out = jax.jit(run)(x_cal.astype(jnp.float32))
    return {k: (jnp.asarray(m, jnp.float32), jnp.asarray(iv, jnp.float32))
            for k, (m, iv) in out.items()}


def quantize_net(p: dict, act_scales: dict) -> dict:
    """Per-out-channel symmetric int8 res-chain weights + folded
    activation scales — the transformer_net_s2d2.quantize_net contract."""
    from .s2d2_sites_i8 import quantize_site as qsite

    q = {}
    for i in range(1, 6):
        rp = p[f"res{i}"]
        for ab, ck in (("a", "conv1"), ("b", "conv2")):
            site = f"r{i}{ab}"
            if site in act_scales:
                q[site] = qsite(np.asarray(rp[ck]["w"], np.float32),
                                act_scales[site])
    for site, wk in (("c2", "c2_w"), ("d1", "d1_w"), ("d2", "d2_w"),
                     ("d3", "d3_w")):
        if site in act_scales:
            q[site] = qsite(np.asarray(p[wk], np.float32), act_scales[site])
    return q


def apply(params: dict, x: jnp.ndarray, *, tap=None, quant=None,
          fused_sites=(), static_stats: dict | None = None,
          stats_out: dict | None = None) -> jnp.ndarray:
    """Forward pass, same contract as transformer_net_nst.apply (raw_01 in,
    cropped to input size). H, W divisible by 4.

    quant: optional quantize_net output — the res chain runs int8 (Pallas
    fused sites when "res_i8" in fused_sites and the geometry supports it,
    XLA int8 otherwise). tap: calibration hook (site, tensor).

    static_stats: optional ``{site: (mean, inv)}`` (sites ``in1..in5``,
    ``r{i}in1``/``r{i}in2`` — calibrate_in_stats) freezing every instance
    norm to calibration-time statistics: the STATIC-NORM engine modes
    (``--quantize bf16_static`` / ``int8_static``). Because every NST conv
    is zero-padded and the reference normalizes over the pad region too
    (reference: transformer_net_nst.py:12-127), freezing is structurally
    identical to the Johnson s2d2 case. stats_out: optional dict filled
    with each measured ``(mean, inv)`` — the calibration hook."""
    p = params
    n, h, w, _ = x.shape
    if tap is None:
        tap = lambda name, t: None  # noqa: E731

    def _st(site, t, phases, c):
        fz = _frozen(static_stats, site)
        if fz is not None:
            return fz
        ms, invs = _in_stats(t, phases, c)
        if stats_out is not None:
            stats_out[site] = (ms, invs)
        return ms, invs

    xp = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)),
                 mode="reflect")
    hp = h + 2 * _PAD
    y = s2d(xp, 2)                                # [B, hp/2, wp/2, 12]
    y = conv2d(y, p["c1_w"], p["c1_b"], padding=2)
    m, inv = _st("in1", y, 4, 32)
    y = _apply_in_relu(y, m, inv, p["in1"]["scale"], p["in1"]["bias"], 4)

    use_c2_i8 = False
    if quant is not None and "c2" in quant and "c2_i8" in fused_sites:
        from . import s2d2_sites_i8 as si8
        use_c2_i8 = si8.res_supported(y.shape[1], y.shape[2])
    if use_c2_i8:
        # stride-2 scatter form = 2x2 block conv with (1, 0) zero pads:
        # KH=KW=2/PT=PL=1 on the zero-halo site (left halo column and
        # zeroed head strip ARE the pads); the deferred in2 stats ride
        # the epilogue. Gated to %8 widths (1080p's pad-40 grid is 1000).
        from . import s2d2_sites_i8 as si8
        q2 = quant["c2"]
        B2, Hc, Wc, Cin = y.shape
        aq = jnp.full((B2, Cin), float(q2["qin"]), jnp.float32)
        cq = jnp.zeros((B2, Cin), jnp.float32)
        r, sout = si8.res_site(y, aq, cq, q2["w"].reshape(4, Cin, -1),
                               q2["ws"], p["c2_b"].astype(jnp.float32),
                               -127.0, halo="zero", kh=2, kw=2, pt=1, pl_=1)
        fz = _frozen(static_stats, "in2")
        m, inv = fz if fz is not None else si8._stats(sout, float(Hc * Wc))
        sc = p["in2"]["scale"].astype(jnp.float32)
        bi = p["in2"]["bias"].astype(jnp.float32)
        y = jax.nn.relu(
            r.astype(jnp.float32) * (inv * sc)[:, None, None, :]
            + (bi[None] - m * inv * sc)[:, None, None, :]).astype(y.dtype)
    else:
        tap("c2", y)
        y = conv2d(y, p["c2_w"], p["c2_b"], padding=((1, 0), (1, 0)))
        m, inv = _st("in2", y, 1, 64)
        y = _apply_in_relu(y, m, inv, p["in2"]["scale"], p["in2"]["bias"], 1)

    y = conv2d(y, p["c3_w"], p["c3_b"], stride=2, padding=1)
    m, inv = _st("in3", y, 1, 128)
    y = _apply_in_relu(y, m, inv, p["in3"]["scale"], p["in3"]["bias"], 1)

    use_q = quant is not None and all(
        f"r{i}{ab}" in quant for i in range(1, 6) for ab in "ab")
    use_res_i8 = use_res_s8 = False
    if use_q and {"res_i8", "res_s8"} & set(fused_sites):
        from . import s2d2_sites_i8 as si8
        # width pads up to %8 in-chain (sw), so only H gates here
        ok_geo = (si8._pick_ts(y.shape[1]) is not None
                  and y.shape[1] >= 8 and y.shape[2] >= 16)
        if "res_s8" in fused_sites and static_stats is not None:
            # s8-carry chain (frozen norms make every scale static);
            # falls back to res_i8 when stats/geometry don't allow it
            use_res_s8 = (ok_geo
                          and all(f"r{i}in{j}" in static_stats
                                  for i in range(1, 6) for j in (1, 2)))
        if "res_i8" in fused_sites and not use_res_s8:
            use_res_i8 = ok_geo
    use_dec_s8 = False
    if (use_res_s8 and "dec_s8" in fused_sites
            and "d1" in quant and "d2" in quant):
        from ..io.t7_fast import _dec_kform
        from . import s2d2_sites_i8 as si8
        use_dec_s8 = ("in4" in static_stats and "in5" in static_stats
                      and si8._pick_ts(2 * y.shape[1]) is not None
                      and _dec_kform(p["d1_pad"]) is not None
                      and _dec_kform(p["d2_pad"]) is not None)
    use_tail_s8 = False
    if use_dec_s8 and "tail_s8" in fused_sites and "d3" in quant:
        from . import s2d2_sites_i8 as si8
        # tail grid: (hp/2, 2·w0) — w0 is the %8-padded res width
        use_tail_s8 = si8.d3s8_supported(
            2 * y.shape[1], 2 * (((y.shape[2] + 7) // 8) * 8))
    if use_dec_s8:
        w0c, dtv = y.shape[2], y.dtype
        xq = _res_chain_s8_static(y, p, quant, static_stats,
                                  emit_qo=quant["d1"]["qin"])
        y = _dec_s8_static(xq, p, quant, static_stats, w0c, dtv,
                           tail=use_tail_s8)
    elif use_res_s8:
        y = _res_chain_s8_static(y, p, quant, static_stats)
    elif use_res_i8:
        y = _res_chain_i8(y, p, quant, static_stats)
    elif use_q and not ({"res_i8", "res_s8"} & set(fused_sites)):
        # CPU/parity XLA-int8 branch; a requested-but-unsupported fused
        # chain falls through to bf16 (XLA-i8 is the measured loss)
        y = _res_quant_xla(y, p, quant, static_stats)
    else:
        for i in range(1, 6):
            rp = p[f"res{i}"]
            tap(f"r{i}a", y)
            r = conv2d(y, rp["conv1"]["w"], rp["conv1"]["b"], padding=1)
            m, inv = _st(f"r{i}in1", r, 1, 128)
            r = _apply_in_relu(r, m, inv, rp["norm1"]["scale"],
                               rp["norm1"]["bias"], 1)
            tap(f"r{i}b", r)
            r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"], padding=1)
            m, inv = _st(f"r{i}in2", r, 1, 128)
            r = _apply_in_relu(r, m, inv, rp["norm2"]["scale"],
                               rp["norm2"]["bias"], 1, relu=False)
            y = r + y

    use_dec_i8 = use_dec_xla = False
    if (not use_dec_s8 and quant is not None
            and "d1" in quant and "d2" in quant):
        if "dec_i8" in fused_sites:
            from ..io.t7_fast import _dec_kform
            from . import s2d2_sites_i8 as si8
            use_dec_i8 = (si8._pick_ts(y.shape[1]) is not None
                          and si8._pick_ts(2 * y.shape[1]) is not None
                          and y.shape[1] >= 8 and y.shape[2] >= 16
                          and _dec_kform(p["d1_pad"]) is not None
                          and _dec_kform(p["d2_pad"]) is not None)
        use_dec_xla = not use_dec_i8 and "dec_xla_i8" in fused_sites
    use_tail_xla = (use_dec_xla and "tail_xla_i8" in fused_sites
                    and quant is not None and "d3" in quant)
    if use_dec_s8:
        pass  # deconv1/2 already ran on the s8 carry above
    elif use_dec_i8:
        y = _dec_i8(y, p, quant, static_stats)
    elif use_dec_xla:
        y = _dec_quant_xla(y, p, quant, static_stats, tail=use_tail_xla)
    else:
        tap("d1", y)
        pd = p["d1_pad"]
        y = conv2d(y, p["d1_w"], p["d1_b"], padding=(pd, pd))
        m, inv = _st("in4", y, 4, 64)
        y = d2s(y, 2, 64)                         # [B, hp/2, wp/2, 64]
        y = _apply_in_relu(y, m, inv, p["in_d1"]["scale"],
                           p["in_d1"]["bias"], 1)
        tap("d2", y)
        pd = p["d2_pad"]
        y = conv2d(y, p["d2_w"], p["d2_b"], padding=(pd, pd))
        m, inv = _st("in5", y, 4, 32)
        y = _apply_in_relu(y, m, inv, p["in_d2"]["scale"],
                           p["in_d2"]["bias"], 4)

    hb = hp // 2
    if use_tail_s8 or use_tail_xla:
        pass                                      # y IS the 12-lane tensor
    else:
        tap("d3", y)
        rows = conv2d(y, p["d3_w"], padding=(2, 2))  # [B, hp/2+4, wp/2, 60]
        y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                for dy in range(5))
        y = y + p["d3_b"].astype(y.dtype)
    out = d2s(y, 2, 3)                            # [B, hp, wp, 3]
    return out[:, _PAD : _PAD + h, _PAD : _PAD + w, :]
