"""Fast path for Johnson-shaped .t7 stylizers — f=2 block-conv form.

The eccv16/jcjohnson torch7 stylizers (the nets the reference runs through
``cv2.dnn.readNetFromTorch``, reference pipeline.py:586,445-478) are the
Johnson architecture with *static* SpatialBatchNormalization (inference uses
running stats — a per-channel affine). ``try_fast_johnson`` pattern-matches
the flattened layer list (io/t7.py), folds every BN into its conv, and
re-expresses the net in the f=2 space-to-depth form of
models/transformer_net_s2d2 — except simpler: with the norms folded there
are no stats passes at all, and zero padding rides the convs (exact; no
border fixups needed). Nets that don't match (instance-norm variants,
reflect-padded or shave-style residual graphs) return None and keep the
exact general executor (t7_apply).

Instance-norm variants (the other half of the jcjohnson model set) also
ride the fast path: their norms can't fold (runtime stats), so they run as
deferred per-logical-channel stats + affine in block space — the same
machinery as models/transformer_net_s2d2. Reflect-padded or shave-style
residual graphs still fall back to the general executor.

Layer math being restructured: the same Johnson topology as
/root/reference/transformer_net.py:4-99; upsampling here is
SpatialFullConvolution (transposed conv), scattered to a block conv by
``_scatter_convT_f2``.
"""

from __future__ import annotations

import numpy as np


def _fold_bn(w, b, bn):
    """conv(+bias) followed by static batchnorm -> adjusted conv weights."""
    if bn is None:
        return w, (b if b is not None else np.zeros(w.shape[-1], np.float32))
    mean = bn["running_mean"]
    var = bn["running_var"]
    if mean is None or var is None:
        return None, None
    s = 1.0 / np.sqrt(var + bn["eps"])
    if bn["weight"] is not None:
        s = s * bn["weight"]
    beta = bn["bias"] if bn["bias"] is not None else 0.0
    b0 = b if b is not None else np.zeros(w.shape[-1], np.float32)
    return w * s, (b0 - mean) * s + beta


def _scatter_convT_f2(w_hwoi: np.ndarray, k: int, pad: int, adj: int):
    """SpatialFullConvolution (k, stride 2, pad, adj) -> 2x-phase block conv.

    w_hwoi: (k, k, Cout, Cin) as stored by io/t7.build_t7_layers. Returns
    (w_blk [kb,kb,Cin,4*Cout], (pad_lo, pad_hi)) such that a VALID conv over
    the zero-padded input grid equals the transposed conv, with output
    channel layout (qr*2+qc)*Cout + c (the s2d phase convention).

    Derivation (1-D, dilated-conv form of conv_transpose2d_torch): with
    left pad (k-1-p) and flipped kernel, out[2J+q] = sum_k wf[k] *
    x[(2J+q+k-(k-1-p)) / 2] over even numerators. Requires out size 2*in:
    (in-1)*2 - 2p + k + adj == 2*in, i.e. k + adj - 2p == 2.
    """
    if k + adj - 2 * pad != 2:
        return None
    wf = w_hwoi[::-1, ::-1]                     # flip spatial
    wf = np.transpose(wf, (0, 1, 3, 2))         # -> (k,k,Cin,Cout)
    ci, co = wf.shape[2], wf.shape[3]
    taps = {0: [], 1: []}                       # phase q -> [(block off, k)]
    for q in range(2):
        for kk in range(k):
            num = q + kk - (k - 1 - pad)
            if num % 2 == 0:
                taps[q].append((num // 2, kk))
    offs = [o for tl in taps.values() for (o, _) in tl]
    lo, hi = -min(offs), max(offs)
    kb = lo + hi + 1
    out = np.zeros((kb, kb, ci, 4 * co), np.float32)
    for qr in range(2):
        for qc in range(2):
            for (oa, ka) in taps[qr]:
                for (ob, kc) in taps[qc]:
                    out[oa + lo, ob + lo, :,
                        (qr * 2 + qc) * co : (qr * 2 + qc + 1) * co] \
                        += wf[ka, kc]
    return out, (lo, hi)


class _Cursor:
    def __init__(self, layers):
        self.ls = list(layers)
        self.i = 0

    def peek(self):
        return self.ls[self.i] if self.i < len(self.ls) else None

    def take(self, op):
        l = self.peek()
        if l is not None and l["op"] == op:
            self.i += 1
            return l
        return None


def _norm_of(cur, co):
    """Consume an optional norm layer: BN -> ("fold", bn) (static affine),
    IN -> ("defer", {scale,bias,eps}) (runtime stats), absent -> None."""
    bn = cur.take("batchnorm")
    if bn is not None:
        return ("fold", bn)
    inorm = cur.take("instancenorm")
    if inorm is not None:
        sc = inorm["weight"] if inorm["weight"] is not None \
            else np.ones(co, np.float32)
        bi = inorm["bias"] if inorm["bias"] is not None \
            else np.zeros(co, np.float32)
        return ("defer", {"scale": np.asarray(sc, np.float32),
                          "bias": np.asarray(bi, np.float32),
                          "eps": float(inorm["eps"])})
    return None


def _take_conv_bn_relu(cur, *, relu=True):
    """conv [+norm] [+relu]; explicit zero_pad layers fold into the conv
    pad. Returns (w, b, stride, pad, deferred_norm_or_None) with static
    BNs folded into (w, b), or None on mismatch."""
    extra = 0
    zp = cur.take("zero_pad")
    if zp is not None:
        extra = zp["pad"]
    c = cur.take("conv")
    if c is None:
        return None
    norm = _norm_of(cur, c["w"].shape[-1])
    bn = norm[1] if (norm is not None and norm[0] == "fold") else None
    w, b = _fold_bn(np.asarray(c["w"], np.float32),
                    None if c["b"] is None else np.asarray(c["b"], np.float32),
                    bn)
    if w is None:
        return None
    if relu and cur.take("relu") is None:
        return None
    pad = (c["pad"][0] + extra, c["pad"][1] + extra)
    dn = norm[1] if (norm is not None and norm[0] == "defer") else None
    return w, b, c["stride"], pad, dn


def try_fast_johnson(layers: list[dict]):
    """Recognize the BN-folded zero-padded Johnson .t7 topology; return the
    f=2 block-space params dict, or None to keep the general executor."""
    from ..models.transformer_net_s2d2 import _scatter_k9_f2
    from ..models.transformer_net_s2d import _scatter_stride2_s2d2

    cur = _Cursor(layers)
    p: dict = {}
    # --- head: conv9 s1 pad4, conv3 s2 pad1, conv3 s2 pad1 -----------------
    h1 = _take_conv_bn_relu(cur)
    if h1 is None:
        return None
    w, b, st, pad, dn = h1
    if w.shape[:2] != (9, 9) or w.shape[2] != 3 or st != (1, 1) or pad != (4, 4):
        return None
    c0 = w.shape[3]
    p["c1_w"] = _scatter_k9_f2(w)
    p["c1_b"] = np.tile(b, 4)
    p["n1"] = dn
    h2 = _take_conv_bn_relu(cur)
    if h2 is None:
        return None
    w, b, st, pad, dn = h2
    if w.shape[:2] != (3, 3) or st != (2, 2) or pad != (1, 1):
        return None
    p["c2_w"], p["c2_b"], p["n2"] = _scatter_stride2_s2d2(w), b, dn
    h3 = _take_conv_bn_relu(cur)
    if h3 is None:
        return None
    w, b, st, pad, dn = h3
    if w.shape[:2] != (3, 3) or st != (2, 2) or pad != (1, 1):
        return None
    p["c3_w"], p["c3_b"], p["n3"] = w, b, dn    # plain strided pixel conv
    # --- residual blocks ---------------------------------------------------
    res = []
    while True:
        ct = cur.take("concat_table")
        if ct is None:
            break
        if cur.take("add_table") is None:
            return None
        brs = ct["branches"]
        if len(brs) != 2:
            return None
        body = brs[0] if not brs[1] else (brs[1] if not brs[0] else None)
        if body is None:
            return None
        bc = _Cursor(body)
        r1 = _take_conv_bn_relu(bc)
        if r1 is None:
            return None
        r2 = _take_conv_bn_relu(bc, relu=False)
        if r2 is None or bc.peek() is not None:
            return None
        for (w, b, st, pad, _dn) in (r1, r2):
            if w.shape[:2] != (3, 3) or st != (1, 1) or pad != (1, 1):
                return None
        res.append({"w1": r1[0], "b1": r1[1], "rn1": r1[4],
                    "w2": r2[0], "b2": r2[1], "rn2": r2[4]})
    if not res:
        return None
    p["res"] = res
    # --- deconvs -----------------------------------------------------------
    for name in ("d1", "d2"):
        zp = cur.take("zero_pad")
        c = cur.take("conv_transpose")
        if c is None or zp is not None:
            return None
        co = c["w"].shape[2]                    # (k,k,Cout,Cin)
        norm = _norm_of(cur, co)
        if cur.take("relu") is None:
            return None
        wT = np.asarray(c["w"], np.float32)
        sc = _scatter_convT_f2(wT, wT.shape[0], c["pad"], c["adj"])
        if sc is None or c["stride"] != 2:
            return None
        wb, (lo, hi) = sc
        b = None if c["b"] is None else np.asarray(c["b"], np.float32)
        bn = norm[1] if (norm is not None and norm[0] == "fold") else None
        wb2, bb = _fold_bn_phases(wb, b, bn)
        if wb2 is None:
            return None
        p[f"{name}_w"], p[f"{name}_b"] = wb2, bb
        p[f"{name}_pad"] = (lo, hi)
        p[f"n_{name}"] = norm[1] if (norm is not None
                                     and norm[0] == "defer") else None
    # --- tail: conv9 s1 pad4 -> 3ch [tanh] [mul] ---------------------------
    zp = cur.take("zero_pad")
    c = cur.take("conv")
    if c is None:
        return None
    w = np.asarray(c["w"], np.float32)
    pad = (c["pad"][0] + (zp["pad"] if zp else 0),
           c["pad"][1] + (zp["pad"] if zp else 0))
    if w.shape[:2] != (9, 9) or w.shape[3] != 3 or c["stride"] != (1, 1) \
            or pad != (4, 4):
        return None
    b = None if c["b"] is None else np.asarray(c["b"], np.float32)
    if b is None:
        b = np.zeros(3, np.float32)
    w5 = _scatter_k9_f2(w)                      # (5,5,4C,12)
    w_row = np.zeros((1, 5, w5.shape[2], 5 * 12), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * 12 : (dy + 1) * 12] = w5[dy]
    p["d3_w"] = w_row
    p["d3_b"] = np.tile(b, 4)
    p["tanh"] = cur.take("tanh") is not None
    ml = cur.take("mul")
    p["mul"] = float(ml["c"]) if ml is not None else None
    if cur.peek() is not None:
        return None
    p["c0"] = c0
    import jax.numpy as jnp

    def cv(v):
        if isinstance(v, np.ndarray):
            return jnp.asarray(v)
        if isinstance(v, dict):
            return {kk: cv(vv) for kk, vv in v.items()}
        if isinstance(v, list):
            return [cv(e) for e in v]
        return v                                # python meta (pads/flags/eps)
    return {k: cv(v) for k, v in p.items()}


def _fold_bn_phases(wb, b, bn):
    """BN fold for a phase-scattered convT weight: the 4*Cout outputs are
    4 phase copies of the Cout logical channels."""
    co4 = wb.shape[-1]
    co = co4 // 4
    if bn is None:
        bb = np.zeros(co4, np.float32) if b is None else np.tile(b, 4)
        return wb, bb
    if bn["running_mean"] is None or bn["running_var"] is None:
        return None, None
    s = 1.0 / np.sqrt(bn["running_var"] + bn["eps"])
    if bn["weight"] is not None:
        s = s * bn["weight"]
    beta = bn["bias"] if bn["bias"] is not None else np.zeros(co, np.float32)
    b0 = b if b is not None else np.zeros(co, np.float32)
    s4, m4 = np.tile(s, 4), np.tile(bn["running_mean"], 4)
    bb = (np.tile(b0, 4) - m4) * s4 + np.tile(beta, 4)
    return wb * s4, bb


def _defer_norm(y, nrm, phases, c, *, act=True, stats_out=None, site=None):
    """Deferred instance norm + optional ReLU over a block tensor whose
    channels are ``phases`` phase copies of ``c`` logical channels.
    stats_out/site: optional calibration hook recording (mean, inv) —
    the static-norm fold's input (fold_static_in)."""
    import jax
    import jax.numpy as jnp

    b, hb, wb, _ = y.shape
    yr = y.reshape(b, hb, wb, phases, c).astype(jnp.float32)
    mean = jnp.mean(yr, axis=(1, 2, 3))
    var = jnp.mean(jnp.square(yr), axis=(1, 2, 3)) - mean * mean
    inv = jax.lax.rsqrt(var + nrm["eps"])
    if stats_out is not None:
        stats_out[site] = (mean, inv)
    sc = nrm["scale"].astype(jnp.float32)
    bi = nrm["bias"].astype(jnp.float32)
    a = jnp.tile(inv * sc, (1, phases))[:, None, None, :]
    bb = jnp.tile(bi - mean * inv * sc, (1, phases))[:, None, None, :]
    out = y.astype(jnp.float32) * a + bb
    if act:
        out = jax.nn.relu(out)
    return out.astype(y.dtype)


def _res_stats(y, nrm):
    """Deferred-IN (a, b) per (B, C) for a res tensor (phases=1)."""
    import jax
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2))
    var = jnp.mean(jnp.square(yf), axis=(1, 2)) - mean * mean
    inv = jax.lax.rsqrt(var + nrm["eps"])
    sc = nrm["scale"].astype(jnp.float32)
    bi = nrm["bias"].astype(jnp.float32)
    return inv * sc, bi - mean * inv * sc


def _t7_res_quant_xla(y, res, quant):
    """XLA int8 res chain — the parity reference and CPU fallback. Each
    site pays a standalone quantize pass under XLA (the measured int8
    structural loss, PERF.md round-3); TPU runs the fused kernels
    (_t7_res_chain_i8) instead."""
    import jax.numpy as jnp

    from ..ops.conv import conv2d_i8

    B, _, _, C = y.shape
    for i, rp in enumerate(res):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        xq = jnp.clip(jnp.round(y.astype(jnp.float32) * qa["qin"]),
                      -127.0, 127.0).astype(jnp.int8)
        ra = (conv2d_i8(xq, qa["w"], padding=1).astype(jnp.float32)
              * qa["ws"] + rp["b1"].astype(jnp.float32)).astype(y.dtype)
        if rp["rn1"] is None:
            a_aff = jnp.full((B, 1, 1, C), qb["qin"], jnp.float32)
            c_aff = jnp.zeros((B, 1, 1, C), jnp.float32)
        else:
            av, cv = _res_stats(ra, rp["rn1"])
            a_aff = (av * qb["qin"])[:, None, None, :]
            c_aff = (cv * qb["qin"])[:, None, None, :]
        rq = jnp.clip(jnp.round(ra.astype(jnp.float32) * a_aff + c_aff),
                      0.0, 127.0).astype(jnp.int8)   # ReLU folds into lo=0
        rb = (conv2d_i8(rq, qb["w"], padding=1).astype(jnp.float32)
              * qb["ws"] + rp["b2"].astype(jnp.float32)).astype(y.dtype)
        if rp["rn2"] is None:
            y = y + rb
        else:
            a2, c2 = _res_stats(rb, rp["rn2"])
            y = (rb.astype(jnp.float32) * a2[:, None, None, :]
                 + c2[:, None, None, :]).astype(y.dtype) + y
    return y


def _t7_res_chain_i8(y, res, quant):
    """The res chain as Pallas fused int8 sites (zero halos, residual adds
    folded into the next a-site's prologue — models/s2d2_sites_i8)."""
    import jax.numpy as jnp

    from ..models import s2d2_sites_i8 as si8

    B, H, W0, C = y.shape
    dt = y.dtype
    n = float(H * W0)
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)
    carry = None
    for i, rp in enumerate(res):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        aq = ones * qa["qin"]
        b1 = rp["b1"].astype(jnp.float32)
        if carry is None:
            ra, sout = si8.res_site(y, aq, zeros, qa["w"].reshape(9, C, C),
                                    qa["ws"], b1, -127.0, halo="zero")
        else:
            rb_p, a2p, c2p = carry
            ra, sout, y = si8.res_site_skip(
                rb_p, y, aq, zeros, a2p, c2p, qa["w"].reshape(9, C, C),
                qa["ws"], b1, -127.0, halo="zero")
        if rp["rn1"] is None:
            a_eff, c_eff = ones * qb["qin"], zeros
        else:
            m, inv = si8._stats(sout, n, eps=rp["rn1"]["eps"])
            sc = rp["rn1"]["scale"].astype(jnp.float32)
            bi = rp["rn1"]["bias"].astype(jnp.float32)
            a_eff = (inv * sc) * qb["qin"]
            c_eff = (bi - m * inv * sc) * qb["qin"]
        rb, sout2 = si8.res_site(ra, a_eff, c_eff, qb["w"].reshape(9, C, C),
                                 qb["ws"], rp["b2"].astype(jnp.float32), 0.0,
                                 halo="zero")
        if rp["rn2"] is None:
            carry = (rb, ones, zeros)
        else:
            m2, inv2 = si8._stats(sout2, n, eps=rp["rn2"]["eps"])
            sc2 = rp["rn2"]["scale"].astype(jnp.float32)
            bi2 = rp["rn2"]["bias"].astype(jnp.float32)
            carry = (rb, inv2 * sc2, bi2 - m2 * inv2 * sc2)
    rb, a2, c2 = carry
    return ((rb.astype(jnp.float32) * a2[:, None, None, :]
             + c2[:, None, None, :]).astype(y.dtype) + y).astype(dt)


def _t7_res_chain_i8_s8c(y, res, quant, emit_qo=None):
    """BN-folded res chain with s8 carries (models/s2d2_sites_i8
    res_site_s8o / res_site_s8i_yadd): with every norm folded into the
    conv weights, the inter-conv quantize scale is a calibration constant
    — so the a-site emits the b-site's s8 input DIRECTLY (ReLU in the
    clamp floor; the bf16 raw never exists in HBM) and the b-site folds
    the residual add into its epilogue. Interior boundaries carry half
    the bytes of _t7_res_chain_i8 and the trailing XLA combine pass
    disappears. Bit-exact vs _t7_res_quant_xla (both round through bf16
    at every materialization point).

    emit_qo: when set (the dec-s8 extension), the LAST block's b-site
    also quantizes its combine output at this static scale and the chain
    returns the deconv1 site's s8 input (B, H, WPS, C) instead of bf16 —
    the chain output never exists in HBM either."""
    import jax.numpy as jnp

    from ..models import s2d2_sites_i8 as si8

    B, _, W0, C = y.shape
    dt = y.dtype
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)
    for i, rp in enumerate(res):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        s8a = si8.res_site_s8o(y, ones * qa["qin"], zeros,
                               qa["w"].reshape(9, C, C), qa["ws"],
                               rp["b1"].astype(jnp.float32), qb["qin"],
                               -127.0, qlo=0.0)
        if emit_qo is not None and i == len(res) - 1:
            return si8.site_s8(s8a, qb["w"].reshape(9, C, C), qb["ws"],
                               rp["b2"].astype(jnp.float32), w0=W0, y=y,
                               qo=emit_qo, qlo=-127.0)
        y = si8.res_site_s8i_yadd(s8a, y, qb["w"].reshape(9, C, C),
                                  qb["ws"], rp["b2"].astype(jnp.float32))
    return y.astype(dt)


def _t7_dec_i8_s8(xq, p, quant, c0, w0, dt, tail=False):
    """deconv1+deconv2 on an s8 carry (BN-folded graphs only — every
    scale static): deconv1 consumes the res chain's s8 output and emits
    deconv2's s8 input directly (the ReLU between them folds into the
    clamp floor; the quantize commutes with the d2s permutation, so
    quantizing BEFORE the shuffle is bit-exact vs the XLA reference
    which quantizes after), the d2s shuffle and its halo re-pad run on
    s8 (half the copy bytes), and deconv2 emits the bf16 raw for the
    XLA tail. Kills the two largest dec-boundary bf16 round trips.

    tail: "tail_s8" — deconv2 instead emits the 9x9 output conv's s8
    input directly (post-d2 ReLU folded into the emit clamp floor,
    "zero2" zero-SAME column layout — t7 graphs zero-pad, so the layout
    IS the true semantics and no border fixup exists) and the fused
    d3_s8_site collapses the tap-packed 1x5 conv + dy-sum in VMEM;
    returns the (B, H/2, W/2, 12) bf16 pre-d2s tensor. Neither the bf16
    d2 raw nor the 60-lane K tensor ever exists in HBM."""
    import jax
    import jax.numpy as jnp

    from ..models import s2d2_sites_i8 as si8
    from ..models.transformer_net_s2d import d2s

    q1, q2 = quant["d1"], quant["d2"]
    kh1, pt1 = _dec_kform(p["d1_pad"])
    kh2, pt2 = _dec_kform(p["d2_pad"])
    C = 4 * c0
    w1 = q1["w"].reshape(kh1 * kh1, C, -1)
    r8 = si8.site_s8(xq, w1, q1["ws"], p["d1_b"].astype(jnp.float32),
                     w0=w0, qo=q2["qin"], qlo=0.0, kh=kh1, kw=kh1,
                     pt=pt1, pl_=pt1)
    yd = d2s(r8[:, :, 1:w0 + 1, :], 2, 2 * c0)     # s8 shuffle
    w02 = 2 * w0
    wps2 = si8._wps(w02)
    yd = jnp.pad(yd, ((0, 0), (0, 0), (1, wps2 - w02 - 1), (0, 0)))
    w2 = q2["w"].reshape(kh2 * kh2, 2 * c0, -1)
    if tail:
        q3 = quant["d3"]
        qd3 = si8.site_s8(yd, w2, q2["ws"], p["d2_b"].astype(jnp.float32),
                          w0=w02, kh=kh2, kw=kh2, pt=pt2, pl_=pt2,
                          qo=q3["qin"], qlo=0.0, halo_out="zero2")
        return si8.d3_s8_site(qd3, q3["w"].reshape(5, C, -1), q3["ws"],
                              p["d3_b"].astype(jnp.float32), w0=w02)
    r2 = si8.site_s8(yd, w2, q2["ws"], p["d2_b"].astype(jnp.float32),
                     w0=w02, kh=kh2, kw=kh2, pt=pt2, pl_=pt2)
    return jax.nn.relu(r2.astype(jnp.float32)).astype(dt)


def _dec_kform(pad):
    """(kh, pt) for a scattered transposed-conv block kernel: k3 convT
    scatters to 2x2 with pads (0, 1) (_scatter_convT_f2), k4 to 3x3 with
    (1, 1); None if unrecognized."""
    if tuple(pad) == (0, 1):
        return 2, 0
    if tuple(pad) == (1, 1):
        return 3, 1
    return None


def _t7_dec_quant_xla(y, p, quant, c0):
    """XLA int8 deconv1+deconv2 — the parity reference for _t7_dec_i8
    (standalone quantize passes; TPU runs the fused sites instead)."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer_net_s2d import d2s
    from ..ops.conv import conv2d_i8

    q1, q2 = quant["d1"], quant["d2"]
    pd = tuple(p["d1_pad"])
    xq = jnp.clip(jnp.round(y.astype(jnp.float32) * q1["qin"]),
                  -127.0, 127.0).astype(jnp.int8)
    r = (conv2d_i8(xq, q1["w"], padding=(pd, pd)).astype(jnp.float32)
         * q1["ws"] + p["d1_b"].astype(jnp.float32)).astype(y.dtype)
    yd = d2s(r, 2, 2 * c0)
    if p["n_d1"] is None:
        a1 = jnp.full((1, 1, 1, 2 * c0), float(q2["qin"]), jnp.float32)
        c1 = jnp.zeros((1, 1, 1, 2 * c0), jnp.float32)
    else:
        av, cv = _res_stats(yd, p["n_d1"])
        a1 = (av * q2["qin"])[:, None, None, :]
        c1 = (cv * q2["qin"])[:, None, None, :]
    rq = jnp.clip(jnp.round(yd.astype(jnp.float32) * a1 + c1),
                  0.0, 127.0).astype(jnp.int8)   # ReLU folds into lo=0
    pd2 = tuple(p["d2_pad"])
    r2 = (conv2d_i8(rq, q2["w"], padding=(pd2, pd2)).astype(jnp.float32)
          * q2["ws"] + p["d2_b"].astype(jnp.float32)).astype(y.dtype)
    if p["n_d2"] is None:
        return jax.nn.relu(r2)
    return _defer_norm(r2, p["n_d2"], 4, c0)


def _t7_tail_quant_xla(y, p, quant):
    """XLA int8 tap-packed 9x9 output conv — the parity reference for
    the fused tail (_t7_dec_i8_s8(tail=True)). Mirrors the kernel's
    rounding exactly: quantize the activated d2 output (ReLU in the
    clamp floor), integer 1x5 rows conv (zero-SAME — t7 semantics),
    per-K-element bf16 round, f32 dy-sum + bias, bf16 out."""
    import jax.numpy as jnp

    from ..ops.conv import conv2d_i8

    q3 = quant["d3"]
    H2 = y.shape[1]
    qd3 = jnp.clip(jnp.round(y.astype(jnp.float32) * q3["qin"]),
                   0.0, 127.0).astype(jnp.int8)
    K = conv2d_i8(qd3, q3["w"], padding=((2, 2), (2, 2)))
    K = (K.astype(jnp.float32) * q3["ws"]).astype(jnp.bfloat16)
    y12 = sum(K[:, dy:dy + H2, :, dy * 12:(dy + 1) * 12].astype(jnp.float32)
              for dy in range(5))
    return (y12 + p["d3_b"].astype(jnp.float32)).astype(jnp.bfloat16)


def _t7_dec_i8(y, p, quant, c0):
    """deconv1+deconv2 as fused int8 sites: the scattered block kernels
    run as KHxKW zero-halo sites (2x2/pt=0 for k3 convT, 3x3/pt=1 for
    k4), the d2s between them stays XLA (pure shuffle), and the deferred
    norms ride the kernel stat epilogues (_stats_phased)."""
    import jax
    import jax.numpy as jnp

    from ..models import s2d2_sites_i8 as si8
    from ..models.transformer_net_s2d import d2s

    B, H, W0, C = y.shape
    dt = y.dtype
    q1, q2 = quant["d1"], quant["d2"]
    kh1, pt1 = _dec_kform(p["d1_pad"])
    kh2, pt2 = _dec_kform(p["d2_pad"])
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)

    w1 = q1["w"].reshape(kh1 * kh1, C, -1)
    r, sout = si8.res_site(y, ones * q1["qin"], zeros, w1, q1["ws"],
                           p["d1_b"].astype(jnp.float32), -127.0,
                           halo="zero", kh=kh1, kw=kh1, pt=pt1, pl_=pt1)
    yd = d2s(r, 2, 2 * c0)                        # (B, 2H, 2W, 2c0)
    if p["n_d1"] is None:
        a_eff = jnp.full((B, 2 * c0), float(q2["qin"]), jnp.float32)
        c_eff = jnp.zeros((B, 2 * c0), jnp.float32)
    else:
        m, inv = si8._stats_phased(sout, float(H * W0), 4, 2 * c0,
                                   eps=p["n_d1"]["eps"])
        sc = p["n_d1"]["scale"].astype(jnp.float32)
        bi = p["n_d1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * q2["qin"]
        c_eff = (bi - m * inv * sc) * q2["qin"]
    w2 = q2["w"].reshape(kh2 * kh2, 2 * c0, -1)
    r2, sout2 = si8.res_site(yd, a_eff, c_eff, w2, q2["ws"],
                             p["d2_b"].astype(jnp.float32), 0.0,
                             halo="zero", kh=kh2, kw=kh2, pt=pt2, pl_=pt2)
    if p["n_d2"] is None:
        return jax.nn.relu(r2.astype(jnp.float32)).astype(dt)
    m2, inv2 = si8._stats_phased(sout2, float(4 * H * W0), 4, c0,
                                 eps=p["n_d2"]["eps"])
    sc2 = p["n_d2"]["scale"].astype(jnp.float32)
    bi2 = p["n_d2"]["bias"].astype(jnp.float32)
    a2 = jnp.tile(inv2 * sc2, (1, 4))[:, None, None, :]
    b2 = jnp.tile(bi2[None] - m2 * inv2 * sc2, (1, 4))[:, None, None, :]
    return jax.nn.relu(r2.astype(jnp.float32) * a2 + b2).astype(dt)


def has_deferred_norms(p: dict) -> bool:
    """True when the fast-form params carry runtime (instance) norms — the
    graphs the static-norm fold (fold_static_in) applies to."""
    return (any(p.get(k) is not None for k in _IN_FOLD)
            or any(rp.get(f"rn{j}") is not None
                   for rp in p["res"] for j in (1, 2)))


def calibrate_t7_in_stats(p: dict, x_cal) -> dict:
    """Frozen per-norm (mean, inv) from ONE jitted f32 forward — the
    static-norm .t7 mode's statistics (fold_static_in). Averaged over the
    calibration batch (shape (1, C))."""
    import jax
    import jax.numpy as jnp

    def run(x):
        so: dict = {}
        t7_fast_apply(p, x, stats_out=so)
        return {k: (jnp.mean(mv[0], axis=0, keepdims=True),
                    jnp.mean(mv[1], axis=0, keepdims=True))
                for k, mv in so.items()}

    out = jax.jit(run)(x_cal)
    return {k: (jnp.asarray(m, jnp.float32), jnp.asarray(iv, jnp.float32))
            for k, (m, iv) in out.items()}


#: deferred-norm key -> (conv weight key, bias key, phase-copy count of the
#: logical channels in the conv's output layout)
_IN_FOLD = {"n1": ("c1_w", "c1_b", 4), "n2": ("c2_w", "c2_b", 1),
            "n3": ("c3_w", "c3_b", 1),
            "n_d1": ("d1_w", "d1_b", 4), "n_d2": ("d2_w", "d2_b", 4)}


def fold_static_in(p: dict, stats: dict) -> dict:
    """Fold FROZEN instance-norm stats into the conv weights — the
    static-norm .t7 mode (--quantize bf16_static / int8_static on a .t7
    slot): norm(conv(x)·)·scale+bias with constant (mean, inv) is a
    per-out-channel affine, exactly like the BN fold (``_fold_bn``), so
    the returned params are BN-folded-FORM (every deferred norm None) and
    ride the entire fast machinery — including the s8-carry int8 chains
    that IN graphs cannot use dynamically. NOT exact vs the dynamic path
    (IN is per-image); the engine gates quality.

    stats: calibrate_t7_in_stats output keyed n1/n2/n3, r{i}n{1,2},
    n_d1/n_d2."""
    import jax.numpy as jnp

    q = dict(p)

    def fold(w, bias, nrm, mv, phases):
        m, inv = (np.asarray(s, np.float32)[0] for s in mv)
        a = inv * np.asarray(nrm["scale"], np.float32)
        c = (np.asarray(nrm["bias"], np.float32) - m * a)
        a, c = np.tile(a, phases), np.tile(c, phases)
        w2 = jnp.asarray(np.asarray(w, np.float32) * a)
        b2 = jnp.asarray(np.asarray(bias, np.float32) * a + c)
        return w2, b2

    for nk, (wk, bk, ph) in _IN_FOLD.items():
        if p.get(nk) is not None and nk in stats:
            q[wk], q[bk] = fold(p[wk], p[bk], p[nk], stats[nk], ph)
            q[nk] = None
    res2 = []
    for i, rp in enumerate(p["res"]):
        rp2 = dict(rp)
        for j in (1, 2):
            if rp.get(f"rn{j}") is not None and f"r{i}n{j}" in stats:
                rp2[f"w{j}"], rp2[f"b{j}"] = fold(
                    rp[f"w{j}"], rp[f"b{j}"], rp[f"rn{j}"],
                    stats[f"r{i}n{j}"], 1)
                rp2[f"rn{j}"] = None
        res2.append(rp2)
    q["res"] = res2
    return q


def calibrate_t7_scales(p: dict, x_cal) -> dict:
    """Per-res-site max|activation| from one jitted f32 forward (x_cal:
    model-space input, e.g. caffe_bgr-preprocessed)."""
    import jax
    import jax.numpy as jnp

    def run(x):
        vals: dict = {}

        def tap(site, t):
            vals[site] = jnp.max(jnp.abs(t.astype(jnp.float32)))

        t7_fast_apply(p, x, tap=tap)
        return vals

    out = jax.jit(run)(x_cal)
    return {k: float(v) for k, v in out.items()}


def quantize_t7(p: dict, act_scales: dict) -> dict:
    """Per-out-channel symmetric int8 res-chain weights + folded activation
    scales — same contract as transformer_net_s2d2.quantize_net."""
    import jax.numpy as jnp

    from ..models.s2d2_sites_i8 import quantize_site as qsite

    q = {}
    for i, rp in enumerate(p["res"]):
        for ab, wk in (("a", "w1"), ("b", "w2")):
            site = f"r{i}{ab}"
            if site in act_scales:
                q[site] = qsite(np.asarray(rp[wk], np.float32),
                                act_scales[site])
    for site, wk in (("c2", "c2_w"), ("d1", "d1_w"), ("d2", "d2_w"),
                     ("d3", "d3_w")):
        if site in act_scales:
            q[site] = qsite(np.asarray(p[wk], np.float32), act_scales[site])
    return q


def t7_fast_apply(p: dict, x, *, tap=None, quant=None, fused_sites=(),
                  stats_out=None):
    """f=2 block-space forward for a recognized .t7 Johnson net (BN folded;
    IN deferred).

    x: NHWC model-space input (caffe_bgr-preprocessed), H, W divisible by 4.
    Exact vs t7_apply up to float reassociation (zero pads ride the convs;
    no border fixups needed).

    quant: optional quantize_t7 output — the res chain runs int8 (fused
    Pallas sites when "res_i8" in fused_sites and the geometry supports
    it, XLA int8 otherwise). "res_s8" upgrades BN-folded graphs to the
    static-scale s8-carry chain; "dec_s8" (requires an active res_s8
    chain and norm-free deconvs) extends the carry through deconv1/
    deconv2 so the res-chain output and the deconv1 output never exist
    in HBM as bf16. tap: calibration hook (site, tensor)."""
    import jax
    import jax.numpy as jnp

    from ..models.transformer_net_s2d import d2s, s2d
    from ..ops.conv import conv2d

    b, h, w, _ = x.shape
    hb = h // 2
    c0 = p["c0"]
    relu = jax.nn.relu
    if tap is None:
        tap = lambda name, t: None  # noqa: E731

    def na(site, y, nrm, phases, c, *, act=True):
        if nrm is None:
            return relu(y) if act else y
        return _defer_norm(y, nrm, phases, c, act=act,
                           stats_out=stats_out, site=site)

    y = s2d(x, 2)
    y = na("n1", conv2d(y, p["c1_w"], p["c1_b"], padding=2), p["n1"],
           4, c0)
    use_c2_i8 = False
    if quant is not None and "c2" in quant and "c2_i8" in fused_sites:
        from ..models import s2d2_sites_i8 as si8
        use_c2_i8 = si8.res_supported(y.shape[1], y.shape[2])
    if use_c2_i8:
        # the stride-2 scatter form is a 2x2 block conv with (1, 0) zero
        # pads — KH=KW=2, PT=PL=1 on the zero-halo site (the left halo
        # column / zeroed head strip ARE the pads; tail/right unused)
        from ..models import s2d2_sites_i8 as si8
        q2 = quant["c2"]
        B2, _, _, Cin = y.shape
        aq = jnp.full((B2, Cin), float(q2["qin"]), jnp.float32)
        cq = jnp.zeros((B2, Cin), jnp.float32)
        r, sout = si8.res_site(y, aq, cq, q2["w"].reshape(4, Cin, -1),
                               q2["ws"], p["c2_b"].astype(jnp.float32),
                               -127.0, halo="zero", kh=2, kw=2, pt=1, pl_=1)
        if p["n2"] is None:
            y = relu(r.astype(jnp.float32)).astype(y.dtype)
        else:
            m2, inv2 = si8._stats(sout, float(y.shape[1] * y.shape[2]),
                                  eps=p["n2"]["eps"])
            sc = p["n2"]["scale"].astype(jnp.float32)
            bi = p["n2"]["bias"].astype(jnp.float32)
            y = relu(r.astype(jnp.float32) * (inv2 * sc)[:, None, None, :]
                     + (bi[None] - m2 * inv2 * sc)[:, None, None, :]) \
                .astype(y.dtype)
    else:
        tap("c2", y)
        y = na("n2", conv2d(y, p["c2_w"], p["c2_b"],
                      padding=((1, 0), (1, 0))),        # left/top zero halo
               p["n2"], 1, 2 * c0)
    y = na("n3", conv2d(y, p["c3_w"], p["c3_b"], stride=2, padding=1),
           p["n3"], 1, 4 * c0)

    nres = len(p["res"])
    use_q = quant is not None and all(
        f"r{i}{ab}" in quant for i in range(nres) for ab in "ab")
    use_res_i8 = False
    use_res_s8 = False
    if use_q and ("res_i8" in fused_sites or "res_s8" in fused_sites):
        from ..models import s2d2_sites_i8 as si8
        ok = si8.res_supported(y.shape[1], y.shape[2])
        use_res_s8 = (ok and "res_s8" in fused_sites and all(
            rp["rn1"] is None and rp["rn2"] is None for rp in p["res"]))
        use_res_i8 = ok and not use_res_s8 and "res_i8" in fused_sites
    use_dec_s8 = False
    if use_res_s8 and "dec_s8" in fused_sites:
        from ..models import s2d2_sites_i8 as si8
        use_dec_s8 = bool(
            p["res"] and "d1" in quant and "d2" in quant
            and p["n_d1"] is None and p["n_d2"] is None
            and _dec_kform(p["d1_pad"]) is not None
            and _dec_kform(p["d2_pad"]) is not None
            and si8.res_supported(2 * y.shape[1], 2 * y.shape[2]))
    w0_res, dt_res = y.shape[2], y.dtype
    if use_res_s8:
        y = _t7_res_chain_i8_s8c(
            y, p["res"], quant,
            emit_qo=quant["d1"]["qin"] if use_dec_s8 else None)
    elif use_res_i8:
        y = _t7_res_chain_i8(y, p["res"], quant)
    elif use_q and not ({"res_i8", "res_s8"} & set(fused_sites)):
        # the CPU/parity XLA-int8 branch. When a fused chain WAS requested
        # but the geometry is unsupported, fall through to bf16 instead —
        # XLA-i8 pays standalone quantize passes (the measured loss), so
        # a speed flag must never route there silently.
        y = _t7_res_quant_xla(y, p["res"], quant)
    else:
        for i, rp in enumerate(p["res"]):
            tap(f"r{i}a", y)
            r = na(f"r{i}n1", conv2d(y, rp["w1"], rp["b1"], padding=1),
                   rp["rn1"], 1, 4 * c0)
            tap(f"r{i}b", r)
            r = na(f"r{i}n2", conv2d(r, rp["w2"], rp["b2"], padding=1),
                   rp["rn2"], 1, 4 * c0, act=False)
            y = y + r
    use_dec_i8 = False
    if (not use_dec_s8 and quant is not None and "dec_i8" in fused_sites
            and "d1" in quant and "d2" in quant):
        from ..models import s2d2_sites_i8 as si8
        use_dec_i8 = (si8.res_supported(y.shape[1], y.shape[2])
                      and si8.res_supported(2 * y.shape[1], 2 * y.shape[2])
                      and _dec_kform(p["d1_pad"]) is not None
                      and _dec_kform(p["d2_pad"]) is not None)
    use_tail_s8 = False
    if use_dec_s8 and "tail_s8" in fused_sites and "d3" in quant:
        from ..models import s2d2_sites_i8 as si8
        # grid the tail runs at: (H/2, W/2) — 2x the res grid
        use_tail_s8 = si8.d3s8_supported(2 * y.shape[1], 2 * w0_res)
    if use_dec_s8:
        y = _t7_dec_i8_s8(y, p, quant, c0, w0_res, dt_res,
                          tail=use_tail_s8)
    elif use_dec_i8:
        y = _t7_dec_i8(y, p, quant, c0)
    elif (quant is not None and "d1" in quant and "d2" in quant
          and "dec_xla_i8" in fused_sites):
        # parity/CPU reference branch for the fused dec sites
        y = _t7_dec_quant_xla(y, p, quant, c0)
    else:
        tap("d1", y)
        pd = p["d1_pad"]
        y = conv2d(y, p["d1_w"], p["d1_b"], padding=(pd, pd))
        y = na("n_d1", d2s(y, 2, 2 * c0), p["n_d1"], 1, 2 * c0)
        tap("d2", y)
        pd = p["d2_pad"]
        y = na("n_d2", conv2d(y, p["d2_w"], p["d2_b"], padding=(pd, pd)),
               p["n_d2"], 4, c0)
    if use_tail_s8:
        pass                                    # y IS the 12-lane tensor
    elif (quant is not None and "d3" in quant
          and "tail_xla_i8" in fused_sites):
        # parity/CPU reference branch for the fused s8 tail
        y = _t7_tail_quant_xla(y, p, quant)
    else:
        tap("d3", y)
        rows = conv2d(y, p["d3_w"], padding=(2, 2))     # (B, H/2+4, W/2, 60)
        y = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                for dy in range(5))
        y = y + p["d3_b"].astype(y.dtype)
    out = d2s(y, 2, 3)
    if bool(p["tanh"]):
        out = jnp.tanh(out)
    if p["mul"] is not None:
        out = out * jnp.asarray(p["mul"], out.dtype)
    return out
