"""ReCoNet in f=2 block form — the TPU speed path for the reconet backend.

Same math as models/reconet.apply (reference: model.py:75-116): the Johnson
restructure family applied to ReCoNet's channel plan (48/96/192, 4 res
blocks, nearest-up decoder, tanh output, IN+ReLU or FRN+TLU norms).
Reflect-padded convs use the zero-SAME + border-strip-fixup pattern of
transformer_net_s2d2 (conv1/final) and the phase/edge halo builders of
transformer_net_s2d (stride-2 and upsample layers). Instance norms run as
deferred stats; FRN's nu2 is deferred the same way (per logical channel
across phases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d
from ..ops.pad import reflect_pad_2d
from .transformer_net_s2d import (
    _pad_edge_blocks,
    _pad_stride2_halo,
    _scatter_stride2_s2d2,
    _scatter_upconv,
    d2s,
    s2d,
)
from .transformer_net_s2d2 import (
    _conv1_same_fixed,
    _pad_reflect_f2_4px,
    _scatter_k9_f2,
)

_EPS = 1e-5


def from_reconet_params(p: dict) -> dict:
    g = lambda a: np.asarray(a, np.float32)  # noqa: E731
    enc, res = p["encoder"][:3], p["encoder"][3:]
    dec = p["decoder"]
    out: dict = {"frn": bool(p.get("frn", False))}
    out["c1_w"] = _scatter_k9_f2(g(enc[0]["conv"]["w"]))
    out["c1_b"] = np.tile(g(enc[0]["conv"]["b"]), 4)
    out["n1"] = jax.tree.map(g, enc[0]["norm"])
    out["c2_w"] = _scatter_stride2_s2d2(g(enc[1]["conv"]["w"]))
    out["c2_b"] = g(enc[1]["conv"]["b"])
    out["n2"] = jax.tree.map(g, enc[1]["norm"])
    out["c3_w"] = g(enc[2]["conv"]["w"])
    out["c3_b"] = g(enc[2]["conv"]["b"])
    out["n3"] = jax.tree.map(g, enc[2]["norm"])
    out["res"] = [jax.tree.map(g, r) for r in res]
    out["d1_w"] = _scatter_upconv(g(dec[0]["conv"]["w"]))
    out["d1_b"] = np.tile(g(dec[0]["conv"]["b"]), 4)
    out["nd1"] = jax.tree.map(g, dec[0]["norm"])
    out["d2_w"] = _scatter_upconv(g(dec[1]["conv"]["w"]))
    out["d2_b"] = np.tile(g(dec[1]["conv"]["b"]), 4)
    out["nd2"] = jax.tree.map(g, dec[1]["norm"])
    w5 = _scatter_k9_f2(g(dec[2]["conv"]["w"]))       # (5,5,192,12)
    w_row = np.zeros((1, 5, w5.shape[2], 60), np.float32)
    for dy in range(5):
        w_row[0, :, :, dy * 12 : (dy + 1) * 12] = w5[dy]
    out["d3_w"] = w_row
    out["d3_b"] = np.tile(g(dec[2]["conv"]["b"]), 4)
    return jax.tree.map(jnp.asarray, out)


def _stats(x, phases, c, frn):
    """Deferred per-logical-channel norm stats: (a, b) with norm(x)=a*x+b."""
    b, hb, wb, _ = x.shape
    xr = x.reshape(b, hb, wb, phases, c).astype(jnp.float32)
    if frn:
        nu2 = jnp.mean(jnp.square(xr), axis=(1, 2, 3))
        return jnp.zeros_like(nu2), jax.lax.rsqrt(nu2 + _EPS)
    mean = jnp.mean(xr, axis=(1, 2, 3))
    var = jnp.mean(jnp.square(xr), axis=(1, 2, 3)) - mean * mean
    return mean, jax.lax.rsqrt(var + _EPS)


def _apply(x, m, inv, nrm, phases, frn, *, act=True):
    sc = nrm["scale"].astype(jnp.float32)
    bi = nrm["bias"].astype(jnp.float32)
    a = jnp.tile(inv * sc, (1, phases))[:, None, None, :]
    bb = jnp.tile(bi - m * inv * sc, (1, phases))[:, None, None, :]
    y = x.astype(jnp.float32) * a + bb
    if act:
        if frn:
            tau = jnp.tile(nrm["tau"].astype(jnp.float32), phases)
            y = jnp.maximum(y, tau)
        else:
            y = jax.nn.relu(y)
    return y.astype(x.dtype)


def _res_i8_stats(sout, n, frn):
    """Deferred norm (m, inv) from a fused site's [sum, sum_sq] output."""
    s1 = sout[:, 0, :] / n
    s2 = sout[:, 1, :] / n
    if frn:
        return jnp.zeros_like(s2), jax.lax.rsqrt(s2 + _EPS)
    var = s2 - s1 * s1
    return s1, jax.lax.rsqrt(var + _EPS)


def _frozen(static_stats, site):
    """Frozen (mean, inv) for ``site`` from the static-norm stats dict
    (IN mean/inv-std, or FRN zero-mean/rsqrt-nu2), or ``None``."""
    if static_stats is not None and site in static_stats:
        ms, invs = static_stats[site]
        return ms.astype(jnp.float32), invs.astype(jnp.float32)
    return None


def _res_quant_xla(y, p, quant, frn, static_stats=None):
    """XLA int8 res chain — parity reference / CPU fallback (each site
    pays a standalone HBM quantize pass; TPU runs _res_chain_i8). The
    reflect pads commute with the pointwise quantize, so the s8 tensor is
    reflect-padded directly."""
    from ..ops.conv import conv2d_i8

    C = y.shape[-1]
    for i, rp in enumerate(p["res"]):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        xq = jnp.clip(jnp.round(y.astype(jnp.float32) * qa["qin"]),
                      -127.0, 127.0).astype(jnp.int8)
        ra = (conv2d_i8(reflect_pad_2d(xq, 1), qa["w"]).astype(jnp.float32)
              * qa["ws"]
              + rp["conv1"]["b"].astype(jnp.float32)).astype(y.dtype)
        m, inv = _frozen(static_stats, f"r{i}in1") or _stats(ra, 1, C, frn)
        sc = rp["norm1"]["scale"].astype(jnp.float32)
        bi = rp["norm1"]["bias"].astype(jnp.float32)
        a1 = (inv * sc)[:, None, None, :] * qb["qin"]
        c1 = (bi[None] - m * inv * sc)[:, None, None, :] * qb["qin"]
        v = ra.astype(jnp.float32) * a1 + c1
        if frn:
            v = jnp.maximum(v, rp["norm1"]["tau"].astype(jnp.float32)
                            * qb["qin"])
        rq = jnp.clip(jnp.round(v), 0.0 if not frn else -127.0,
                      127.0).astype(jnp.int8)
        rb = (conv2d_i8(reflect_pad_2d(rq, 1), qb["w"]).astype(jnp.float32)
              * qb["ws"]
              + rp["conv2"]["b"].astype(jnp.float32)).astype(y.dtype)
        m2, inv2 = _frozen(static_stats, f"r{i}in2") or _stats(rb, 1, C, frn)
        y = _apply(rb, m2, inv2, rp["norm2"], 1, frn, act=False) + y
        if frn:
            y = jnp.maximum(y.astype(jnp.float32),
                            rp["act"]["tau"].astype(jnp.float32)) \
                .astype(y.dtype)
        else:
            y = jax.nn.relu(y)
    return y


def _res_chain_i8(y, p, quant, frn, static_stats=None):
    """The four res blocks' convs as Pallas fused int8 sites (reflect
    halos; deferred IN or FRN stats ride the kernel epilogue, the TLU
    folds into the b-site's quantize as a per-channel floor). ReCoNet
    activates AFTER the residual add (reference: model.py:57-60):
    by default the combine + post-skip activation stay XLA; RECO_SKIP=1
    folds them into the next a-site's prologue instead (res_site_skip
    with act="relu"/"tau" — exact, pending its in-net TPU A/B,
    experiments/mk34)."""
    from ..adopt_overrides import flag as _adopt_flag
    from . import s2d2_sites_i8 as si8

    if _adopt_flag("reco_skip", env="RECO_SKIP"):
        return _res_chain_i8_skip(y, p, quant, frn, si8,
                                  static_stats=static_stats)

    B, H, W0, C = y.shape
    dt = y.dtype
    n = float(H * W0)
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)

    def _site_stats(site, sout):
        fz = _frozen(static_stats, site)
        if fz is not None:
            ms, invs = fz
            return (jnp.broadcast_to(ms, (B, ms.shape[-1])),
                    jnp.broadcast_to(invs, (B, invs.shape[-1])))
        return _res_i8_stats(sout, n, frn)

    for i, rp in enumerate(p["res"]):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        w9a = qa["w"].reshape(9, C, C)
        w9b = qb["w"].reshape(9, C, C)
        r, sout = si8.res_site(y, ones * qa["qin"], zeros, w9a, qa["ws"],
                               rp["conv1"]["b"].astype(jnp.float32), -127.0)
        m, inv = _site_stats(f"r{i}in1", sout)
        sc = rp["norm1"]["scale"].astype(jnp.float32)
        bi = rp["norm1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * qb["qin"]
        c_eff = (bi - m * inv * sc) * qb["qin"]
        tau = None
        lo = 0.0
        if frn:
            lo = -127.0
            tau = jnp.broadcast_to(
                rp["norm1"]["tau"].astype(jnp.float32) * qb["qin"], (B, C))
        rb, sout2 = si8.res_site(r, a_eff, c_eff, w9b, qb["ws"],
                                 rp["conv2"]["b"].astype(jnp.float32), lo,
                                 tau=tau)
        m2, inv2 = _site_stats(f"r{i}in2", sout2)
        sc2 = rp["norm2"]["scale"].astype(jnp.float32)
        bi2 = rp["norm2"]["bias"].astype(jnp.float32)
        y = (rb.astype(jnp.float32) * (inv2 * sc2)[:, None, None, :]
             + (bi2[None] - m2 * inv2 * sc2)[:, None, None, :]) \
            .astype(y.dtype) + y
        if frn:
            y = jnp.maximum(y.astype(jnp.float32),
                            rp["act"]["tau"].astype(jnp.float32)) \
                .astype(dt)
        else:
            y = jax.nn.relu(y).astype(dt)
    return y


def _res_chain_s8_static(y, p, quant, frn, static_stats):
    """The four res blocks on s8 inter-conv carries with FROZEN norms
    ("res_s8" under --quantize int8_static): the a-site emits the
    b-site's s8 input directly — the frozen norm1 affine (and, on FRN
    nets, the TLU's per-channel tau·qin pre-round floor) folds into the
    emit quantize, so the bf16 a-raw never exists in HBM; the b-site
    applies the frozen norm2 affine post-round and folds the residual
    add. The post-skip activation stays XLA — ReCoNet activates AFTER
    the add (reference: model.py:57-60). Reflect halos ride the carry
    (quantize is pointwise, so the carry's halo columns ARE the reflect
    codes). Matches _res_quant_xla under static_stats to bf16 rounding."""
    from . import s2d2_sites_i8 as si8

    B, H, W0, C = y.shape
    dt = y.dtype
    for i, rp in enumerate(p["res"]):
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
        tau = None
        qlo = 0.0
        if frn:
            qlo = -127.0
            tau = rp["norm1"]["tau"].astype(jnp.float32) * qb_["qin"]
        aq = jnp.full((B, C), qa_["qin"], jnp.float32)
        cq = jnp.zeros((B, C), jnp.float32)
        qx = si8.res_site_s8o(y, aq, cq, qa_["w"].reshape(9, C, C),
                              qa_["ws"],
                              rp["conv1"]["b"].astype(jnp.float32),
                              qa=qA, qc=qC, lo=-127.0, qlo=qlo, tau=tau,
                              halo="reflect")
        aff = ((inv2 * sc2)[0], (bi2 - m2 * inv2 * sc2)[0])
        y = si8.site_s8(qx, qb_["w"].reshape(9, C, C), qb_["ws"],
                        rp["conv2"]["b"].astype(jnp.float32), w0=W0, y=y,
                        aff=aff, halo="reflect")
        if frn:
            y = jnp.maximum(y.astype(jnp.float32),
                            rp["act"]["tau"].astype(jnp.float32)) \
                .astype(dt)
        else:
            y = jax.nn.relu(y).astype(dt)
    return y


def _dec_s8_static(y, p, quant, frn, static_stats, dt):
    """deconv1+deconv2 on an s8 carry with FROZEN norms ("dec_s8" under
    int8_static): d1 consumes the res-chain output (bf16, edge-block
    halos in the quantize prologue — _pad_edge_blocks' geometry) and
    emits d2's s8 input directly: the frozen in4 affine + activation
    fold into the emit quantize (tiled ×4 to the phase-major block
    channels; FRN's nd1 TLU rides the per-channel pre-round floor row),
    so the bf16 d1 raw never exists in HBM. The d2s shuffle + edge-halo
    re-pad run at s8; d2 emits the bf16 raw and the frozen in5 tail runs
    in XLA. Matches _dec_quant_xla under static_stats to bf16 rounding
    (quantize commutes with the d2s permutation)."""
    from . import s2d2_sites_i8 as si8
    from .transformer_net_s2d import d2s

    B, H, W0, C = y.shape
    q1, q2 = quant["d1"], quant["d2"]
    m4, inv4 = (s.astype(jnp.float32) for s in static_stats["in4"])
    sc4 = p["nd1"]["scale"].astype(jnp.float32)
    bi4 = p["nd1"]["bias"].astype(jnp.float32)
    qA = jnp.tile(((inv4 * sc4) * q2["qin"])[0], 4)          # (384,)
    qC = jnp.tile(((bi4 - m4 * inv4 * sc4) * q2["qin"])[0], 4)
    tau = None
    qlo = 0.0
    if frn:
        qlo = -127.0
        tau = jnp.tile(p["nd1"]["tau"].astype(jnp.float32) * q2["qin"], 4)
    aq = jnp.full((B, C), q1["qin"], jnp.float32)
    cq = jnp.zeros((B, C), jnp.float32)
    qd1 = si8.res_site_s8o(y, aq, cq, q1["w"].reshape(9, C, -1), q1["ws"],
                           p["d1_b"].astype(jnp.float32), qa=qA, qc=qC,
                           tau=tau, lo=-127.0, qlo=qlo, halo="edge")
    qs = d2s(qd1[:, :, 1:W0 + 1], 2, 96)                     # s8 shuffle
    w02 = 2 * W0
    wps2 = si8._wps(w02)
    X = jnp.pad(qs, ((0, 0), (0, 0), (1, wps2 - w02 - 1), (0, 0)))
    X = X.at[:, :, 0].set(qs[:, :, 0])                       # edge halos
    X = X.at[:, :, w02 + 1].set(qs[:, :, -1])
    r2 = si8.site_s8(X, q2["w"].reshape(9, 96, -1), q2["ws"],
                     p["d2_b"].astype(jnp.float32), w0=w02, halo="edge")
    m5, inv5 = (s.astype(jnp.float32) for s in static_stats["in5"])
    sc2 = p["nd2"]["scale"].astype(jnp.float32)
    bi2 = p["nd2"]["bias"].astype(jnp.float32)
    v = (r2.astype(jnp.float32)
         * jnp.tile(inv5 * sc2, (1, 4))[:, None, None, :]
         + jnp.tile(bi2[None] - m5 * inv5 * sc2, (1, 4))[:, None, None, :])
    if frn:
        v = jnp.maximum(v, jnp.tile(p["nd2"]["tau"].astype(jnp.float32), 4))
    else:
        v = jax.nn.relu(v)
    return v.astype(dt)


def _res_chain_i8_skip(y, p, quant, frn, si8, static_stats=None):
    """RECO_SKIP=1 variant: each block's deferred-norm apply + residual
    add + POST-SKIP activation fold into the next a-site's prologue
    (s2d2_sites_i8.res_site_skip act=); only the last block combines in
    XLA."""
    B, H, W0, C = y.shape
    dt = y.dtype
    n = float(H * W0)
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)
    act = "tau" if frn else "relu"

    def _site_stats(site, sout):
        fz = _frozen(static_stats, site)
        if fz is not None:
            ms, invs = fz
            return (jnp.broadcast_to(ms, (B, ms.shape[-1])),
                    jnp.broadcast_to(invs, (B, invs.shape[-1])))
        return _res_i8_stats(sout, n, frn)

    carry = None
    for i, rp in enumerate(p["res"]):
        qa, qb = quant[f"r{i}a"], quant[f"r{i}b"]
        w9a = qa["w"].reshape(9, C, C)
        w9b = qb["w"].reshape(9, C, C)
        aq = ones * qa["qin"]
        b1 = rp["conv1"]["b"].astype(jnp.float32)
        if carry is None:
            r, sout = si8.res_site(y, aq, zeros, w9a, qa["ws"], b1, -127.0)
        else:
            r2p, a2p, c2p, tprev = carry
            r, sout, y = si8.res_site_skip(r2p, y, aq, zeros, a2p, c2p,
                                           w9a, qa["ws"], b1, -127.0,
                                           act=act, tau_act=tprev)
        m, inv = _site_stats(f"r{i}in1", sout)
        sc = rp["norm1"]["scale"].astype(jnp.float32)
        bi = rp["norm1"]["bias"].astype(jnp.float32)
        a_eff = (inv * sc) * qb["qin"]
        c_eff = (bi - m * inv * sc) * qb["qin"]
        tau = None
        lo = 0.0
        if frn:
            lo = -127.0
            tau = jnp.broadcast_to(
                rp["norm1"]["tau"].astype(jnp.float32) * qb["qin"], (B, C))
        rb, sout2 = si8.res_site(r, a_eff, c_eff, w9b, qb["ws"],
                                 rp["conv2"]["b"].astype(jnp.float32), lo,
                                 tau=tau)
        m2, inv2 = _site_stats(f"r{i}in2", sout2)
        sc2 = rp["norm2"]["scale"].astype(jnp.float32)
        bi2 = rp["norm2"]["bias"].astype(jnp.float32)
        tact = None
        if frn:
            tact = jnp.broadcast_to(rp["act"]["tau"].astype(jnp.float32),
                                    (B, C))
        carry = (rb, inv2 * sc2, bi2 - m2 * inv2 * sc2, tact)
    rb, a2, c2, tact = carry
    y = (rb.astype(jnp.float32) * a2[:, None, None, :]
         + c2[:, None, None, :]).astype(y.dtype) + y
    if frn:
        y = jnp.maximum(y.astype(jnp.float32),
                        p["res"][-1]["act"]["tau"].astype(jnp.float32))
    else:
        y = jax.nn.relu(y.astype(jnp.float32))
    return y.astype(dt)


def _dec_quant_xla(y, p, quant, frn, static_stats=None):
    """XLA int8 deconv1+deconv2 — the parity reference for _dec_i8."""
    from ..ops.conv import conv2d_i8

    q1, q2 = quant["d1"], quant["d2"]
    xq = jnp.clip(jnp.round(y.astype(jnp.float32) * q1["qin"]),
                  -127.0, 127.0).astype(jnp.int8)
    xq = jnp.concatenate([xq[:, :1], xq, xq[:, -1:]], axis=1)
    xq = jnp.concatenate([xq[:, :, :1], xq, xq[:, :, -1:]], axis=2)
    r = (conv2d_i8(xq, q1["w"]).astype(jnp.float32) * q1["ws"]
         + p["d1_b"].astype(jnp.float32)).astype(y.dtype)
    m, inv = _frozen(static_stats, "in4") or _stats(r, 4, 96, frn)
    yd = d2s(r, 2, 96)
    sc = p["nd1"]["scale"].astype(jnp.float32)
    bi = p["nd1"]["bias"].astype(jnp.float32)
    a1 = ((inv * sc) * q2["qin"])[:, None, None, :]
    c1 = ((bi[None] - m * inv * sc) * q2["qin"])[:, None, None, :]
    v = yd.astype(jnp.float32) * a1 + c1
    if frn:
        v = jnp.maximum(v, p["nd1"]["tau"].astype(jnp.float32) * q2["qin"])
    rq = jnp.clip(jnp.round(v), 0.0 if not frn else -127.0,
                  127.0).astype(jnp.int8)
    rq = jnp.concatenate([rq[:, :1], rq, rq[:, -1:]], axis=1)
    rq = jnp.concatenate([rq[:, :, :1], rq, rq[:, :, -1:]], axis=2)
    r2 = (conv2d_i8(rq, q2["w"]).astype(jnp.float32) * q2["ws"]
          + p["d2_b"].astype(jnp.float32)).astype(y.dtype)
    m2, inv2 = _frozen(static_stats, "in5") or _stats(r2, 4, 48, frn)
    return _apply(r2, m2, inv2, p["nd2"], 4, frn)


def _dec_i8(y, p, quant, frn, static_stats=None):
    """deconv1+deconv2 (nearest-up + conv, edge-block halos) as fused int8
    sites: res_site halo="edge" reproduces _pad_edge_blocks exactly
    (edge-copied halo column + clamped head/tail row maps), deferred
    IN/FRN stats ride the kernel epilogues, TLU folds into the d2
    quantize floor. The d2s between stays XLA."""
    from . import s2d2_sites_i8 as si8

    B, H, W0, C = y.shape
    dt = y.dtype
    q1, q2 = quant["d1"], quant["d2"]
    ones = jnp.ones((B, C), jnp.float32)
    zeros = jnp.zeros((B, C), jnp.float32)

    w1 = q1["w"].reshape(9, C, -1)
    r, sout = si8.res_site(y, ones * q1["qin"], zeros, w1, q1["ws"],
                           p["d1_b"].astype(jnp.float32), -127.0,
                           halo="edge")
    fz = _frozen(static_stats, "in4")
    if fz is not None:
        # (1, 96) calibration stats -> (B, 96): a_eff/c_eff feed the d2
        # kernel's per-batch prologue rows
        m, inv = (jnp.broadcast_to(s, (B, s.shape[-1])) for s in fz)
    else:
        m, inv = si8._stats_phased(sout, float(H * W0), 4, 96)
        if frn:
            m = jnp.zeros_like(m)
            s2m = sout[:, 1].reshape(B, 4, 96).sum(1) / (4.0 * H * W0)
            inv = jax.lax.rsqrt(s2m + _EPS)
    yd = d2s(r, 2, 96)
    sc = p["nd1"]["scale"].astype(jnp.float32)
    bi = p["nd1"]["bias"].astype(jnp.float32)
    a_eff = (inv * sc) * q2["qin"]
    c_eff = (bi - m * inv * sc) * q2["qin"]
    tau = None
    lo = 0.0
    if frn:
        lo = -127.0
        tau = jnp.broadcast_to(
            p["nd1"]["tau"].astype(jnp.float32) * q2["qin"], (B, 96))
    w2 = q2["w"].reshape(9, 96, -1)
    r2, sout2 = si8.res_site(yd, a_eff, c_eff, w2, q2["ws"],
                             p["d2_b"].astype(jnp.float32), lo,
                             halo="edge", tau=tau)
    fz2 = _frozen(static_stats, "in5")
    if fz2 is not None:
        m2, inv2 = fz2
    else:
        m2, inv2 = si8._stats_phased(sout2, float(4 * H * W0), 4, 48)
        if frn:
            m2 = jnp.zeros_like(m2)
            s2m2 = sout2[:, 1].reshape(B, 4, 48).sum(1) / (16.0 * H * W0)
            inv2 = jax.lax.rsqrt(s2m2 + _EPS)
    sc2 = p["nd2"]["scale"].astype(jnp.float32)
    bi2 = p["nd2"]["bias"].astype(jnp.float32)
    v = (r2.astype(jnp.float32)
         * jnp.tile(inv2 * sc2, (1, 4))[:, None, None, :]
         + jnp.tile(bi2[None] - m2 * inv2 * sc2, (1, 4))[:, None, None, :])
    if frn:
        v = jnp.maximum(v, jnp.tile(p["nd2"]["tau"].astype(jnp.float32), 4))
    else:
        v = jax.nn.relu(v)
    return v.astype(dt)


def calibrate_act_scales(p: dict, x_cal, static_stats: dict | None = None) -> dict:
    """Per-res-site max|activation| from one jitted f32 forward (x_cal:
    [-1,1] NHWC). Same contract as transformer_net_s2d2.

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
    """Frozen per-site norm ``(mean, inv)`` from ONE jitted f32 calibration
    forward — the STATIC-NORM mode's statistics (transformer_net_s2d2
    contract; x_cal is the PREPROCESSED [-1,1] input). For FRN nets the
    frozen pair is ``(0, rsqrt(nu2+eps))`` — same affine algebra, so one
    representation serves both norm families. Stats average over the
    calibration batch (shape (1, C)) so any runtime batch broadcasts."""

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
    """Per-out-channel symmetric int8 res weights + folded activation
    scales (the transformer_net_s2d2.quantize_net contract), keyed
    r{i}{a,b} over the four res blocks."""
    from .s2d2_sites_i8 import quantize_site as qsite

    q = {}
    for i, rp in enumerate(p["res"]):
        for ab, ck in (("a", "conv1"), ("b", "conv2")):
            site = f"r{i}{ab}"
            if site in act_scales:
                q[site] = qsite(np.asarray(rp[ck]["w"], np.float32),
                                act_scales[site])
    for site, wk in (("d1", "d1_w"), ("d2", "d2_w")):
        if site in act_scales:
            q[site] = qsite(np.asarray(p[wk], np.float32), act_scales[site])
    return q


def apply(params: dict, x: jnp.ndarray, *, tap=None, quant=None,
          fused_sites=(), static_stats: dict | None = None,
          stats_out: dict | None = None) -> jnp.ndarray:
    """NHWC float in [-1,1] → stylized NHWC in [-1,1]. H, W divisible by 4.

    quant: optional quantize_net output — the res chain runs int8 (Pallas
    fused sites when "res_i8" in fused_sites and the geometry supports it,
    XLA int8 otherwise). tap: calibration hook (site, tensor).

    static_stats: optional ``{site: (mean, inv)}`` (sites ``in1..in5``,
    ``r{i}in1``/``r{i}in2`` — calibrate_in_stats) freezing every IN — or,
    on FRN nets, every FRN's nu2 — to calibration-time statistics: the
    STATIC-NORM engine modes (``--quantize bf16_static`` / ``int8_static``).
    The TLU taus are parameters, not statistics, so the activation is
    untouched. stats_out: optional dict filled with each measured
    ``(mean, inv)`` — the calibration hook."""
    p = params
    frn = bool(p["frn"])
    b, h, w, _ = x.shape
    hb = h // 2
    if tap is None:
        tap = lambda name, t: None  # noqa: E731

    def _st(site, t, phases, c):
        fz = _frozen(static_stats, site)
        if fz is not None:
            return fz
        ms, invs = _stats(t, phases, c, frn)
        if stats_out is not None:
            stats_out[site] = (ms, invs)
        return ms, invs

    ys = s2d(x, 2)
    if h >= 16 and w >= 16:
        y = _conv1_same_fixed(ys, p["c1_w"], p["c1_b"])
    else:
        y = conv2d(_pad_reflect_f2_4px(ys, 3), p["c1_w"], p["c1_b"])
    m, inv = _st("in1", y, 4, 48)
    y = _pad_stride2_halo(y, 48)
    y = _apply(y, m, inv, p["n1"], 4, frn)

    y = conv2d(y, p["c2_w"], p["c2_b"])               # [B, H/2, W/2, 96]
    m, inv = _st("in2", y, 1, 96)
    y = reflect_pad_2d(y, 1)
    y = _apply(y, m, inv, p["n2"], 1, frn)

    y = conv2d(y, p["c3_w"], p["c3_b"], stride=2)     # [B, H/4, W/4, 192]
    m, inv = _st("in3", y, 1, 192)
    y = _apply(y, m, inv, p["n3"], 1, frn)

    nres = len(p["res"])
    use_q = quant is not None and all(
        f"r{i}{ab}" in quant for i in range(nres) for ab in "ab")
    use_res_i8 = use_res_s8 = False
    if use_q and {"res_i8", "res_s8"} & set(fused_sites):
        from . import s2d2_sites_i8 as si8
        ok_geo = si8.res_supported(y.shape[1], y.shape[2])
        if "res_s8" in fused_sites and static_stats is not None:
            # s8-carry chain (frozen norms make every scale static);
            # falls back to res_i8 when stats/geometry don't allow it
            use_res_s8 = ok_geo and all(
                f"r{i}in{j}" in static_stats
                for i in range(nres) for j in (1, 2))
        if "res_i8" in fused_sites and not use_res_s8:
            use_res_i8 = ok_geo
    if use_res_s8:
        y = _res_chain_s8_static(y, p, quant, frn, static_stats)
    elif use_res_i8:
        y = _res_chain_i8(y, p, quant, frn, static_stats)
    elif use_q and not ({"res_i8", "res_s8"} & set(fused_sites)):
        # CPU/parity XLA-int8 branch; requested-but-unsupported res_i8
        # falls through to bf16 (XLA-i8 is the measured loss)
        y = _res_quant_xla(y, p, quant, frn, static_stats)
    else:
        for i, rp in enumerate(p["res"]):
            tap(f"r{i}a", y)
            r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"],
                       rp["conv1"]["b"])
            m, inv = _st(f"r{i}in1", r, 1, 192)
            r = _apply(r, m, inv, rp["norm1"], 1, frn)
            tap(f"r{i}b", r)
            r = conv2d(reflect_pad_2d(r, 1), rp["conv2"]["w"],
                       rp["conv2"]["b"])
            m, inv = _st(f"r{i}in2", r, 1, 192)
            r = _apply(r, m, inv, rp["norm2"], 1, frn, act=False)
            y = y + r
            # post-skip activation (reference: model.py:57-60)
            if frn:
                y = jnp.maximum(y.astype(jnp.float32),
                                rp["act"]["tau"].astype(jnp.float32)) \
                    .astype(y.dtype)
            else:
                y = jax.nn.relu(y)

    use_dec_s8 = use_dec_i8 = use_dec_xla = False
    if quant is not None and "d1" in quant and "d2" in quant:
        if ("dec_s8" in fused_sites and static_stats is not None
                and "in4" in static_stats and "in5" in static_stats):
            from . import s2d2_sites_i8 as si8
            use_dec_s8 = (si8.res_supported(y.shape[1], y.shape[2])
                          and si8.res_supported(2 * y.shape[1],
                                                2 * y.shape[2]))
        if "dec_i8" in fused_sites and not use_dec_s8:
            from . import s2d2_sites_i8 as si8
            use_dec_i8 = (si8.res_supported(y.shape[1], y.shape[2])
                          and si8.res_supported(2 * y.shape[1],
                                                2 * y.shape[2]))
        use_dec_xla = (not use_dec_s8 and not use_dec_i8
                       and "dec_xla_i8" in fused_sites)
    if use_dec_s8:
        y = _dec_s8_static(y, p, quant, frn, static_stats, y.dtype)
    elif use_dec_i8:
        y = _dec_i8(y, p, quant, frn, static_stats)
    elif use_dec_xla:
        y = _dec_quant_xla(y, p, quant, frn, static_stats)
    else:
        tap("d1", y)
        y = _pad_edge_blocks(y)
        y = conv2d(y, p["d1_w"], p["d1_b"])           # [B, H/4, W/4, 384]
        m, inv = _st("in4", y, 4, 96)
        y = d2s(y, 2, 96)                             # [B, H/2, W/2, 96]
        y = _apply(y, m, inv, p["nd1"], 1, frn)

        tap("d2", y)
        y = _pad_edge_blocks(y)
        y = conv2d(y, p["d2_w"], p["d2_b"])           # [B, H/2, W/2, 192]
        m, inv = _st("in5", y, 4, 48)
        y = _apply(y, m, inv, p["nd2"], 4, frn)

    if hb >= 8 and (w // 2) >= 8:
        def _d3_strip(sl):
            ps = _pad_reflect_f2_4px(sl, 48)
            rs = conv2d(ps, p["d3_w"])
            n = rs.shape[1] - 4
            return sum(rs[:, dy : dy + n, :, dy * 12 : (dy + 1) * 12]
                       for dy in range(5))
        top = _d3_strip(y[:, :4])[:, :2]
        bot = _d3_strip(y[:, -4:])[:, -2:]
        lef = _d3_strip(y[:, :, :4])[:, :, :2]
        rig = _d3_strip(y[:, :, -4:])[:, :, -2:]
        rows = conv2d(y, p["d3_w"], padding=(2, 2))
        y12 = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                  for dy in range(5))
        y12 = y12.at[:, :2].set(top)
        y12 = y12.at[:, -2:].set(bot)
        y12 = y12.at[:, :, :2].set(lef)
        y12 = y12.at[:, :, -2:].set(rig)
    else:
        yp = _pad_reflect_f2_4px(y, 48)
        rows = conv2d(yp, p["d3_w"])
        y12 = sum(rows[:, dy : dy + hb, :, dy * 12 : (dy + 1) * 12]
                  for dy in range(5))
    y12 = y12 + p["d3_b"].astype(y12.dtype)
    return jnp.tanh(d2s(y12, 2, 3))