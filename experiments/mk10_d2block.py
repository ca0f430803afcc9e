"""Experiment: d2 as four phase-split block convs at the 270 grid.

Today: d2 = [3,3,64,128] conv @540 grid (Cin=64 = half MXU contraction,
measured 59.6 TF/s standalone). The input is d2s(d1_out) — d1_out is
ALREADY the 256ch@270 f2 view, so instead compute each 540-phase (u,v) of
the d2 output directly at the 270 grid with a [2,2,256,128] conv
(K=1024-contraction, full lanes), then d2s-interleave the four outputs
(same traffic as the d2s the old path does on the input side).

a = u + 2*alpha + pu - 1, b = v + 2*beta + pv - 1  (zero outside 0..2)

Also: B-sweep of the baseline net.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import io_presets as iop
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2
from neuralstyletransferv1_tpu.models.transformer_net_s2d import (
    _apply_in_relu, _in_stats, _pad_edge_blocks, _phase_rows, d2s)
from neuralstyletransferv1_tpu.ops.conv import conv2d

H, W = 1080, 1920
CHAIN = 8


def scatter_d2_block(w3):
    """[3,3,64,128] @540 -> dict[(u,v)] = [2,2,256,128] @270."""
    out = {}
    ci, co = 64, w3.shape[-1]
    for u in range(2):
        for v in range(2):
            w4 = np.zeros((2, 2, 4 * ci, co), np.float32)
            for al in range(2):
                for be in range(2):
                    for pu in range(2):
                        for pv in range(2):
                            a = u + 2 * al + pu - 1
                            b = v + 2 * be + pv - 1
                            if 0 <= a <= 2 and 0 <= b <= 2:
                                w4[al, be,
                                   (pu * 2 + pv) * ci:(pu * 2 + pv + 1) * ci] \
                                    += np.asarray(w3[a, b], np.float32)
            out[(u, v)] = jnp.asarray(w4)
    return out


def pad_phase_edge(z, c=64):
    """1 halo block per side on the 270 grid encoding the 540-grid
    nearest-up edge/reflect pad (phase 1 from block 0 on the left/top,
    phase 0 from block -1 on the right/bottom; other slots unread)."""
    lh = _phase_rows(z, [0, 0], [1, 1], 2, c, axis=1)
    rh = _phase_rows(z, [-1, -1], [0, 0], 2, c, axis=1)
    z = jnp.concatenate([lh, z, rh], axis=1)
    lw = _phase_rows(z, [0, 0], [1, 1], 2, c, axis=2)
    rw = _phase_rows(z, [-1, -1], [0, 0], 2, c, axis=2)
    return jnp.concatenate([lw, z, rw], axis=2)


def d2_block_form(z, m, inv, scale, bias, w4, b3):
    """z: (B,270,480,256) raw d1 output. Returns (B,540,960,128)."""
    zn = _apply_in_relu(z, m, inv, scale, bias, 4)
    zp = pad_phase_edge(zn)
    hb, wb = z.shape[1], z.shape[2]
    ys = []
    for u in range(2):
        for v in range(2):
            sl = zp[:, u:u + hb + 1, v:v + wb + 1]
            ys.append(conv2d(sl, w4[(u, v)], b3))
    y = jnp.concatenate(ys, axis=-1)        # (B,270,480,512) phases (u2+v)
    return d2s(y, 2, 128)                   # (B,540,960,128)


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0])
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))
    # bp's d2_w is the scattered [3,3,64,128] @540; scatter THE SAME
    # weights into the four [2,2,256,128] block kernels.
    w4 = {k: v.astype(jnp.bfloat16)
          for k, v in scatter_d2_block(
              np.asarray(bp["d2_w"], np.float32)).items()}

    # ---------- exactness on the isolated site ----------
    B = 2
    z = jax.random.normal(jax.random.key(5), (B, 270, 480, 256), jnp.bfloat16)
    m, inv = _in_stats(z, 4, 64)
    sc, bi = bp["in4"]["scale"], bp["in4"]["bias"]

    def old_site(z):
        y = d2s(z, 2, 64)
        y = _pad_edge_blocks(y)
        y = _apply_in_relu(y, m, inv, sc, bi, 1)
        return conv2d(y, bp["d2_w"], bp["d2_b"])

    def new_site(z):
        return d2_block_form(z, m, inv, sc, bi, w4, bp["d2_b"])

    y0 = jax.jit(old_site)(z)
    y1 = jax.jit(new_site)(z)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) -
                                y1.astype(jnp.float32))))
    print(f"site shapes {y0.shape} {y1.shape}  maxerr {err:.2e}")

    # ---------- in-net A/B ----------
    def step(use_block):
        def f(x):
            xin = iop.preprocess("imagenet_255", x)
            from neuralstyletransferv1_tpu.models.transformer_net_s2d2 import (
                _pad_reflect_f2_4px)
            from neuralstyletransferv1_tpu.models.transformer_net_s2d import (
                _pad_stride2_halo)
            from neuralstyletransferv1_tpu.ops.norm import instance_norm
            from neuralstyletransferv1_tpu.ops.pad import reflect_pad_2d
            from neuralstyletransferv1_tpu.models.transformer_net_s2d import s2d
            p = bp
            y = _pad_reflect_f2_4px(s2d(xin, 2), 3)
            y = conv2d(y, p["c1_w"], p["c1_b"])
            mm, ii = _in_stats(y, 4, 32)
            y = _pad_stride2_halo(y, 32)
            y = _apply_in_relu(y, mm, ii, p["in1"]["scale"], p["in1"]["bias"], 4)
            y = conv2d(y, p["c2_w"], p["c2_b"])
            mm, ii = _in_stats(y, 1, 64)
            y = reflect_pad_2d(y, 1)
            y = _apply_in_relu(y, mm, ii, p["in2"]["scale"], p["in2"]["bias"], 1)
            y = conv2d(y, p["c3_w"], p["c3_b"], stride=2)
            mm, ii = _in_stats(y, 1, 128)
            y = _apply_in_relu(y, mm, ii, p["in3"]["scale"], p["in3"]["bias"], 1)
            for i in range(1, 6):
                rp = p[f"res{i}"]
                r = conv2d(reflect_pad_2d(y, 1), rp["conv1"]["w"], rp["conv1"]["b"])
                mm, ii = _in_stats(r, 1, 128)
                r = reflect_pad_2d(r, 1)
                r = _apply_in_relu(r, mm, ii, rp["in1"]["scale"], rp["in1"]["bias"], 1)
                r = conv2d(r, rp["conv2"]["w"], rp["conv2"]["b"])
                y = instance_norm(r, rp["in2"]["scale"], rp["in2"]["bias"]) + y
            y = _pad_edge_blocks(y)
            y = conv2d(y, p["d1_w"], p["d1_b"])
            mm, ii = _in_stats(y, 4, 64)
            if use_block:
                y = d2_block_form(y, mm, ii, p["in4"]["scale"],
                                  p["in4"]["bias"], w4, p["d2_b"])
            else:
                y = d2s(y, 2, 64)
                y = _pad_edge_blocks(y)
                y = _apply_in_relu(y, mm, ii, p["in4"]["scale"], p["in4"]["bias"], 1)
                y = conv2d(y, p["d2_w"], p["d2_b"])
            mm, ii = _in_stats(y, 4, 32)
            y = _pad_reflect_f2_4px(y, 32)
            y = _apply_in_relu(y, mm, ii, p["in5"]["scale"], p["in5"]["bias"], 4)
            hb = x.shape[1] // 2
            rows = conv2d(y, p["d3_w"])
            y = sum(rows[:, dy:dy + hb, :, dy * 12:(dy + 1) * 12]
                    for dy in range(5))
            y = y + p["d3_b"].astype(y.dtype)
            y = d2s(y, 2, 3)
            return iop.postprocess("imagenet_255", y)
        return f

    def timed(fn, batch, chain, repeats=2):
        g = jax.jit(lambda x: jnp.sum(
            jax.lax.fori_loop(0, chain, lambda i, y: fn(y).astype(y.dtype), x)
            .astype(jnp.float32)))
        x = jax.random.uniform(jax.random.key(0), (batch, H, W, 3), jnp.bfloat16)
        float(g(x))
        best = float("inf")
        for r in range(repeats):
            x2 = jax.random.uniform(jax.random.key(100 + r), (batch, H, W, 3),
                                    jnp.bfloat16)
            float(jnp.sum(x2.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(x2))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, ub in (("old-d2  ", False), ("block-d2", True)):
        tC = timed(step(ub), 16, CHAIN)
        t1 = timed(step(ub), 16, 1)
        per = (tC - t1) / (CHAIN - 1)
        print(f"B16 {name}: {per*1e3:7.2f} ms/batch  {16/per:6.1f} fps")

    # ---------- B-sweep on the better form ----------
    for B_ in (24, 32):
        tC = timed(step(False), B_, CHAIN)
        t1 = timed(step(False), B_, 1)
        per = (tC - t1) / (CHAIN - 1)
        print(f"B{B_} old     : {per*1e3:7.2f} ms/batch  {B_/per:6.1f} fps")


if __name__ == "__main__":
    main()
