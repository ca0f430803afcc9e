"""mk24: in-net int8 A/B — the full s2d2 net at 1080p, bf16 vs --quantize
int8 structure (same process, same protocol as the headline bench), plus
the quality check (MAE of clipped outputs)."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments._bench import timed_step
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

H, W = 1080, 1920


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    params = transformer_net.init(jax.random.key(0))
    bp32 = s2d2.bake_io_affine(s2d2.from_johnson_params(params), "imagenet_255")
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp32)

    import os
    drop = set((os.environ.get("DROP_SITES") or "").split(",")) - {""}
    only = set((os.environ.get("ONLY_SITES") or "").split(",")) - {""}
    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = s2d2.calibrate_act_scales(bp32, xc,
                                       sites=s2d2.QUANT_SITES_PALLAS)
    if only:
        def keep(k):
            return k in only or ("res" in only and k.startswith("r"))
        scales = {k: v for k, v in scales.items() if keep(k)}
    scales = {k: v for k, v in scales.items() if k not in drop}
    # d3 rides ONLY the Pallas site (XLA-i8 d3 is the measured s32-OOM
    # catastrophe) — step_pallas3 gets the superset dict, everything else
    # the XLA-safe one.
    quant3 = s2d2.quantize_net(bp32, scales)
    quant_head = {k: v for k, v in quant3.items() if k != "d3"}
    # the baseline (non-head) steps must NOT carry c2/c3: without the
    # head_i8 kernels those sites fall back to XLA-int8 — the documented
    # measured loss — which would contaminate the pal+dec baseline row of
    # the head adoption A/B.
    quant = {k: v for k, v in quant_head.items() if k not in ("c2", "c3")}
    print(f"sites: {sorted(quant3)}", flush=True)

    def step_bf16(x):
        return jnp.clip(s2d2.apply(bp, x), 0.0, 1.0)

    def step_int8(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant), 0.0, 1.0)

    def step_pallas(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant,
                                   fused_sites=("res_i8",)), 0.0, 1.0)

    def step_pallas2(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant,
                                   fused_sites=("res_i8", "dec_i8")),
                        0.0, 1.0)

    quant_d3 = {k: v for k, v in quant3.items() if k not in ("c2", "c3")}

    def step_pallas3(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant_d3,
                                   fused_sites=("res_i8", "dec_i8", "d3_i8")),
                        0.0, 1.0)

    def step_pallas4(x):
        return jnp.clip(
            s2d2.apply(bp, x, quant=quant_head,
                       fused_sites=("res_i8", "dec_i8", "head_i8")),
            0.0, 1.0)

    # quality on a real-ish input
    y0 = np.asarray(jax.jit(step_bf16)(xc.astype(jnp.bfloat16)), np.float32)
    y1 = np.asarray(jax.jit(step_int8)(xc.astype(jnp.bfloat16)), np.float32)
    d = np.abs(y0 - y1)
    print(f"quality xla-i8:    MAE {d.mean():.5f} max {d.max():.4f}",
          flush=True)
    y2 = np.asarray(jax.jit(step_pallas)(xc.astype(jnp.bfloat16)), np.float32)
    d2 = np.abs(y0 - y2)
    print(f"quality pallas-i8: MAE {d2.mean():.5f} max {d2.max():.4f} "
          f"(vs xla-i8 MAE {np.abs(y1 - y2).mean():.5f})", flush=True)
    if "d1" in quant and "d2" in quant:
        y3 = np.asarray(jax.jit(step_pallas2)(xc.astype(jnp.bfloat16)),
                        np.float32)
        d3 = np.abs(y0 - y3)
        print(f"quality pallas+dec: MAE {d3.mean():.5f} max {d3.max():.4f} "
              f"(vs xla-i8 MAE {np.abs(y1 - y3).mean():.5f})", flush=True)
    if "d3" in quant3:
        y4 = np.asarray(jax.jit(step_pallas3)(xc.astype(jnp.bfloat16)),
                        np.float32)
        d4 = np.abs(y0 - y4)
        print(f"quality pallas+d3:  MAE {d4.mean():.5f} max {d4.max():.4f}",
              flush=True)
    if "c2" in quant and "c3" in quant:
        y5 = np.asarray(jax.jit(step_pallas4)(xc.astype(jnp.bfloat16)),
                        np.float32)
        d5 = np.abs(y0 - y5)
        print(f"quality pallas+head: MAE {d5.mean():.5f} max {d5.max():.4f}",
              flush=True)

    import os as _os
    if _os.environ.get("BATCHES"):
        batches = tuple(int(b) for b in _os.environ["BATCHES"].split(","))
    else:
        batches = (16,) if _os.environ.get("ONLY_SITES") else (16, 48)
    for B in batches:
        tb = timed_step(step_bf16, B, H, W)
        print(f"[bf16      B{B}] {tb*1e3:.1f} ms/batch  {B/tb:.1f} fps",
              flush=True)
        ti = timed_step(step_int8, B, H, W)
        print(f"[int8-xla  B{B}] {ti*1e3:.1f} ms/batch  {B/ti:.1f} fps",
              flush=True)
        tp = timed_step(step_pallas, B, H, W)
        print(f"[int8-pal  B{B}] {tp*1e3:.1f} ms/batch  {B/tp:.1f} fps",
              flush=True)
        if "d1" in quant and "d2" in quant:
            tq = timed_step(step_pallas2, B, H, W)
            print(f"[i8-pal+dec B{B}] {tq*1e3:.1f} ms/batch  {B/tq:.1f} fps",
                  flush=True)
        if "d3" in quant3:
            tr = timed_step(step_pallas3, B, H, W)
            print(f"[i8-pal+d3  B{B}] {tr*1e3:.1f} ms/batch  {B/tr:.1f} fps",
                  flush=True)
        if "c2" in quant and "c3" in quant:
            th = timed_step(step_pallas4, B, H, W)
            print(f"[i8-pal+head B{B}] {th*1e3:.1f} ms/batch {B/th:.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
