"""mk33: in-net int8 A/B for the NST fast path at 1080p — bf16 vs XLA-int8
vs the Pallas fused res chain. The pad-40 grid puts the res chain at
290x500: width pads to 504 in-chain and the kernels mask the padding
columns (sw) — this harness is the production-geometry check for that.

BATCHES=16,48 to override.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from experiments._bench import timed_step
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import transformer_net_nst
from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

H, W = 1080, 1920


def main():
    import os

    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    p32 = nstf.from_nst_params(transformer_net_nst.init(jax.random.key(0)))
    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p32)

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = nstf.calibrate_act_scales(p32, xc)
    quant = nstf.quantize_net(p32, scales)
    print(f"sites: {sorted(quant)}", flush=True)
    # static-norm rows (frozen IN; --quantize bf16_static / int8_static)
    stats = nstf.calibrate_in_stats(p32, xc)
    scales_s = nstf.calibrate_act_scales(p32, xc, static_stats=stats)
    quant_s = nstf.quantize_net(p32, scales_s)

    def step_bf16(x):
        return jnp.clip(nstf.apply(pb, x), 0.0, 1.0)

    def step_bf16_static(x):
        return jnp.clip(nstf.apply(pb, x, static_stats=stats), 0.0, 1.0)

    def step_i8_static(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_i8",)), 0.0, 1.0)

    def step_i8_static_dec(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_i8", "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c(x):
        # s8-carry res chain (a-sites emit b-site s8 inputs; frozen in1
        # folded into the emit quantize; bf16 a-raws never exist in HBM)
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8")),
                        0.0, 1.0)

    def step_i8_s8c_dec(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c_ds8(x):
        # + deconv1/2 on the s8 carry (frozen in4 folded into d1's emit
        # quantize; d2s at s8)
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_s8", "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c_tail(x):
        # + the fused s8 output-conv tail (d2 emits the tap-packed 1x5
        # conv's s8 input, frozen in5 folded; dy-sum in VMEM)
        return jnp.clip(nstf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_s8", "dec_i8",
                                                "tail_s8")),
                        0.0, 1.0)

    def step_xla_i8(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant), 0.0, 1.0)

    def step_pal_i8(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant,
                                   fused_sites=("res_i8",)), 0.0, 1.0)

    def step_pal_dec(x):
        return jnp.clip(nstf.apply(pb, x, quant=quant,
                                   fused_sites=("res_i8", "dec_i8")),
                        0.0, 1.0)

    def step_pal_all(x):
        return jnp.clip(
            nstf.apply(pb, x, quant=quant,
                       fused_sites=("res_i8", "dec_i8", "c2_i8")), 0.0, 1.0)

    y0 = np.asarray(jax.jit(step_bf16)(xc.astype(jnp.bfloat16)), np.float32)
    for name, fn in (("xla-i8", step_xla_i8), ("pal-i8", step_pal_i8),
                     ("pal+dec", step_pal_dec), ("pal+all", step_pal_all)):
        y = np.asarray(jax.jit(fn)(xc.astype(jnp.bfloat16)), np.float32)
        d = np.abs(y0 - y)
        print(f"quality {name}: MAE {d.mean():.5f} max {d.max():.4f}",
              flush=True)
    # static rows measure against dynamic bf16 on sigma-.03 perturbed calib
    # frames (the intra-video contract) — on xc itself they are exact
    k1 = jax.random.key(42)
    xg = jnp.clip(xc.astype(jnp.bfloat16)
                  + 0.03 * jax.random.normal(k1, (2, H, W, 3), jnp.bfloat16),
                  0.0, 1.0)
    yg = np.asarray(jax.jit(step_bf16)(xg), np.float32)
    for name, fn in (("bf16-static", step_bf16_static),
                     ("i8-static", step_i8_static),
                     ("i8-static+dec", step_i8_static_dec),
                     ("i8-s8c", step_i8_s8c),
                     ("i8-s8c+dec", step_i8_s8c_dec),
                     ("i8-s8c+ds8", step_i8_s8c_ds8),
                     ("i8-s8c+tail", step_i8_s8c_tail)):
        d = np.abs(yg - np.asarray(jax.jit(fn)(xg), np.float32))
        print(f"quality {name}: MAE {d.mean():.5f} max {d.max():.4f}",
              flush=True)

    if os.environ.get("BATCHES"):
        batches = tuple(int(b) for b in os.environ["BATCHES"].split(","))
    else:
        batches = (16, 48)
    for B in batches:
        for name, fn in (("bf16  ", step_bf16), ("xla-i8", step_xla_i8),
                         ("pal-i8", step_pal_i8), ("pal+dec", step_pal_dec),
                         ("pal+all", step_pal_all),
                         ("bf16-static", step_bf16_static),
                         ("i8-static", step_i8_static),
                         ("i8-static+dec", step_i8_static_dec),
                         ("i8-s8c", step_i8_s8c),
                         ("i8-s8c+dec", step_i8_s8c_dec),
                         ("i8-s8c+ds8", step_i8_s8c_ds8),
                         ("i8-s8c+tail", step_i8_s8c_tail)):
            t = timed_step(fn, B, H, W)
            print(f"[{name} B{B}] {t*1e3:.1f} ms/batch  {B/t:.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
