"""mk35: in-net STATIC-NORM A/B — the s2d2 net at 1080p: dynamic bf16 vs
bf16_static (frozen IN stats) vs int8 pal+dec vs int8_static (frozen IN +
fused int8 sites). Same process / same protocol as the headline bench.

Quality lines report MAE on noise-perturbed variants of the calibration
frame (the mode's intra-video contract, sigma 0.03) AND on an independent
random frame (harsh: random-gain nets amplify IN drift ~10x/block)."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments._bench import timed_step
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

H, W = (int(s) for s in os.environ.get("SHAPE", "1080,1920").split(","))


def main():
    import os

    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    if jax.devices()[0].platform == "cpu":
        # CPU smoke runs (SHAPE=64,512): Pallas only has interpret mode
        from neuralstyletransferv1_tpu.models import s2d2_sites, s2d2_sites_i8
        s2d2_sites._INTERPRET = s2d2_sites_i8._INTERPRET = True
    params = transformer_net.init(jax.random.key(0))
    bp32 = s2d2.bake_io_affine(s2d2.from_johnson_params(params),
                               "imagenet_255")
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp32)

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    stats = s2d2.calibrate_in_stats(bp32, xc)
    scales = s2d2.calibrate_act_scales(bp32, xc)
    quant = {k: v for k, v in
             s2d2.quantize_net(bp32, scales).items()
             if k.startswith("r") or k in ("d1", "d2")}
    scales_s = s2d2.calibrate_act_scales(bp32, xc, static_stats=stats)
    quant_s_full = s2d2.quantize_net(bp32, scales_s)
    quant_s = {k: v for k, v in quant_s_full.items()
               if k.startswith("r") or k in ("d1", "d2")}
    # + c2/c3 for the head rows (pair-packed head sites under frozen
    # in2/in3 — the static head_chain)
    quant_sh = {k: v for k, v in quant_s_full.items()
                if k.startswith("r") or k in ("c2", "c3", "d1", "d2")}
    # + d3 for the tail rows (d2 emits deconv3's s8 input, fused d3 site)
    quant_st = {k: v for k, v in quant_s_full.items()
                if k.startswith("r") or k in ("d1", "d2", "d3")}
    quant_sf = {k: v for k, v in quant_s_full.items()
                if k.startswith("r")
                or k in ("c2", "c3", "d1", "d2", "d3")}

    def step_bf16(x):
        return jnp.clip(s2d2.apply(bp, x), 0.0, 1.0)

    def step_bf16_static(x):
        return jnp.clip(s2d2.apply(bp, x, static_stats=stats), 0.0, 1.0)

    def step_i8(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant,
                                   fused_sites=("res_i8", "dec_i8")),
                        0.0, 1.0)

    def step_i8_static(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_i8", "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c(x):
        # s8-carry res chain (res_site_s8o/site_s8 with reflect halos +
        # frozen affines): bf16 a-raws never exist in HBM
        return jnp.clip(s2d2.apply(bp, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c_ds8(x):
        # + dec on the s8 carry too (d2s shuffle at s8)
        return jnp.clip(s2d2.apply(bp, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_s8", "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c_head(x):
        # + the pair-packed int8 head under frozen in2/in3 (static
        # head_chain): the whole c2..d2 region is Pallas
        return jnp.clip(s2d2.apply(bp, x, quant=quant_sh, static_stats=stats,
                                   fused_sites=("head_i8", "res_s8",
                                                "res_i8", "dec_s8",
                                                "dec_i8")),
                        0.0, 1.0)

    def step_i8_s8c_tail(x):
        # + the fused s8 deconv3 tail (d2 emits d3's s8 input, frozen
        # in5 folded; the bf16 d2 raw and the 60-lane K tensor never
        # exist in HBM)
        return jnp.clip(s2d2.apply(bp, x, quant=quant_st, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_s8", "dec_i8",
                                                "tail_s8")),
                        0.0, 1.0)

    def step_i8_s8c_full(x):
        # head + tail: everything from c2 to d3 rides Pallas s8 carries
        return jnp.clip(s2d2.apply(bp, x, quant=quant_sf, static_stats=stats,
                                   fused_sites=("head_i8", "res_s8",
                                                "res_i8", "dec_s8",
                                                "dec_i8", "tail_s8")),
                        0.0, 1.0)

    # the mk32 BN-form insight applied to the flagship: with frozen norms
    # every quantize affine is a compile-time constant XLA folds into conv
    # epilogues — NO Pallas sites, quantized convs ride plain XLA int8
    # (t7_bn measured 181.2 fps B48 this way vs 168.3 for its best Pallas
    # chain). d3 stays bf16 (XLA-i8 d3 is a measured catastrophe — s32
    # materialization, PERF.md), conv1 stays bf16 (shallow 12-ch).
    quant_xla = {k: v for k, v in quant_s_full.items()
                 if k in s2d2.QUANT_SITES}

    def step_i8_xla(x):
        return jnp.clip(s2d2.apply(bp, x, quant=quant_xla,
                                   static_stats=stats, fused_sites=()),
                        0.0, 1.0)

    def step_i8_xla_res(x):
        # XLA-i8 only where the Pallas chains run today (r* + d1/d2):
        # isolates kernel-vs-XLA on identical quantized site sets
        return jnp.clip(s2d2.apply(bp, x, quant=quant_s,
                                   static_stats=stats, fused_sites=()),
                        0.0, 1.0)

    variants = [("bf16-static", step_bf16_static),
                ("i8-pal+dec", step_i8), ("i8-static", step_i8_static),
                ("i8-s8c", step_i8_s8c), ("i8-s8c+ds8", step_i8_s8c_ds8),
                ("i8-s8c+head", step_i8_s8c_head),
                ("i8-s8c+tail", step_i8_s8c_tail),
                ("i8-s8c+full", step_i8_s8c_full),
                ("i8-xla", step_i8_xla),
                ("i8-xla-res", step_i8_xla_res)]
    only = os.environ.get("VARIANTS")
    if only:
        want = {v.strip() for v in only.split(",") if v.strip()}
        variants = [(n, f) for n, f in variants if n in want]

    k1, k2 = jax.random.split(jax.random.key(42))
    xg = jnp.clip(xc.astype(jnp.bfloat16)
                  + 0.03 * jax.random.normal(k1, (2, H, W, 3), jnp.bfloat16),
                  0.0, 1.0)
    xi = jax.random.uniform(k2, (1, H, W, 3), jnp.bfloat16)
    yg = np.asarray(jax.jit(step_bf16)(xg), np.float32)
    yi = np.asarray(jax.jit(step_bf16)(xi), np.float32)
    for name, fn in variants:
        dg = np.abs(yg - np.asarray(jax.jit(fn)(xg), np.float32))
        di = np.abs(yi - np.asarray(jax.jit(fn)(xi), np.float32))
        print(f"quality {name}: MAE {dg.mean():.5f} max {dg.max():.4f} "
              f"(indep MAE {di.mean():.5f})", flush=True)

    batches = tuple(int(b) for b in
                    os.environ.get("BATCHES", "16,48").split(","))
    for B in batches:
        for name, fn in [("bf16", step_bf16)] + variants:
            t = timed_step(fn, B, H, W)
            print(f"[{name} B{B}] {t*1e3:.1f} ms/batch  {B/t:.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
