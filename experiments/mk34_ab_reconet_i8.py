"""mk34: in-net int8 A/B for the ReCoNet fast path at 1080p — bf16 vs
XLA-int8 vs the Pallas fused res sites (reflect halos, C=192, FRN/TLU via
the per-channel quantize floor). NORM=in (default) or NORM=frn.
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
from neuralstyletransferv1_tpu.models import reconet
from neuralstyletransferv1_tpu.models import reconet_fast as recf

H, W = 1080, 1920


def main():
    import os

    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    frn = os.environ.get("NORM", "in") == "frn"
    p32 = recf.from_reconet_params(reconet.init(jax.random.key(0), frn=frn))
    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p32)

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32,
                            -1.0, 1.0)
    scales = recf.calibrate_act_scales(p32, xc)
    quant = recf.quantize_net(p32, scales)
    print(f"frn={frn} sites: {sorted(quant)}", flush=True)
    # static-norm rows (frozen IN / FRN nu2)
    stats = recf.calibrate_in_stats(p32, xc)
    scales_s = recf.calibrate_act_scales(p32, xc, static_stats=stats)
    quant_s = recf.quantize_net(p32, scales_s)

    # [-1,1] in/out like the reference wrapper; the clip cost rides all
    def step_bf16(x):
        return jnp.clip(recf.apply(pb, x), -1.0, 1.0)

    def step_xla_i8(x):
        return jnp.clip(recf.apply(pb, x, quant=quant), -1.0, 1.0)

    def step_pal_i8(x):
        return jnp.clip(recf.apply(pb, x, quant=quant,
                                   fused_sites=("res_i8",)), -1.0, 1.0)

    def step_pal_dec(x):
        return jnp.clip(recf.apply(pb, x, quant=quant,
                                   fused_sites=("res_i8", "dec_i8")),
                        -1.0, 1.0)

    def step_bf16_static(x):
        return jnp.clip(recf.apply(pb, x, static_stats=stats), -1.0, 1.0)

    def step_i8_static(x):
        return jnp.clip(recf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_i8",)), -1.0, 1.0)

    def step_i8_static_dec(x):
        return jnp.clip(recf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_i8", "dec_i8")),
                        -1.0, 1.0)

    def step_i8_s8c(x):
        # s8-carry res chain (a-sites emit b-site s8 inputs with the
        # frozen norm1 affine — and FRN tau floor — folded; reflect halos)
        return jnp.clip(recf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8")),
                        -1.0, 1.0)

    def step_i8_s8c_dec(x):
        return jnp.clip(recf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_i8")),
                        -1.0, 1.0)

    def step_i8_s8c_ds8(x):
        # + deconv1/2 on the s8 carry (frozen in4 + activation folded
        # into d1's emit quantize; d2s at s8, edge halos)
        return jnp.clip(recf.apply(pb, x, quant=quant_s, static_stats=stats,
                                   fused_sites=("res_s8", "res_i8",
                                                "dec_s8", "dec_i8")),
                        -1.0, 1.0)

    y0 = np.asarray(jax.jit(step_bf16)(xc.astype(jnp.bfloat16)), np.float32)
    for name, fn in (("xla-i8", step_xla_i8), ("pal-i8", step_pal_i8),
                     ("pal+dec", step_pal_dec)):
        y = np.asarray(jax.jit(fn)(xc.astype(jnp.bfloat16)), np.float32)
        d = np.abs(y0 - y)
        print(f"quality {name}: MAE {d.mean():.5f} max {d.max():.4f}",
              flush=True)
    # static rows measure against dynamic bf16 on sigma-.03 perturbed calib
    # frames (the intra-video contract) — on xc itself they are exact
    xg = jnp.clip(xc.astype(jnp.bfloat16)
                  + 0.03 * jax.random.normal(jax.random.key(42),
                                             (2, H, W, 3), jnp.bfloat16),
                  -1.0, 1.0)
    yg = np.asarray(jax.jit(step_bf16)(xg), np.float32)
    for name, fn in (("bf16-static", step_bf16_static),
                     ("i8-static", step_i8_static),
                     ("i8-static+dec", step_i8_static_dec),
                     ("i8-s8c", step_i8_s8c),
                     ("i8-s8c+dec", step_i8_s8c_dec),
                     ("i8-s8c+ds8", step_i8_s8c_ds8)):
        d = np.abs(yg - np.asarray(jax.jit(fn)(xg), np.float32))
        print(f"quality {name}: MAE {d.mean():.5f} max {d.max():.4f}",
              flush=True)

    if os.environ.get("BATCHES"):
        batches = tuple(int(b) for b in os.environ["BATCHES"].split(","))
    else:
        batches = (16,)
    for B in batches:
        for name, fn in (("bf16  ", step_bf16), ("xla-i8", step_xla_i8),
                         ("pal-i8", step_pal_i8), ("pal+dec", step_pal_dec),
                         ("bf16-static", step_bf16_static),
                         ("i8-static", step_i8_static),
                         ("i8-static+dec", step_i8_static_dec),
                         ("i8-s8c", step_i8_s8c),
                         ("i8-s8c+dec", step_i8_s8c_dec),
                         ("i8-s8c+ds8", step_i8_s8c_ds8)):
            t = timed_step(fn, B, H, W)
            print(f"[{name} B{B}] {t*1e3:.1f} ms/batch  {B/t:.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
