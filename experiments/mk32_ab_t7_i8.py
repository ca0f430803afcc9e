"""mk32: in-net int8 A/B for the .t7 fast path — a synthetic eccv16-shaped
Johnson net (c0=32, 5 res blocks) at 1080p, bf16 vs XLA-int8 vs the Pallas
fused res-chain (io/t7_fast._t7_res_chain_i8, zero halos).

NORM=bn (default, BN-folded: rn=None — the eccv16 checkpoints) or NORM=in
(instance-norm variants: deferred stats ride the kernel epilogues).
BATCHES=16,48 to override.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from experiments._bench import timed_step
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.io import t7_fast

H, W = 1080, 1920
rng = np.random.default_rng(7)


def _conv(ci, co, k, s, p):
    return {"op": "conv",
            "w": rng.normal(0, 0.05, (k, k, ci, co)).astype(np.float32),
            "b": rng.normal(0, 0.05, co).astype(np.float32),
            "stride": (s, s), "pad": (p, p)}


def _bn(c):
    return {"op": "batchnorm",
            "weight": rng.uniform(0.8, 1.2, c).astype(np.float32),
            "bias": rng.normal(0, 0.1, c).astype(np.float32),
            "running_mean": rng.normal(0, 0.2, c).astype(np.float32),
            "running_var": rng.uniform(0.8, 1.2, c).astype(np.float32),
            "eps": 1e-5}


def _in(c):
    return {"op": "instancenorm",
            "weight": rng.uniform(0.8, 1.2, c).astype(np.float32),
            "bias": rng.normal(0, 0.1, c).astype(np.float32), "eps": 1e-5}


def _convT(ci, co, k, p, adj):
    return {"op": "conv_transpose",
            "w": rng.normal(0, 0.05, (k, k, co, ci)).astype(np.float32),
            "b": rng.normal(0, 0.05, co).astype(np.float32),
            "stride": 2, "pad": p, "adj": adj}


def _layers(C=32, nres=5, norm="bn"):
    nm = _bn if norm == "bn" else _in

    def _res(c):
        body = [_conv(c, c, 3, 1, 1), nm(c), {"op": "relu"},
                _conv(c, c, 3, 1, 1), nm(c)]
        return [{"op": "concat_table", "branches": [body, []]},
                {"op": "add_table"}]

    ls = [_conv(3, C, 9, 1, 4), nm(C), {"op": "relu"},
          _conv(C, 2 * C, 3, 2, 1), nm(2 * C), {"op": "relu"},
          _conv(2 * C, 4 * C, 3, 2, 1), nm(4 * C), {"op": "relu"}]
    for _ in range(nres):
        ls += _res(4 * C)
    ls += [_convT(4 * C, 2 * C, 3, 1, 1), nm(2 * C), {"op": "relu"},
           _convT(2 * C, C, 3, 1, 1), nm(C), {"op": "relu"},
           _conv(C, 3, 9, 1, 4), {"op": "tanh"}, {"op": "mul", "c": 150.0}]
    return ls


def main():
    import os

    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    norm = os.environ.get("NORM", "bn")
    fp = t7_fast.try_fast_johnson(_layers(norm=norm))
    assert fp is not None
    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)

    # model-space stylize steps: [0,1] RGB in/out like the engine (caffe
    # mean-sub pre, un-sub post; the affine cost rides every variant).
    mean = jnp.asarray([103.939, 116.779, 123.68], jnp.float32)

    def pre(x01):
        return (x01[..., ::-1].astype(jnp.float32) * 255.0
                - mean).astype(jnp.bfloat16)

    def post(y):
        return jnp.clip((y.astype(jnp.float32) + mean)[..., ::-1] / 255.0,
                        0.0, 1.0).astype(jnp.bfloat16)

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = t7_fast.calibrate_t7_scales(fp, pre(xc).astype(jnp.float32))
    quant = t7_fast.quantize_t7(fp, scales)
    print(f"norm={norm} sites: {sorted(quant)}", flush=True)

    def step_bf16(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x)))

    def step_xla_i8(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x), quant=quant))

    def step_pal_i8(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x), quant=quant,
                                          fused_sites=("res_i8",)))

    def step_pal_dec(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x), quant=quant,
                                          fused_sites=("res_i8", "dec_i8")))

    def step_pal_all(x):
        return post(t7_fast.t7_fast_apply(
            fpb, pre(x), quant=quant,
            fused_sites=("res_i8", "dec_i8", "c2_i8")))

    def step_s8c(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x), quant=quant,
                                          fused_sites=("res_s8", "dec_i8")))

    def step_s8c_all(x):
        return post(t7_fast.t7_fast_apply(
            fpb, pre(x), quant=quant,
            fused_sites=("res_s8", "dec_i8", "c2_i8")))

    def step_s8c_ds8(x):
        return post(t7_fast.t7_fast_apply(fpb, pre(x), quant=quant,
                                          fused_sites=("res_s8", "dec_s8")))

    def step_s8c_ds8_c2(x):
        return post(t7_fast.t7_fast_apply(
            fpb, pre(x), quant=quant,
            fused_sites=("res_s8", "dec_s8", "c2_i8")))

    def step_s8c_tail(x):
        return post(t7_fast.t7_fast_apply(
            fpb, pre(x), quant=quant,
            fused_sites=("res_s8", "dec_s8", "tail_s8")))

    variants = [("xla-i8", step_xla_i8), ("pal-i8", step_pal_i8),
                ("pal+dec", step_pal_dec), ("pal+all", step_pal_all)]
    if norm == "bn":
        # s8-carry chain (static scales only): a-sites emit s8 directly,
        # b-sites fold the skip — half the interior boundary bytes.
        # ds8 extends the carry through deconv1/deconv2 (the res-chain and
        # deconv1 outputs never exist in HBM as bf16); tail extends it
        # through the 9x9 output conv (fused d3_s8_site dy-sum in VMEM).
        variants += [("s8c+dec", step_s8c), ("s8c+all", step_s8c_all),
                     ("s8c+ds8", step_s8c_ds8),
                     ("s8c+ds8c2", step_s8c_ds8_c2),
                     ("s8c+tail", step_s8c_tail)]
    y0 = np.asarray(jax.jit(step_bf16)(xc.astype(jnp.bfloat16)), np.float32)
    for name, fn in variants:
        y = np.asarray(jax.jit(fn)(xc.astype(jnp.bfloat16)), np.float32)
        d = np.abs(y0 - y)
        print(f"quality {name}: MAE {d.mean():.5f} max {d.max():.4f}",
              flush=True)

    if os.environ.get("BATCHES"):
        batches = tuple(int(b) for b in os.environ["BATCHES"].split(","))
    else:
        batches = (16, 48)
    for B in batches:
        for name, fn in [("bf16  ", step_bf16)] + variants:
            t = timed_step(fn, B, H, W)
            print(f"[{name} B{B}] {t*1e3:.1f} ms/batch  {B/t:.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
