"""mk43: DeepLab masked-stylize bf16 A/B (bench config #4 form).

Round-4 session 1 measured 16.7 fps @B4 f32. DeepLab-ResNet101 @513 OS16
is ~0.28 TF MAC/frame (~1.5 ms at the bf16 MXU ceiling), so the f32 form
is far off roofline — activations at f32 double HBM traffic and f32-input
convs take the slow conv path even under precision=default.

Rows:
  f32  : bench form exactly (params f32, input f32)
  bf16 : params + input cast to bf16 (BN still computes f32 internally —
         models/deeplab._bn upcasts; argmax over logits so only boundary
         pixels can flip)

Both rows time the FULL masked-stylize step (mask @513 -> upsample ->
composite on stylized 1080p, B4 chain3, bench protocol) and the bf16 row
reports mask disagreement vs f32 on a shared batch.

Usage: python -u experiments/mk43_deeplab_bf16.py [f32 bf16]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu import config

H, W = 1080, 1920
B = 4
CHAIN = 3
SALT = (time.time_ns() // 1000) % 1_000_000_007


def load_params():
    import torch
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    ref = "/root/reference"
    sys.path.insert(0, ref)
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(ref)
    torch.manual_seed(0)
    model = DeepLab(backbone="resnet", output_stride=16, num_classes=21,
                    sync_bn=False)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del model
    from neuralstyletransferv1_tpu.models import deeplab as dl

    dparams, _nc = dl.import_deeplab(sd)
    return dparams


def bench_params():
    from neuralstyletransferv1_tpu.models import transformer_net
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    params = transformer_net.init(jax.random.key(0))
    b32 = s2d.bake_io_affine(s2d.from_johnson_params(params), "imagenet_255")
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), b32)


def make_step(dparams, bparams, dt):
    from neuralstyletransferv1_tpu.models import deeplab as dl
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear

    p = jax.tree.map(lambda a: a.astype(dt) if hasattr(a, "astype") else a,
                     dparams) if dt == jnp.bfloat16 else dparams

    def step(x01):
        small = resize_bilinear(x01.astype(jnp.float32), (513, 513))
        logits = dl.apply(p, (small * 2.0 - 1.0).astype(dt))
        alpha = (jnp.argmax(logits, -1) != 0).astype(jnp.float32)[..., None]
        alpha = resize_bilinear(alpha, (H, W))
        styled = jnp.clip(s2d.apply(bparams, x01.astype(jnp.bfloat16)),
                          0.0, 1.0)
        return (styled.astype(jnp.float32) * alpha
                + x01.astype(jnp.float32) * (1.0 - alpha))

    return step


def mask_fn(dparams, dt):
    from neuralstyletransferv1_tpu.models import deeplab as dl

    p = jax.tree.map(lambda a: a.astype(dt) if hasattr(a, "astype") else a,
                     dparams) if dt == jnp.bfloat16 else dparams

    def f(x513):
        logits = dl.apply(p, (x513 * 2.0 - 1.0).astype(dt))
        return (jnp.argmax(logits, -1) != 0).astype(jnp.float32)

    return jax.jit(f)


def measure(step):
    def f(x, n):
        def body(i, acc):
            return acc + jnp.mean(step(x + acc * 1e-6))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    gN = jax.jit(functools.partial(f, n=CHAIN))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        return jax.random.uniform(jax.random.key(s + SALT), (B, H, W, 3),
                                  jnp.float32)

    def run(g):
        float(g(mk(0)))
        best = float("inf")
        for r in range(2):
            x = mk(100 + r)
            float(jnp.sum(x[0, 0, :4]))
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1) / B
    return t


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    dparams = load_params()
    bparams = bench_params()

    names = sys.argv[1:] or ["bf16", "f32"]
    for name in names:
        dt = jnp.bfloat16 if name == "bf16" else jnp.float32
        t = measure(make_step(dparams, bparams, dt))
        print(f"[{name}] {1e3 * t:.1f} ms/frame = {1.0 / t:.1f} fps "
              f"(masked stylize @1080p B{B})", flush=True)

    if "bf16" in names and "f32" in names:
        x = jax.random.uniform(jax.random.key(SALT), (B, 513, 513, 3),
                               jnp.float32)
        m16 = mask_fn(dparams, jnp.bfloat16)(x)
        m32 = mask_fn(dparams, jnp.float32)(x)
        dis = float(jnp.mean(jnp.abs(m16 - m32)))
        print(f"mask disagree bf16 vs f32: {dis * 100:.3f}% of pixels",
              flush=True)


if __name__ == "__main__":
    main()
