"""mk41: xplane trace of the DeepLab masked-stylize path (bench config #4).

16.7 fps @B4 measured round-4 = ~60 ms/frame, of which stylize is ~9 —
DeepLab-ResNet101 @513 OS16 is taking ~50 ms/frame where its MAC count
(~0.28 TF/frame) is ~1.5 ms at the bf16 ceiling. Attribute: conv rate
(f32-input convs?), unfused BN passes, the 513 odd-size layouts, ASPP
global-pool branch, align-corners resizes.

Variants: f32 (bench form), bf16 (input cast to bf16 so every conv/BN
rides the fast path; mask is argmaxed so only boundary pixels can move).

Usage: python -u experiments/mk41_trace_deeplab.py [f32 bf16]
"""

import glob
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config

from mk25_trace_int8 import parse_trace

B = 4


def load_params():
    import numpy as np
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


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    dparams = load_params()
    from neuralstyletransferv1_tpu.models import deeplab as dl

    for name in (sys.argv[1:] or ["f32", "bf16"]):
        dt = jnp.bfloat16 if name == "bf16" else jnp.float32
        p = jax.tree.map(
            lambda a: a.astype(dt) if hasattr(a, "astype") else a, dparams) \
            if name == "bf16" else dparams

        def step(x01):
            logits = dl.apply(p, (x01 * 2.0 - 1.0).astype(dt))
            return (jnp.argmax(logits, -1) != 0).astype(jnp.float32)

        g = jax.jit(step)
        x = jax.random.uniform(jax.random.key(1), (B, 513, 513, 3),
                               jnp.float32)
        m0 = g(x)
        float(jnp.sum(m0))
        tdir = f"/tmp/trace_dl_{name}"
        with jax.profiler.trace(tdir):
            for r in range(3):
                x2 = jax.random.uniform(jax.random.key(10 + r),
                                        (B, 513, 513, 3), jnp.float32)
                float(jnp.sum(g(x2)))
        time.sleep(1)
        pbs = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
        if not pbs:
            print(f"{name}: no trace under {tdir}")
            continue
        agg = parse_trace(pbs[-1])
        total = sum(agg.values())
        print(f"\n=== deeplab {name}: device {total:.1f} ms/run B{B} "
              f"({total / B:.1f} ms/frame mask-only) ===", flush=True)
        for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
            print(f"  {ms:8.3f} ms  {op[:120]}")
        import re
        cat = defaultdict(float)
        for op, ms in agg.items():
            m = re.match(r"([a-zA-Z_\-]+)", op)
            cat[m.group(1) if m else op] += ms
        print("  -- rollup --")
        for c, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {ms:8.3f} ms  {c}")
        if name == "bf16":
            # mask agreement vs f32 on one batch (boundary-only tolerance)
            def step32(x01):
                logits = dl.apply(dparams, x01 * 2.0 - 1.0)
                return (jnp.argmax(logits, -1) != 0).astype(jnp.float32)

            m32 = jax.jit(step32)(x)
            m16 = g(x)
            dis = float(jnp.mean(jnp.abs(m16 - m32)))
            print(f"  mask disagree vs f32: {dis * 100:.3f}% of pixels")


if __name__ == "__main__":
    main()
