"""Experiment: head/tail restructuring + layout audit.

1. Audit: what layout does XLA give the narrow-channel tensors in the real
   step (s2d out 12ch, d3 rows 60ch, final 12ch)?  (memory_analysis + HLO)
2. Head option P: replace [s2d -> pad -> 5x5x12 block conv] with ONE
   10x10 stride-2 conv on the dense 1080p pixel tensor (kernel scattered so
   the 128 outputs are the 4 f2 phases x 32ch — identical math).
3. Timing: current head vs option P head (both: pixels -> (540,960,128)).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

B = 4
H, W = 1080, 1920


def timeit(g, mk, chain=8, repeats=3):
    def run(ch):
        gg = jax.jit(lambda x: jnp.sum(
            jax.lax.fori_loop(0, ch, lambda i, y: g(y).astype(y.dtype), x)
            .astype(jnp.float32)))
        xx = mk(0)
        float(gg(xx))
        best = float("inf")
        for r in range(repeats):
            xx = mk(100 * ch + r)
            float(jnp.sum(xx.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(gg(xx))
            best = min(best, time.perf_counter() - t0)
        return best
    tK, t1 = run(chain), run(1)
    return (tK - t1) / (chain - 1)


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    from neuralstyletransferv1_tpu.models.transformer_net_s2d2 import (
        _pad_reflect_f2_4px, _scatter_k9_f2)
    from neuralstyletransferv1_tpu.models.transformer_net_s2d import s2d
    from neuralstyletransferv1_tpu.ops.conv import conv2d
    from neuralstyletransferv1_tpu import config
    config.set_conv_precision("default")

    print("device:", jax.devices()[0])
    k = jax.random.key
    w9 = np.asarray(jax.random.normal(k(1), (9, 9, 3, 32), jnp.float32)) * 0.05

    wa = jnp.asarray(_scatter_k9_f2(w9), jnp.bfloat16)     # [5,5,12,128]

    # option P: [10,10,3,128] stride-2 pad-4 kernel, phase-scattered
    wp = np.zeros((10, 10, 3, 128), np.float32)
    for u in range(2):
        for v in range(2):
            for a in range(9):
                for b in range(9):
                    wp[a + u, b + v, :, (u * 2 + v) * 32:(u * 2 + v + 1) * 32] \
                        += w9[a, b]
    wp = jnp.asarray(wp, jnp.bfloat16)

    def mk(seed):
        return jax.random.normal(k(seed), (B, H, W, 3), jnp.bfloat16)

    def head_a(x):  # current: s2d -> phase reflect halo -> 5x5 block conv
        y = _pad_reflect_f2_4px(s2d(x, 2), 3)
        y = conv2d(y, wa)
        return y

    def head_p(x):  # one 10x10 s2 conv on pixels (reflect pad 4 first)
        xp = jnp.pad(x, ((0, 0), (4, 5), (4, 5), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, wp, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    # correctness
    x = mk(7)
    ya = jax.jit(head_a)(x)
    yp = jax.jit(head_p)(x)
    print("shapes:", ya.shape, yp.shape)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yp.astype(jnp.float32))))
    print(f"max |head_a - head_p| = {err:.3e}")

    flops = 2 * B * 540 * 960 * 81 * 3 * 128
    wrap = lambda f: (lambda x: jnp.pad(  # noqa: E731
        f(x)[..., :3], ((0, 0), (270, 270), (480, 480), (0, 0))))
    for name, f in [("A s2d+5x5x12 ", head_a), ("P 10x10s2 px ", head_p)]:
        t = timeit(wrap(f), mk)
        print(f"head {name}: {t*1e3:7.3f} ms  ({flops/t/1e12:5.1f} TF/s useful)")

    # layout audit of the full step
    from neuralstyletransferv1_tpu.models import transformer_net, io_presets as iop
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2m
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2m.from_johnson_params(params))

    def step(x):
        return iop.postprocess("imagenet_255",
                               s2d2m.apply(bp, iop.preprocess("imagenet_255", x)))

    lowered = jax.jit(step).lower(jax.ShapeDtypeStruct((B, H, W, 3), jnp.bfloat16))
    comp = lowered.compile()
    txt = comp.as_text()
    import re
    pat = re.compile(r"bf16\[\d+,\d+,\d+,(?:3|12|60|64)\]\{[^}]*\}")
    seen = {}
    for m in pat.finditer(txt):
        seen[m.group(0)] = seen.get(m.group(0), 0) + 1
    for kk, v in sorted(seen.items(), key=lambda t: -t[1])[:18]:
        print(f"{v:4d}x  {kk}")


if __name__ == "__main__":
    main()
