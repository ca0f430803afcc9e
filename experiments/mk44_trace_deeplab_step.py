"""mk44: trace the FULL deeplab masked-stylize bench step (config #4).

mk41 measured the DeepLab net alone at 2.6 ms/frame device time @513 B4,
yet the full bench step is 59 ms/frame (mk43) — the ~47 ms gap lives in
the step's glue: the 1080p->513 and 513->1080p jax.image.resize calls,
the Johnson stylize, or the composite. Trace the composed step and
aggregate by op to find it.
"""

import glob
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from neuralstyletransferv1_tpu import config

from mk25_trace_int8 import parse_trace
from mk43_deeplab_bf16 import B, H, W, bench_params, load_params, make_step


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    dparams = load_params()
    bparams = bench_params()
    if len(sys.argv) > 1 and sys.argv[1] == "engine":
        # trace the production fused step (engine/masked_stylize, bf16)
        from neuralstyletransferv1_tpu.engine.masked_stylize import (
            make_masked_stylize_step)
        step = make_masked_stylize_step(dparams, bparams, (H, W))
    else:
        step = make_step(dparams, bparams, jnp.float32)
    g = jax.jit(lambda x: jnp.mean(step(x)))
    x = jax.random.uniform(jax.random.key(1), (B, H, W, 3), jnp.float32)
    float(g(x))
    tdir = "/tmp/trace_dl_step"
    with jax.profiler.trace(tdir):
        for r in range(3):
            x2 = jax.random.uniform(jax.random.key(10 + r), (B, H, W, 3),
                                    jnp.float32)
            float(g(x2))
    time.sleep(1)
    pbs = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    agg = parse_trace(pbs[-1])
    total = sum(agg.values())
    print(f"\n=== masked-stylize step: device {total:.1f} ms/run B{B} "
          f"({total / B:.1f} ms/frame) ===", flush=True)
    for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:8.3f} ms  {op[:120]}")
    import re
    cat = defaultdict(float)
    for op, ms in agg.items():
        m = re.match(r"([a-zA-Z_\-]+)", op)
        cat[m.group(1) if m else op] += ms
    print("  -- rollup --")
    for c, ms in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ms:8.3f} ms  {c}")


if __name__ == "__main__":
    main()
