"""mk15: xplane trace comparison of the XLA vs fused-tail 1080p step at B8.

Dumps jax.profiler traces for each variant and prints the top device ops by
total duration, so the in-net regression can be attributed op-by-op.
Usage: python -u experiments/mk15_trace.py [xla tail head ...]
"""

import glob
import gzip
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import io_presets as iop
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

B, H, W = 8, 1080, 1920


def parse_xplane(path):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    raw = open(path, "rb").read()
    try:
        raw = gzip.decompress(raw)
    except OSError:
        pass
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(raw)
    out = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "xla modules" in lname:
                continue
            for ev in line.events:
                md = ev_names[ev.metadata_id]
                out[md.name] += ev.duration_ps / 1e9  # ms
    return out


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))

    def step(fused):
        def f(x):
            xin = iop.preprocess("imagenet_255", x)
            y = s2d2.apply(bp, xin, fused_sites=fused)
            return iop.postprocess("imagenet_255", y)
        return jax.jit(f)

    variants = sys.argv[1:] or ["xla", "tail"]
    fmap = {"xla": (), "tail": ("tail",), "head": ("head",),
            "both": ("head", "tail")}
    for name in variants:
        g = step(fmap[name])
        x = jax.random.uniform(jax.random.key(1), (B, H, W, 3), jnp.bfloat16)
        float(jnp.sum(g(x).astype(jnp.float32)))  # compile+warm
        tdir = f"/tmp/trace_{name}"
        with jax.profiler.trace(tdir):
            for r in range(3):
                x2 = jax.random.uniform(jax.random.key(10 + r), (B, H, W, 3),
                                        jnp.bfloat16)
                float(jnp.sum(g(x2).astype(jnp.float32)))
        time.sleep(1)
        pbs = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
        if not pbs:
            print(f"{name}: no xplane found under {tdir}")
            continue
        agg = parse_xplane(pbs[-1])
        total = sum(agg.values())
        print(f"\n=== {name}: device total {total:.1f} ms over 3 runs "
              f"({total/3:.1f} ms/run) ===", flush=True)
        for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
            print(f"  {ms/3:8.3f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
