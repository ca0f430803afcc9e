"""mk25: xplane trace of the in-net int8 regression (mk24 showed full-site
int8 at 115.4 -> 102.7 fps @B48 despite mk22's isolated-unit 1.9x win).

Dumps per-op device time for the bf16 step vs the int8 step so the extra
~0.4 ms/site can be attributed (quantize pass not fusing? conv off the
int8 path? dequant materializing?).

Usage: python -u experiments/mk25_trace_int8.py [bf16 int8 ...]
  ONLY_SITES/DROP_SITES env vars filter sites as in mk24.
"""

import glob
import gzip
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

B, H, W = 16, 1080, 1920


def parse_trace(path, runs=3):
    """Aggregate the device 'XLA Ops' line of a *.trace.json.gz: op-name ->
    ms/run. (The xplane_pb2 proto module is not importable in this image;
    the Chrome-trace json carries the same XLA Ops line — pid='/device:TPU'
    tid='XLA Ops'.)"""
    import json

    d = json.load(gzip.open(path))
    evs = d["traceEvents"]
    dev_pid = None
    ops_tid = None
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in (e["args"].get("name") or ""):
            dev_pid = e["pid"]
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("pid") == dev_pid \
                and e["args"].get("name") == "XLA Ops":
            ops_tid = e["tid"]
    out = defaultdict(float)
    for e in evs:
        if e.get("ph") == "X" and e.get("pid") == dev_pid \
                and e.get("tid") == ops_tid:
            out[e["name"]] += e["dur"] / 1000.0 / runs  # us -> ms, per run
    return out


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    params = transformer_net.init(jax.random.key(0))
    bp32 = s2d2.bake_io_affine(s2d2.from_johnson_params(params),
                               "imagenet_255")
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bp32)

    drop = set((os.environ.get("DROP_SITES") or "").split(",")) - {""}
    only = set((os.environ.get("ONLY_SITES") or "").split(",")) - {""}
    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = s2d2.calibrate_act_scales(bp32, xc,
                                       sites=s2d2.QUANT_SITES_PALLAS)
    if only:
        scales = {k: v for k, v in scales.items()
                  if k in only or ("res" in only and k.startswith("r"))}
    scales = {k: v for k, v in scales.items() if k not in drop}
    quant3 = s2d2.quantize_net(bp32, scales)
    quant = {k: v for k, v in quant3.items() if k != "d3"}
    print(f"sites: {sorted(quant3)}", flush=True)

    def make(q, fused=()):
        return jax.jit(lambda x: jnp.clip(
            s2d2.apply(bp, x, quant=q, fused_sites=fused), 0.0, 1.0))

    variants = sys.argv[1:] or ["bf16", "int8"]
    for name in variants:
        if name == "bf16":
            g = make(None)
        elif name == "int8":
            g = make(quant)
        elif name == "pallas":       # the engine config
            g = make(quant, ("res_i8", "dec_i8"))
        else:                        # "pallas3": + the gated d3 site
            g = make(quant3, ("res_i8", "dec_i8", "d3_i8"))
        x = jax.random.uniform(jax.random.key(1), (B, H, W, 3), jnp.bfloat16)
        float(jnp.sum(g(x).astype(jnp.float32)))  # compile+warm
        tdir = f"/tmp/trace_i8_{name}"
        with jax.profiler.trace(tdir):
            for r in range(3):
                x2 = jax.random.uniform(jax.random.key(10 + r),
                                        (B, H, W, 3), jnp.bfloat16)
                float(jnp.sum(g(x2).astype(jnp.float32)))
        time.sleep(1)
        pbs = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
        if not pbs:
            print(f"{name}: no trace.json.gz found under {tdir}")
            continue
        agg = parse_trace(pbs[-1])
        total = sum(agg.values())
        print(f"\n=== {name}: device {total:.1f} ms/run ===", flush=True)
        for op, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:34]:
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
