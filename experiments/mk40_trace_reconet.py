"""mk40: xplane trace + roofline data for the ReCoNet fast path.

VERDICT round-3 #4: ReCoNet runs 47.9 fps bf16 @1080p where Johnson does
115 with similar topology — it has never gotten the trace-driven treatment
(no PERF.md roofline exists). Dump the per-op device time of the f=2 block
form (reference: model.py:75-116) at B8/B16 so the time splits into convs
vs norm machinery vs relayouts, and print the FLOP-derived speed-of-light
per conv so the gap is attributable.

Usage: python -u experiments/mk40_trace_reconet.py [in frn]
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
from neuralstyletransferv1_tpu.engine import stylizer as st
from neuralstyletransferv1_tpu.models import io_presets as iop
from neuralstyletransferv1_tpu.models import reconet_fast

from mk25_trace_int8 import parse_trace  # same Chrome-trace aggregation

B, H, W = 16, 1080, 1920


def flops_table():
    """Per-layer MACs at 1080p (logical shapes, f=2 block form)."""
    rows = [
        ("c1 9x9 3->48 @H",      H * W * 3 * 48 * 81),
        ("c2 3x3 s2 48->96",     (H // 2) * (W // 2) * 48 * 96 * 9),
        ("c3 3x3 s2 96->192",    (H // 4) * (W // 4) * 96 * 192 * 9),
        ("res x4 (2 convs)",     8 * (H // 4) * (W // 4) * 192 * 192 * 9),
        ("d1 up 3x3 192->96",    (H // 2) * (W // 2) * 192 * 96 * 9),
        ("d2 up 3x3 96->48",     H * W * 96 * 48 * 9),
        ("d3 9x9 48->3 @H",      H * W * 48 * 3 * 81),
    ]
    tot = sum(f for _, f in rows)
    print(f"-- MAC table @1080p (total {2 * tot * B / 1e12:.2f} TFLOP/batch{B};"
          f" 394 TOPS bf16 SoL = {2 * tot * B / 394e12 * 1e3:.1f} ms) --")
    for n, f in rows:
        print(f"  {n:22s} {2 * f * B / 1e12:6.2f} TF "
              f" SoL {2 * f * B / 394e12 * 1e3:6.2f} ms")


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    flops_table()
    for norm in (sys.argv[1:] or ["in"]):
        mr = st.make_random_model("reconet", seed=1)
        if norm == "frn":
            from neuralstyletransferv1_tpu.models import reconet as _reco
            mr = mr._replace(params=_reco.init(jax.random.key(1), frn=True))
        pr = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "astype") and a.dtype != jnp.bool_ else a,
            reconet_fast.from_reconet_params(mr.params))

        g = jax.jit(lambda x: jnp.clip(iop.postprocess(
            "imagenet_01",
            reconet_fast.apply(pr, iop.preprocess("imagenet_01", x))),
            0.0, 1.0))

        x = jax.random.uniform(jax.random.key(1), (B, H, W, 3), jnp.bfloat16)
        float(jnp.sum(g(x).astype(jnp.float32)))
        tdir = f"/tmp/trace_reco_{norm}"
        with jax.profiler.trace(tdir):
            for r in range(3):
                x2 = jax.random.uniform(jax.random.key(10 + r),
                                        (B, H, W, 3), jnp.bfloat16)
                float(jnp.sum(g(x2).astype(jnp.float32)))
        time.sleep(1)
        pbs = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
        if not pbs:
            print(f"{norm}: no trace.json.gz under {tdir}")
            continue
        agg = parse_trace(pbs[-1])
        total = sum(agg.values())
        print(f"\n=== reconet {norm}: device {total:.1f} ms/run B{B} "
              f"({B / total * 1e3:.1f} fps) ===", flush=True)
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
