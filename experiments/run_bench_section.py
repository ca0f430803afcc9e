"""Run ONE bench.py section in isolation (for targeted TPU A/B windows).

Usage: python experiments/run_bench_section.py <section> [...]
Sections: latency ladder gram_nst deeplab flow magenta e2e int8 static_norm
backends backends_int8. Results print as [bench] lines + a final JSON dict
of extras. Protocol and functions are bench.py's own — this just skips the
rest of the sweep so a single config gets the whole window.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    import bench
    from neuralstyletransferv1_tpu import config
    from neuralstyletransferv1_tpu.models import transformer_net
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    print("device:", jax.devices()[0], flush=True)
    config.set_conv_precision("default")
    params = transformer_net.init(jax.random.key(0))
    bparams32 = s2d.bake_io_affine(s2d.from_johnson_params(params),
                                   "imagenet_255")
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bparams32)

    extras = {}
    for name in names:
        t0 = time.perf_counter()
        if name == "latency":
            extras.update(
                latency_ms_p50_512=bench._latency_p50(bparams, 512, 512),
                latency_ms_p50_1080=bench._latency_p50(bparams, bench.H,
                                                       bench.W))
        elif name == "ladder":
            bench._ladder(extras)
        elif name == "gram_nst":
            bench._gram_nst(extras)
        elif name == "deeplab":
            bench._deeplab_masked(extras, bparams)
        elif name == "flow":
            bench._flow_video(extras, bparams)
        elif name == "magenta":
            bench._magenta(extras)
        elif name == "e2e":
            bench._e2e_video(extras)
        elif name == "int8":
            fps, mae = bench._int8(extras, bparams, bparams32)
            extras["int8_fps"] = fps
            extras["int8_mae"] = mae
        elif name == "static_norm":
            fps, mae, cfg = bench._static_norm(extras, bparams, bparams32)
            extras["static_fps"] = fps
            extras["static_cfg"] = cfg
        elif name == "backends":
            extras.update(bench._backend_fps())
        elif name == "backends_int8":
            extras.update(bench._backend_int8_fps())
        elif name == "headline":
            extras["headline_bf16_fps"] = bench._headline(bparams)
        else:
            print(f"unknown section {name}", flush=True)
            continue
        print(f"[section] {name} took {time.perf_counter() - t0:.0f}s",
              flush=True)
    print("EXTRAS " + json.dumps(extras), flush=True)


if __name__ == "__main__":
    main()
