"""Benchmark: batched 1080p stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline config matches BASELINE.md's north star (≥200 stylized 1080p
frames/s/chip on v5e): Johnson TransformerNet in its f=2 space-to-depth form
(models/transformer_net_s2d2 — identical math, MXU-aligned, zero phase
repacks, zero-SAME conv1/deconv3 with exact border-strip fixups), the
imagenet_255 preset affines baked into conv1/deconv3 (bake_io_affine), bf16
activations/weights with f32 accumulation. Batch 48 is the measured optimum
of the round-2c sweep (B16 109.6 / B32 111.5 / B48 115.4 fps; B64 fails to
compile) — throughput config; per-frame latency-sensitive callers should
use smaller batches. ``vs_baseline`` is value / 200 (the reference
publishes no numbers of its own — BASELINE.md).

Measurement notes (this environment's axon relay):
- identical (executable, args) calls are memoized → every timed call uses a
  fresh input;
- block_until_ready does not block → a scalar reduce is fetched to force
  execution;
- K iterations are chained in-graph and a 1-iteration run is subtracted to
  remove dispatch+fetch overhead.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 200.0  # north-star target, BASELINE.json
H, W = 1080, 1920
BATCH = 48
CHAIN = 8
REPEATS = 2


def _timed(fn, batch, chain):
    g = jax.jit(
        lambda x: jnp.sum(
            jax.lax.fori_loop(0, chain, lambda i, y: fn(y).astype(y.dtype), x).astype(jnp.float32)
        )
    )
    x = jax.random.uniform(jax.random.key(0), (batch, H, W, 3), jnp.bfloat16)
    float(g(x))  # compile + warm
    best = float("inf")
    for r in range(REPEATS):
        x2 = jax.random.uniform(jax.random.key(100 + r), (batch, H, W, 3), jnp.bfloat16)
        float(jnp.sum(x2.astype(jnp.float32)))  # materialize input
        t0 = time.perf_counter()
        float(g(x2))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from neuralstyletransferv1_tpu import config
    from neuralstyletransferv1_tpu.models import transformer_net, transformer_net_s2d2 as s2d

    print(f"[bench] device: {jax.devices()[0]}", file=sys.stderr)
    config.set_conv_precision("default")  # bf16 inputs → native MXU path

    params = transformer_net.init(jax.random.key(0))
    # the preset's pre/post affines are folded into conv1/deconv3 (exact;
    # kills the separate elementwise passes — PERF.md round-2c)
    bparams = s2d.bake_io_affine(s2d.from_johnson_params(params),
                                 "imagenet_255")
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bparams)

    def step(x):
        return jnp.clip(s2d.apply(bparams, x), 0.0, 1.0)

    t0 = time.perf_counter()
    d_chain = _timed(step, BATCH, CHAIN)
    d_one = _timed(step, BATCH, 1)
    per_batch = max(1e-9, (d_chain - d_one) / (CHAIN - 1))
    fps = BATCH / per_batch
    print(
        f"[bench] per-batch{BATCH}: {per_batch * 1000:.1f} ms  (total bench {time.perf_counter() - t0:.0f}s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "stylized_1080p_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
