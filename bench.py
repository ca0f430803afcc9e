"""Benchmark: batched 1080p stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline config matches BASELINE.md's north star (≥200 stylized 1080p
frames/s/chip on v5e): Johnson TransformerNet (the reference's flagship
stylizer), imagenet_255 preset fused in, bf16 activations/weights with f32
accumulation. ``vs_baseline`` is value / 200 (the reference publishes no
numbers of its own — BASELINE.md).

Iterations are chained inside one jitted loop (output feeds the next input)
so per-dispatch host latency doesn't pollute the steady-state measurement.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 200.0  # north-star target, BASELINE.json
H, W = 1080, 1920
BATCH = 4
CHAIN = 8  # stylize passes per dispatch
REPEATS = 3


def main() -> None:
    from neuralstyletransferv1_tpu import config
    from neuralstyletransferv1_tpu.engine import stylizer as st

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)

    model = st.make_random_model("johnson", seed=0)
    mbf16 = model.cast(jnp.bfloat16)
    config.set_conv_precision("default")  # bf16 inputs → native MXU path

    @jax.jit
    def chained(x):
        def body(_, y):
            return st.stylize(mbf16.arch, mbf16.params, mbf16.io_preset, y).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, CHAIN, body, x)

    x = jnp.full((BATCH, H, W, 3), 0.5, jnp.bfloat16)
    t0 = time.perf_counter()
    y = chained(x)
    y.block_until_ready()
    print(f"[bench] compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        y = chained(x)
        y.block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"[bench] repeat {r}: {dt:.3f}s  ({BATCH * CHAIN / dt:.1f} fps)", file=sys.stderr)

    fps = BATCH * CHAIN / best
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
