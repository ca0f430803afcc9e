"""Experiment: conv1 row-packing. The s2d2 conv1 is a [5,5,12,128] block conv
at the 540 grid — contraction depth 12 starves the MXU (~32 TF/s measured in
the net's roofline). Variant: materialize a 5-row lane-concat (12->60 ch) and
run a [1,5,60,128] conv (contraction 300).  Also tries [5,1] x [1,5]-style
two-stage packing and d2's 3-row pack (Cin 64 -> 192).
"""

import time
import jax
import jax.numpy as jnp

B = 8
H2, W2 = 540, 960          # 540 grid
CI, CO = 12, 128


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
    print("device:", jax.devices()[0])
    k = jax.random.key
    w = jax.random.normal(k(1), (5, 5, CI, CO), jnp.bfloat16) * 0.05

    def mk(seed):
        return jax.random.normal(k(seed), (B, H2 + 4, W2 + 4, CI), jnp.bfloat16)

    # A: plain 5x5 valid conv (what the net does now)
    def conv_a(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.pad(y[..., :CI], ((0, 0), (2, 2), (2, 2), (0, 0))) + 0 * y.mean()

    # B: 5-row lane pack -> [1,5,60,128]
    w_row = jnp.concatenate([w[i] for i in range(5)], axis=1)  # [5, 60, 128]
    w_row = w_row[None]                                        # [1,5,60,128]

    def conv_b(x):
        x5 = jnp.concatenate([x[:, i:i + H2] for i in range(5)], axis=-1)
        y = jax.lax.conv_general_dilated(
            x5, w_row, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.pad(y[..., :CI], ((0, 0), (2, 2), (2, 2), (0, 0))) + 0 * y.mean()

    # C: full 25-tap pack -> 300-ch 1x1 conv (materializes 5x input)
    w_full = w.reshape(25 * CI, CO)[None, None]

    def conv_c(x):
        xs = [x[:, i:i + H2, j:j + W2] for i in range(5) for j in range(5)]
        x25 = jnp.concatenate(xs, axis=-1)
        y = jax.lax.conv_general_dilated(
            x25, w_full, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.pad(y[..., :CI], ((0, 0), (2, 2), (2, 2), (0, 0))) + 0 * y.mean()

    flops = 2 * B * H2 * W2 * 25 * CI * CO
    for name, f in [("plain 5x5x12", conv_a), ("row-pack 1x5x60", conv_b)]:
        t = timeit(f, mk)
        print(f"conv1 {name:18s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")

    # --- d2 site: 3x3 Cin=64 -> 128 @ 540 grid ---
    w2_ = jax.random.normal(k(2), (3, 3, 64, 128), jnp.bfloat16) * 0.05

    def mk2(seed):
        return jax.random.normal(k(seed), (B, H2 + 2, W2 + 2, 64), jnp.bfloat16)

    def d2_a(x):
        y = jax.lax.conv_general_dilated(
            x, w2_, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.pad(y[..., :64], ((0, 0), (1, 1), (1, 1), (0, 0))) + 0 * y.mean()

    wr = jnp.concatenate([w2_[i] for i in range(3)], axis=1)[None]  # [1,3,192,128]

    def d2_b(x):
        x3 = jnp.concatenate([x[:, i:i + H2] for i in range(3)], axis=-1)
        y = jax.lax.conv_general_dilated(
            x3, wr, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.pad(y[..., :64], ((0, 0), (1, 1), (1, 1), (0, 0))) + 0 * y.mean()

    flops2 = 2 * B * H2 * W2 * 9 * 64 * 128
    for name, f in [("plain 3x3x64", d2_a), ("row-pack 1x3x192", d2_b)]:
        t = timeit(f, mk2)
        print(f"d2   {name:18s}: {t*1e3:7.3f} ms  {flops2/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
