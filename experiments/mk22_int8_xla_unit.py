"""mk22: XLA-level int8 res UNIT A/B — the fusion-aware structure.

Round-2 PTQ was slower because (a) conv1 went int8 (terrible shallow
contraction), (b) requant ran as separate f32 passes, (c) conv outputs
stayed f32. Round-2's isolated finding: an XLA 3x3/128ch int8 conv IS
2.4x bf16 (278 vs 116 TF/s). This measures the full deferred-IN res unit
(apply-affine pass -> conv -> stats) in three structures:

  bf16 : apply(bf16->bf16) -> conv bf16 -> f32 acc -> bf16 out + stats
  int8 : apply+quant(bf16->int8) -> conv int8 -> i32 acc -> dequant ->
         bf16 out + stats (dequant/bias folded into the conv's kOutput
         fusion; the quantize replaces the apply pass at HALF the write
         traffic)
  int8-raw8: like int8 but the raw conv output is ALSO written int8 with a
         static per-channel scale (next unit's apply dequantizes — folded
         into its affine): half traffic on BOTH sides of every conv.

Chained 10x in-graph (the 5-block res chain's 10 convs), minus 1-chain.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B, H, W, C = 8, 270, 480, 128
FLOPS = 2 * B * H * W * C * C * 9
CHAIN = 10


def conv3x3(x, w, acc_t):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t)


def unit_bf16(x_raw, w, a, c):
    """x_raw bf16 -> (apply affine+relu) -> conv -> (raw bf16, stats)."""
    xin = jnp.maximum(x_raw.astype(jnp.float32) * a + c, 0.0).astype(jnp.bfloat16)
    raw = conv3x3(xin, w, jnp.float32)
    s1 = jnp.mean(raw, axis=(1, 2))
    s2 = jnp.mean(raw * raw, axis=(1, 2))
    return raw.astype(jnp.bfloat16), s1, s2


def unit_int8(x_raw, w8, a, c, in_scale, out_scale):
    """apply+quantize pass (bf16 read, int8 write) -> int8 conv (i32 acc) ->
    dequant folds into the output fusion -> bf16 raw + stats."""
    xf = jnp.maximum(x_raw.astype(jnp.float32) * a + c, 0.0)
    q = jnp.clip(jnp.round(xf * in_scale), 0, 127).astype(jnp.int8)  # relu'd
    acc = conv3x3(q, w8, jnp.int32)
    raw_f = acc.astype(jnp.float32) * out_scale        # per-channel f32 row
    s1 = jnp.mean(raw_f, axis=(1, 2))
    s2 = jnp.mean(raw_f * raw_f, axis=(1, 2))
    return raw_f.astype(jnp.bfloat16), s1, s2


def unit_int8_raw8(x_raw8, w8, a, c, in_scale, raw_scale):
    """int8 raw in, int8 raw out: both sides of the conv at half traffic.
    The dequant of x_raw8 folds into the affine (a already carries it)."""
    xf = jnp.maximum(x_raw8.astype(jnp.float32) * a + c, 0.0)
    q = jnp.clip(jnp.round(xf * in_scale), 0, 127).astype(jnp.int8)
    acc = conv3x3(q, w8, jnp.int32)
    raw_f = acc.astype(jnp.float32) * raw_scale
    s1 = jnp.mean(raw_f, axis=(1, 2))
    s2 = jnp.mean(raw_f * raw_f, axis=(1, 2))
    q_raw = jnp.clip(jnp.round(raw_f * 4.0), -127, 127).astype(jnp.int8)
    return q_raw, s1, s2


def timed(g, mk, n=3):
    x, w = mk(0)
    float(g(x, w))
    best = float("inf")
    for r in range(n):
        x, w = mk(100 + r)
        float(jnp.sum(x[0, 0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        float(g(x, w))
        best = min(best, time.perf_counter() - t0)
    return best


def run(name, unit, in_dt):
    a = jnp.ones((C,), jnp.float32) * 0.1
    c = jnp.zeros((C,), jnp.float32)

    def chain(x, w, n):
        def body(i, carry):
            x = carry
            out, s1, s2 = unit(x, w, a, c, *( [16.0, 1.0 / 256.0]
                                              if in_dt != "bf16" else []))
            return out
        y = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(y.astype(jnp.float32))

    gN = jax.jit(functools.partial(chain, n=CHAIN))
    g1 = jax.jit(functools.partial(chain, n=1))

    def mk(s):
        k = jax.random.key(s)
        if in_dt == "int8":
            x = jax.random.randint(k, (B, H, W, C), -127, 127, jnp.int8)
        else:
            x = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
        if in_dt == "bf16":
            w = jax.random.normal(k, (3, 3, C, C), jnp.bfloat16) * 0.05
        else:
            w = jax.random.randint(k, (3, 3, C, C), -127, 127, jnp.int8)
        return x, w

    try:
        t = (timed(gN, mk) - timed(g1, mk)) / (CHAIN - 1)
        print(f"[{name}] {t*1e3:.2f} ms/unit  conv {FLOPS/t/1e12:.1f} TF/s-equiv",
              flush=True)
        return t
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}"[:400], flush=True)
        return None


def wrap_bf16(x, w, a, c):
    return unit_bf16(x, w, a, c)


def wrap_int8(x, w, a, c, in_scale, out_scale):
    return unit_int8(x, w, a, c, in_scale, out_scale)


def wrap_raw8(x, w, a, c, in_scale, raw_scale):
    return unit_int8_raw8(x, w, a, c, in_scale, raw_scale)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    run("bf16 unit", wrap_bf16, "bf16")
    run("int8 unit (bf16 raws)", wrap_int8, "bf16-i8w")
    run("int8 unit (int8 raws)", wrap_raw8, "int8")
