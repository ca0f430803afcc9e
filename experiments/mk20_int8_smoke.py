"""mk20: does int8 MXU work in Pallas on this Mosaic, and how fast?

Three probes, run with `python -u experiments/mk20_int8_smoke.py`:
 1. XLA int8 dot throughput on a res-conv-shaped matmul (sanity: the round-2
    isolated finding was 278 TF/s int8 vs 116 bf16 for a 3x3/128ch conv).
 2. Pallas kernel with jnp.dot(int8, int8, preferred_element_type=int32):
    compiles? correct? TF/s vs the same kernel at bf16.
 3. The res-site shape: 9-tap shifted int8 dots from an int8 VMEM scratch
    (the _d2_kernel structure at C=128->128) vs its bf16 twin.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def bench_call(g, make_args, n=3):
    out = g(*make_args(0))
    jax.tree.map(lambda a: np.asarray(a[..., :1, :1]), out)
    best = float("inf")
    for r in range(n):
        args = make_args(100 + r)
        for a in args:
            np.asarray(a[..., :1, :1])  # materialize
        t0 = time.perf_counter()
        out = g(*args)
        jax.tree.map(lambda a: np.asarray(a[..., :1, :1]), out)
        best = min(best, time.perf_counter() - t0)
    return best


def probe1_xla():
    M, K, N = 8 * 270 * 480, 128 * 9, 128  # res conv as im2col matmul
    flops = 2 * M * K * N

    def mk(dtype):
        def f(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32)
        g = jax.jit(f)

        def make(s):
            k = jax.random.key(s)
            if dtype == jnp.int8:
                a = jax.random.randint(k, (M, K), -127, 127, jnp.int8)
                b = jax.random.randint(k, (K, N), -127, 127, jnp.int8)
            else:
                a = jax.random.normal(k, (M, K), dtype)
                b = jax.random.normal(k, (K, N), dtype)
            return a, b
        return g, make

    for dt, name in [(jnp.bfloat16, "bf16"), (jnp.int8, "int8")]:
        g, make = mk(dt)
        t = bench_call(g, make)
        print(f"[probe1 XLA] {name}: {t*1e3:.2f} ms  {flops/t/1e12:.1f} TF/s")


def probe2_pallas_dot():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 1024 * 16, 512, 256
    TM = 512
    flops = 2 * M * K * N

    def make_kernel(in_dtype, acc_dtype):
        def kern(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=acc_dtype)

        def f(a, b):
            return pl.pallas_call(
                kern,
                grid=(M // TM,),
                in_specs=[
                    pl.BlockSpec((TM, K), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, N), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            )(a, b)
        g = jax.jit(f)

        def make(s):
            k = jax.random.key(s)
            if in_dtype == jnp.int8:
                a = jax.random.randint(k, (M, K), -127, 127, jnp.int8)
                b = jax.random.randint(k, (K, N), -127, 127, jnp.int8)
            else:
                a = jax.random.normal(k, (M, K), in_dtype)
                b = jax.random.normal(k, (K, N), in_dtype)
            return a, b
        return g, make

    for in_dt, acc_dt, name in [(jnp.bfloat16, jnp.float32, "bf16"),
                                (jnp.int8, jnp.int32, "int8")]:
        try:
            g, make = make_kernel(in_dt, acc_dt)
            # correctness spot check
            a, b = make(0)
            got = np.asarray(g(a, b))
            want = np.asarray(
                jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_dt))
            err = np.abs(got.astype(np.float64) - want.astype(np.float64)).max()
            t = bench_call(g, make)
            print(f"[probe2 pallas] {name}: max_err={err}  {t*1e3:.2f} ms  "
                  f"{flops/t/1e12:.1f} TF/s")
        except Exception as e:
            print(f"[probe2 pallas] {name} FAILED: {type(e).__name__}: {e}"[:400])


def probe3_res_shape():
    """9-tap shifted dots from VMEM scratch, d2-kernel style, 128->128,
    270x480 grid, B8 — int8 vs bf16 twin. Measures the achievable res-conv
    site speed including the prologue requant."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = 8, 272, 488, 128  # padded 270x480(+halo) grid
    TS = 8
    flops = 2 * B * 270 * 480 * C * C * 9

    def kern(body_ref, tail_ref, w_ref, o_ref, xs_ref, *, int8):
        xb = body_ref[0]                       # (TS, W, C) bf16
        xt = tail_ref[0]                       # (2, W, C) bf16
        if int8:
            qb = jnp.clip(jnp.round(xb.astype(jnp.float32) * 16.0), -127, 127) \
                .astype(jnp.int8)
            qt = jnp.clip(jnp.round(xt.astype(jnp.float32) * 16.0), -127, 127) \
                .astype(jnp.int8)
            xs_ref[0:TS * W] = qb.reshape(TS * W, C)
            xs_ref[TS * W:(TS + 2) * W] = qt.reshape(2 * W, C)
            xs_ref[(TS + 2) * W:(TS + 3) * W] = jnp.zeros((W, C), jnp.int8)
        else:
            xs_ref[0:TS * W] = xb.reshape(TS * W, C)
            xs_ref[TS * W:(TS + 2) * W] = xt.reshape(2 * W, C)
            xs_ref[(TS + 2) * W:(TS + 3) * W] = jnp.zeros((W, C), jnp.bfloat16)
        MT = 2 * W
        N = TS * W
        for t in range(N // MT):
            r0 = t * MT
            acc = None
            for dy in range(3):
                for dx in range(3):
                    s = r0 + dy * W + dx
                    p = jnp.dot(
                        xs_ref[s:s + MT, :], w_ref[dy * 3 + dx],
                        preferred_element_type=jnp.int32 if int8 else jnp.float32)
                    acc = p if acc is None else acc + p
            if int8:
                o_ref[0, 2 * t:2 * t + 2] = (acc.astype(jnp.float32)
                                             * (1.0 / 256.0)).reshape(2, W, C) \
                    .astype(jnp.bfloat16)
            else:
                o_ref[0, 2 * t:2 * t + 2] = acc.reshape(2, W, C) \
                    .astype(jnp.bfloat16)

    def make_fn(int8):
        k = functools.partial(kern, int8=int8)
        wdt = jnp.int8 if int8 else jnp.bfloat16
        sdt = jnp.int8 if int8 else jnp.bfloat16

        def f(x, w):
            return pl.pallas_call(
                k,
                grid=(B, H // TS),
                in_specs=[
                    pl.BlockSpec((1, TS, W, C), lambda b, j: (b, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, W, C), lambda b, j: (b, 4 * j + 4, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((9, C, C), lambda b, j: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, TS, W, C), lambda b, j: (b, j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM(((TS + 3) * W, C), sdt)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(x, x, w)

        def chain(x, w, n):
            def body(i, y):
                out = f(y, w) * 0.01
                return jnp.pad(out, ((0, 0), (0, 2), (0, 0), (0, 0)))
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

        import functools as _ft
        g8 = jax.jit(_ft.partial(chain, n=8))
        g1 = jax.jit(_ft.partial(chain, n=1))
        g = (g8, g1)

        def make(s):
            kk = jax.random.key(s)
            x = jax.random.normal(kk, (B, H + 2, W, C), jnp.bfloat16)
            if int8:
                w = jax.random.randint(kk, (9, C, C), -127, 127, jnp.int8)
            else:
                w = jax.random.normal(kk, (9, C, C), jnp.bfloat16)
            return x, w
        return g, make

    for int8 in (False, True):
        name = "int8" if int8 else "bf16"
        try:
            (g8, g1), make = make_fn(int8)

            def run(g):
                x, w = make(0)
                float(g(x, w))
                best = float("inf")
                for r in range(3):
                    x, w = make(100 + r)
                    float(jnp.sum(x[:1, :1, :1].astype(jnp.float32)))
                    t0 = time.perf_counter()
                    float(g(x, w))
                    best = min(best, time.perf_counter() - t0)
                return best

            t = (run(g8) - run(g1)) / 7.0
            print(f"[probe3 res-site] {name}: {t*1e3:.2f} ms/conv-pass  "
                  f"{flops/t/1e12:.1f} TF/s")
        except Exception as e:
            print(f"[probe3 res-site] {name} FAILED: {type(e).__name__}: {e}"[:600])


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    probe1_xla()
    probe2_pallas_dot()
    probe3_res_shape()
