"""Piecewise timing of the fused tail at 1080p B8: X4 build, P4 (d2 site),
P5 (d3 sum site) — vs the XLA-form equivalents. (The XLA perimeter-fixup
piece of the first tail design was removed when the halos moved in-kernel;
its measured 14.9 ms is recorded in PERF.md round-2c.)"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from neuralstyletransferv1_tpu import config
from neuralstyletransferv1_tpu.models import s2d2_sites as ss
from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d as s2d1
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2
from neuralstyletransferv1_tpu.ops.conv import conv2d

B, H2, W2 = 8, 540, 960
H4, W4 = H2 // 2, W2 // 2
HO, HBUF, WP = ss._tail_geom(H2, W2)
print(f"geom ho={HO} hbuf={HBUF} wp={WP}", flush=True)


def bench(fn, args_fn, chain=6, repeats=2):
    def run(ch):
        def chained(*a):
            def body(i, a0):
                r = fn(*a0)
                # mix one result element back into one arg element so the
                # loop body is not hoistable; dus is in-place (no full pass)
                v = r.astype(jnp.float32).ravel()[0]
                x0 = a0[0]
                x0 = x0.at[(0,) * x0.ndim].add(v.astype(x0.dtype))
                return (x0,) + a0[1:]
            out = jax.lax.fori_loop(0, ch, body, a)
            return jnp.sum(out[0].astype(jnp.float32))
        g = jax.jit(chained)
        a = args_fn(0)
        float(g(*a))
        best = float("inf")
        for r in range(repeats):
            a = args_fn(100 * ch + r + 1)
            for x in a:
                float(jnp.sum(x.astype(jnp.float32)))
            t0 = time.perf_counter()
            float(g(*a))
            best = min(best, time.perf_counter() - t0)
        return best
    tC, t1 = run(chain), run(1)
    return (tC - t1) / (chain - 1)


def main():
    config.set_conv_precision("default")
    print("device:", jax.devices()[0], flush=True)
    params = transformer_net.init(jax.random.key(0))
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      s2d2.from_johnson_params(params))
    k = jax.random.key

    def r(seed, shape, dt=jnp.bfloat16, scale=1.0):
        return (jax.random.normal(k(seed), shape, jnp.float32) * scale).astype(dt)

    which = set(sys.argv[1:] or
                ["x4", "p4", "p5", "xd2", "xd3", "xd2s"])

    # ---- X4 build (d2s + edge pad + junk pad, one XLA pass) ----
    if "x4" in which:
        def x4build(y1raw):
            x = s2d1.d2s(y1raw, 2, 64)
            x = s2d1._pad_edge_blocks(x)
            return jnp.pad(x, ((0, 0), (2, HBUF - H2 - 2),
                               (2, WP - (W2 + 2) - 2), (0, 0)))
        t = bench(x4build, lambda s: (r(s, (B, H4, W4, 256)),))
        print(f"x4 build      : {t*1e3:7.2f} ms", flush=True)

    # ---- P4: d2 site ----
    if "p4" in which:
        w9 = bp["d2_w"].reshape(9, 64, 128)
        cb = bp["d2_b"].astype(jnp.float32)[None, :]
        def p4(x4, a4, c4):
            y5, sout = ss._d2_site(x4, a4, c4, w9, cb, h2=H2, w2=W2,
                                   hbuf=HBUF, wp=WP)
            return y5.astype(jnp.float32).ravel()[:1] + jnp.sum(sout)
        t = bench(p4, lambda s: (r(s, (B, HBUF + 2, WP, 64)),
                                 r(s + 1, (B, 64), jnp.float32, 0.1),
                                 r(s + 2, (B, 64), jnp.float32, 0.1)))
        print(f"p4 d2-site    : {t*1e3:7.2f} ms", flush=True)

    # ---- P5: d3 sum site ----
    if "p5" in which:
        def p5(y5, a5, c5):
            return ss._d3_sum_site(y5, a5, c5, bp["d3_w"], bp["d3_b"][:12],
                                   ho=HO, w2=W2, wp=WP)
        t = bench(p5, lambda s: (r(s, (B, HBUF, WP, 128)),
                                 r(s + 1, (B, 128), jnp.float32, 0.1),
                                 r(s + 2, (B, 128), jnp.float32, 0.1)))
        print(f"p5 d3-site    : {t*1e3:7.2f} ms", flush=True)

    # ---- XLA d2 conv pass (applied+padded input -> conv + stats) ----
    if "xd2" in which:
        def xd2(xin):
            y = conv2d(xin, bp["d2_w"], bp["d2_b"])
            m, inv = s2d2._in_stats(y, 4, 32)
            return y.astype(jnp.float32).ravel()[:1] + jnp.sum(m + inv)
        t = bench(xd2, lambda s: (r(s, (B, H2 + 2, W2 + 2, 64)),))
        print(f"xla d2+stats  : {t*1e3:7.2f} ms", flush=True)

    # ---- XLA d3 chain: pad + apply + rows conv + slice-add + bias ----
    if "xd3" in which:
        def xd3(y, m, inv):
            yp = s2d2._pad_reflect_f2_4px(y, 32)
            ya = s2d1._apply_in_relu(yp, m, inv, bp["in5"]["scale"],
                                     bp["in5"]["bias"], 4)
            rows = conv2d(ya, bp["d3_w"])
            o = sum(rows[:, dy:dy + H2, :, dy * 12:(dy + 1) * 12]
                    for dy in range(5))
            return o + bp["d3_b"].astype(o.dtype)
        t = bench(xd3, lambda s: (r(s, (B, H2, W2, 128)),
                                  r(s + 1, (B, 32), jnp.float32, 0.1),
                                  r(s + 2, (B, 32), jnp.float32, 0.1)))
        print(f"xla d3 chain  : {t*1e3:7.2f} ms", flush=True)

    # ---- XLA d2s+pad+apply (the pass P4's prologue replaces) ----
    if "xd2s" in which:
        def xd2s(y1raw, m, inv):
            x = s2d1.d2s(y1raw, 2, 64)
            x = s2d1._pad_edge_blocks(x)
            return s2d1._apply_in_relu(x, m, inv, bp["in4"]["scale"],
                                       bp["in4"]["bias"], 1)
        t = bench(xd2s, lambda s: (r(s, (B, H4, W4, 256)),
                                   r(s + 1, (B, 64), jnp.float32, 0.1),
                                   r(s + 2, (B, 64), jnp.float32, 0.1)))
        print(f"xla d2s+apply : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
