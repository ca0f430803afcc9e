"""mk38: flow-pipeline STEP attribution @1080p B8 — where do the 64 ms/frame
(bench flow ds2, round-4 session 1) actually go?

bench's flow section (config #5) composes gray+resize -> vmapped DIS ->
stylize -> temporal_postprocess_scan in one graph. DIS@ds2 is ~16 ms/pair
and stylize ~9 ms/frame, leaving ~40 ms/frame unattributed. Prime suspect:
the temporal scan serializes per frame, and its flow_ema warp is a
6M-element bilinear gather per frame (PERF.md: XLA:TPU gathers sustain only
0.1-0.7 M elements/ms).

Rows are the SAME bench step with stages disabled via public knobs:

  full         : bench's make_step(ds=2) exactly
  no_blend     : motion_blend=False (drops mag+blur(sigma=3)+blend)
  no_lab       : smooth_lightness=False too (drops LAB round trip)
  no_ema       : flow_ema=False too (scan body is now ~uniform_blend only
                 -> the remaining scan cost is the scan floor)
  no_temporal  : skip the scan entirely (styled mean) -> scan total
  no_stylize   : styled = x (full temporal chain, no net)
  dis_only     : flow computation alone (gray+resize+DIS)

Attribution by subtraction; protocol per CLAUDE.md (fresh salted inputs,
chain-minus-1, scalar fetch). Crash-isolated like mk36: each row runs in a
fresh subprocess.
"""

import functools
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import os

H, W = 1080, 1920
B = int(os.environ.get("B", "8"))
CHAIN = 2  # compile cost of the DIS+scan graph scales with the chain; 2 is
#            the minimum that still cancels dispatch overhead
SALT = (time.time_ns() // 1000) % 1_000_000_007


def make_step(ds, *, motion_blend=True, smooth_lightness=True, flow_ema=True,
              temporal=True, stylize=True, flow=True, bparams=None):
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d
    from neuralstyletransferv1_tpu.ops.color import rgb_to_gray
    from neuralstyletransferv1_tpu.ops.dis_flow import dis_flow
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear
    from neuralstyletransferv1_tpu.temporal.ema import temporal_postprocess_scan

    def step(x01):
        x = x01.astype(jnp.float32)
        if flow:
            grays = rgb_to_gray(x * 255.0)
            prevs = jnp.concatenate([grays[:1], grays[:-1]], 0)
            hs, ws = H // ds, W // ds
            f = jax.vmap(dis_flow)(
                resize_bilinear(prevs[..., None], (hs, ws))[..., 0],
                resize_bilinear(grays[..., None], (hs, ws))[..., 0])
            flows = resize_bilinear(f, (H, W)) * float(ds)
        else:
            flows = jnp.zeros((B, H, W, 2), jnp.float32)
        if stylize:
            styled = jnp.clip(s2d.apply(bparams, x01.astype(jnp.bfloat16)),
                              0.0, 1.0).astype(jnp.float32)
        else:
            styled = x
        if not temporal:
            return jnp.mean(styled) + jnp.mean(flows)
        out, _ = temporal_postprocess_scan(
            styled, x, flows,
            flow_ema=flow_ema, flow_alpha=0.6,
            smooth_lightness=smooth_lightness,
            motion_blend=motion_blend, blend=0.9)
        return jnp.mean(out)

    return step


ROWS = [
    ("full", {}),
    ("no_blend", dict(motion_blend=False)),
    ("no_lab", dict(motion_blend=False, smooth_lightness=False)),
    ("no_ema", dict(motion_blend=False, smooth_lightness=False,
                    flow_ema=False)),
    ("no_temporal", dict(temporal=False)),
    ("no_stylize", dict(stylize=False)),
    ("dis_only", dict(temporal=False, stylize=False)),
]


def run_cell(name):
    kw = dict(ROWS)[name]
    bparams = _bench_params() if kw.get("stylize", True) else None
    step = make_step(2, bparams=bparams, **kw)

    def f(x, n):
        def body(i, acc):
            # fold the accumulator into the input so iterations chain
            return acc + step(x + acc * 1e-6)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    gN = jax.jit(functools.partial(f, n=CHAIN))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        return jax.random.uniform(jax.random.key(s + SALT), (B, H, W, 3),
                                  jnp.float32)

    def run(g):
        float(g(mk(0)))
        best = float("inf")
        for r in range(2):
            x = mk(100 + r)
            float(jnp.sum(x[0, 0, :4]))
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1) / B
    print(f"CELL {name} {t * 1e3:.4f}", flush=True)


def _bench_params():
    """Same seeded random Johnson params bench.py uses (bench.py:721-726)."""
    from neuralstyletransferv1_tpu import config
    from neuralstyletransferv1_tpu.models import transformer_net
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    config.set_conv_precision("default")
    params = transformer_net.init(jax.random.key(0))
    b32 = s2d.bake_io_affine(s2d.from_johnson_params(params), "imagenet_255")
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), b32)


def main():
    res = {}
    for name, _ in ROWS:
        for attempt in (1, 2):
            try:
                p = subprocess.run(
                    [sys.executable, "-u", __file__, "--cell", name],
                    capture_output=True, text=True, timeout=900)
            except subprocess.TimeoutExpired:
                print(f"[{name}] TIMEOUT attempt {attempt}", flush=True)
                continue
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith("CELL ")), None)
            if line is not None:
                res[name] = float(line.split()[-1])
                print(f"[{name}] {res[name]:.2f} ms/frame", flush=True)
                break
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
            print(f"[{name}] CRASHED attempt {attempt} (rc={p.returncode}): "
                  f"{' | '.join(tail)}", flush=True)
            if attempt == 1:
                time.sleep(60)
    if all(n in res for n, _ in ROWS):
        g = res
        print("\n--- attribution (ms/frame @1080p B8, flow ds2) ---")
        print(f"motion_blend   {g['full'] - g['no_blend']:.2f}")
        print(f"lab_roundtrip  {g['no_blend'] - g['no_lab']:.2f}")
        print(f"flow_ema(warp) {g['no_lab'] - g['no_ema']:.2f}")
        print(f"scan_floor     {g['no_ema'] - g['no_temporal']:.2f}")
        print(f"temporal_total {g['full'] - g['no_temporal']:.2f}")
        print(f"stylize        {g['full'] - g['no_stylize']:.2f}"
              f"  (alt: no_temporal-dis {g['no_temporal'] - g['dis_only']:.2f})")
        print(f"dis+gray+resz  {g['dis_only']:.2f}")
        print(f"full           {g['full']:.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        print("device:", jax.devices()[0], flush=True)
        run_cell(sys.argv[2])
    else:
        main()
