"""mk36: DIS per-stage attribution @1080p (+ds2), vmapped B8 — where do the
~68 ms/pair (PERF.md round-3) actually go?

Not an adoption A/B: every row is the SAME oracle-exact implementation with
stages disabled via its public knobs, so subtraction attributes cost:

  full                : defaults (finest_scale 2, 16 GN iters, VF 5, blur 1.0)
  no_blur             : smooth_sigma=0            -> blur = full - no_blur
  no_vf               : refine_iters=0 (+no blur) -> VF   = no_blur - no_vf
  search0             : iters=0 too               -> GN   = no_vf - search0
                        (search0 = pyramid resizes + patch extraction +
                         prewarp + densify floor)
  coarse_only         : finest_scale=3, no VF/blur -> finest-level share
                        = no_vf - coarse_only (approx; coarser pyramid too)

Rows repeat at B16 to see whether the vmapped grid fills the chip (the
batched engine path runs B-1 pairs per batch), and at flow_downscale 2
(540x960 inputs) — the measured-default story if full-res stays >50 ms.

Protocol per CLAUDE.md: fresh inputs each timed call (relay memoizes),
in-graph chain minus 1-chain, scalar fetch.

CRASH ISOLATION: the 2026-08-19 window run died on its FIRST cell with
"TPU worker process crashed or restarted" and took the whole harness (and
the worker) down. The driver now runs every (size, batch, row) cell in a
fresh subprocess (`--cell` mode) with a timeout, so a kernel fault or OOM
costs one cell, not the window; a crashed cell is retried once after a
60 s worker-recovery pause.
"""

import functools
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from neuralstyletransferv1_tpu.ops import dis_flow as D

CHAIN = 4


def bench(label, h, w, b, **kw):
    flow_fn = functools.partial(D.dis_flow, **kw)

    def f(prev, curr, n):
        def body(i, carry):
            p, c = carry
            fl = jax.vmap(flow_fn)(p, c)
            # data-dependence so chained iterations can't CSE
            return (c, c + 0.001 * fl[..., 0])

        p, c = jax.lax.fori_loop(0, n, body, (prev, curr))
        return jnp.sum(c)

    gN = jax.jit(functools.partial(f, n=CHAIN))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        k = jax.random.key(s)
        a = jax.random.uniform(k, (b, h, w), jnp.float32) * 255.0
        bb = jnp.roll(a, 3, axis=2) + jax.random.normal(k, (b, h, w)) * 2.0
        return a, bb

    def run(g):
        a, bb = mk(0)
        float(g(a, bb))  # compile + warm
        best = float("inf")
        for r in range(2):
            a, bb = mk(100 + r)
            float(jnp.sum(a[0, 0, :4]))  # materialize inputs
            t0 = time.perf_counter()
            float(g(a, bb))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1) / b
    print(f"[{label}] {t * 1e3:.2f} ms/frame-pair", flush=True)
    return t


ROWS = [
    ("full", {}),
    ("no_blur", dict(smooth_sigma=0.0)),
    ("no_vf", dict(smooth_sigma=0.0, refine_iters=0)),
    ("search0", dict(smooth_sigma=0.0, refine_iters=0, iters=0)),
    ("coarse_only", dict(smooth_sigma=0.0, refine_iters=0, finest_scale=3)),
]


SIZES = [(1080, 1920, "1080p"), (540, 960, "540p-ds2")]


def run_cell(h, w, sl, b, name):
    kw = dict(ROWS)[name]
    t = bench(f"{sl} B{b} {name}", h, w, b, **kw)
    # machine-readable line the driver parses back out of the subprocess
    print(f"CELL {sl} {b} {name} {t * 1e3:.4f}", flush=True)


def main():
    import os

    batches = [int(x) for x in os.environ.get("BATCHES", "8,16").split(",")]
    cell_to = int(os.environ.get("CELL_TIMEOUT_S", "420"))
    sizes = [s for s in SIZES
             if s[2] in os.environ.get("SIZES", "1080p,540p-ds2").split(",")]
    res = {}
    for h, w, sl in sizes:
        for b in batches:
            for name, _ in ROWS:
                for attempt in (1, 2):
                    try:
                        p = subprocess.run(
                            [sys.executable, "-u", __file__, "--cell",
                             sl, str(b), name],
                            capture_output=True, text=True,
                            timeout=cell_to + 60)
                    except subprocess.TimeoutExpired:
                        print(f"[{sl} B{b} {name}] TIMEOUT attempt {attempt}",
                              flush=True)
                        continue
                    out = p.stdout
                    line = next((l for l in out.splitlines()
                                 if l.startswith("CELL ")), None)
                    if line is not None:
                        res[(sl, b, name)] = float(line.split()[-1]) / 1e3
                        print(f"[{sl} B{b} {name}] "
                              f"{res[(sl, b, name)] * 1e3:.2f} ms/frame-pair",
                              flush=True)
                        break
                    tail = (out + p.stderr).strip().splitlines()[-3:]
                    print(f"[{sl} B{b} {name}] CRASHED attempt {attempt} "
                          f"(rc={p.returncode}): {' | '.join(tail)}",
                          flush=True)
                    if attempt == 1:
                        time.sleep(60)  # give the TPU worker time to restart
    print("\n--- attribution (ms/pair) ---", flush=True)
    for h, w, sl in sizes:
        for b in batches:
            if any((sl, b, n) not in res for n, _ in ROWS):
                print(f"{sl} B{b}: INCOMPLETE "
                      f"({[n for n, _ in ROWS if (sl, b, n) not in res]})",
                      flush=True)
                continue
            g = lambda n: res[(sl, b, n)] * 1e3
            print(
                f"{sl} B{b}: blur {g('full') - g('no_blur'):.2f} | "
                f"VF {g('no_blur') - g('no_vf'):.2f} | "
                f"GN-iters {g('no_vf') - g('search0'):.2f} | "
                f"pyr+extract+densify {g('search0'):.2f} | "
                f"finest-level(~) {g('no_vf') - g('coarse_only'):.2f} | "
                f"full {g('full'):.2f}",
                flush=True,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        # ITER=xla flips the GN iteration engine off Pallas for the cell:
        # the 2026-08-19 window showed the vmapped-chain mk36 graph
        # kernel-faults the TPU worker with the Pallas engine at 1080p B8
        # (bench.py's flow graph with the same vmapped dis_flow is fine),
        # so attribution runs on the XLA engine and a single pallas-vs-xla
        # cell pins the engine delta.
        import os as _os

        if _os.environ.get("ITER", "pallas") == "xla":
            D._ITER_PALLAS = False
        sl, b, name = sys.argv[2], int(sys.argv[3]), sys.argv[4]
        h, w = next((h, w) for h, w, s in SIZES if s == sl)
        print("device:", jax.devices()[0], flush=True)
        run_cell(h, w, sl, b, name)
    else:
        main()
