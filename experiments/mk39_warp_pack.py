"""mk39: flow-warp gather packing A/B @1080p — the temporal scan's
flow_ema warp is one bilinear_sample per frame (~34 ms at 1080p per
ops/warp.py's own round-2 measurement) and serializes inside the scan.

XLA:TPU gather cost is partly per-index-row (the 2-D -> flattened-1-D
rewrite won 2x at constant element count), so packing the four bilinear
corners into fewer gather rows should win again:

  base     : current bilinear_sample (4 gathers of [H*W,3] rows)
  xpair    : 2 gathers of [H*W,6] rows (img pre-packed with its x+1
             neighbor channel-wise; y0 and y0+1 rows gathered separately)
  corner4  : 1 gather of [H*W,12] rows (img pre-packed with x+1, y+1,
             x+1&y+1 neighbors) — 4x fewer index rows, same elements
  *_bf16   : same with the image in bf16 (halved gather bytes; output
             still blended in f32)

The packed image build is dense work (shifted copies) included in the
timing. Rows run in-scan-shaped chains (warp feeding the next warp) to
match the EMA dependency structure. Crash-isolated subprocess per row.
"""

import functools
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H, W = 1080, 1920
CHAIN = 8
SALT = (time.time_ns() // 1000) % 1_000_000_007


def _coords(flow):
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    # pre-clamp (cv2 BORDER_REPLICATE semantics, same as dis_flow's
    # _bilinear_dense): keeps x0/x0+1 in range so the packed neighbor
    # channels ARE the clamped corners (per-corner clamping would read
    # the unclamped x+1 channel at the left border)
    x = jnp.clip(gx + flow[..., 0], 0.0, W - 1.001)
    y = jnp.clip(gy + flow[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return x0, y0, (x - x0)[..., None], (y - y0)[..., None]


def warp_base(img, flow):
    from neuralstyletransferv1_tpu.ops.warp import warp_flow
    return warp_flow(img, flow)


def _pack_x(img):
    """[H,W,2C]: channel-concat of img and its x+1 neighbor (edge clamp)."""
    nxt = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    return jnp.concatenate([img, nxt], axis=-1)


def warp_xpair(img, flow, dtype=jnp.float32):
    c = img.shape[-1]
    x0, y0, fx, fy = _coords(flow)
    p = _pack_x(img).astype(dtype)                    # [H,W,2C]
    flat = p.reshape(H * W, 2 * c)

    def gather(yi, xi):
        yc = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        idx = (yc * W + xc).reshape(-1)
        return jnp.take(flat, idx, axis=0).reshape(H, W, 2 * c)

    top = gather(y0, x0)
    bot = gather(y0 + 1, x0)
    topv = top[..., :c].astype(jnp.float32) * (1 - fx) \
        + top[..., c:].astype(jnp.float32) * fx
    botv = bot[..., :c].astype(jnp.float32) * (1 - fx) \
        + bot[..., c:].astype(jnp.float32) * fx
    return topv * (1 - fy) + botv * fy


def warp_corner4(img, flow, dtype=jnp.float32):
    c = img.shape[-1]
    x0, y0, fx, fy = _coords(flow)
    px = _pack_x(img)                                  # [H,W,2C]
    dn = jnp.concatenate([px[1:], px[-1:]], axis=0)    # y+1 row (edge clamp)
    p = jnp.concatenate([px, dn], axis=-1).astype(dtype)  # [H,W,4C]
    flat = p.reshape(H * W, 4 * c)

    yc = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    xc = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    idx = (yc * W + xc).reshape(-1)
    g = jnp.take(flat, idx, axis=0).reshape(H, W, 4 * c).astype(jnp.float32)
    v00, v01, v10, v11 = g[..., :c], g[..., c:2 * c], \
        g[..., 2 * c:3 * c], g[..., 3 * c:]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


ROWS = {
    "base": lambda img, fl: warp_base(img, fl),
    "xpair": lambda img, fl: warp_xpair(img, fl),
    "corner4": lambda img, fl: warp_corner4(img, fl),
    "xpair_bf16": lambda img, fl: warp_xpair(img, fl, jnp.bfloat16),
    "corner4_bf16": lambda img, fl: warp_corner4(img, fl, jnp.bfloat16),
}


def run_cell(name):
    warp = ROWS[name]

    def f(img, flow, n):
        def body(i, im):
            out = warp(im, flow + 0.001 * i)
            return jnp.clip(out, 0.0, 1.0)
        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    gN = jax.jit(functools.partial(f, n=CHAIN))
    g1 = jax.jit(functools.partial(f, n=1))

    def mk(s):
        k = jax.random.key(s + SALT)
        img = jax.random.uniform(k, (H, W, 3), jnp.float32)
        flow = jax.random.normal(jax.random.key(s + SALT + 1),
                                 (H, W, 2), jnp.float32) * 4.0
        return img, flow

    def run(g):
        a, fl = mk(0)
        float(g(a, fl))
        best = float("inf")
        for r in range(2):
            a, fl = mk(100 + r)
            float(jnp.sum(a[0, :4]))
            t0 = time.perf_counter()
            float(g(a, fl))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1)
    print(f"CELL {name} {t * 1e3:.4f}", flush=True)


def check_exact():
    """CPU check: packed forms == base in the interior; border diffs stay
    within the pre-clamp's epsilon-interpolation (<=2e-3)."""
    k = jax.random.key(0)
    img = jax.random.uniform(k, (64, 96, 3), jnp.float32)
    flow = jax.random.normal(jax.random.key(1), (64, 96, 2)) * 3.0
    global H, W
    H, W = 64, 96
    b = warp_base(img, flow)
    for nm in ("xpair", "corner4"):
        o = ROWS[nm](img, flow)
        d = jnp.abs(o - b)
        di = float(jnp.max(d[8:-8, 8:-8]))
        db = float(jnp.max(d))
        print(f"{nm}: interior max |diff| = {di:.2e}, border {db:.2e}")
        assert di < 1e-5 and db < 2e-3, nm


def main():
    for name in ROWS:
        try:
            p = subprocess.run(
                [sys.executable, "-u", __file__, "--cell", name],
                capture_output=True, text=True, timeout=420)
        except subprocess.TimeoutExpired:
            print(f"[{name}] TIMEOUT", flush=True)
            continue
        line = next((l for l in p.stdout.splitlines()
                     if l.startswith("CELL ")), None)
        if line is not None:
            print(f"[{name}] {float(line.split()[-1]):.2f} ms/warp @1080p",
                  flush=True)
        else:
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
            print(f"[{name}] FAILED (rc={p.returncode}): {' | '.join(tail)}",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        run_cell(sys.argv[2])
    elif len(sys.argv) > 1 and sys.argv[1] == "--check":
        check_exact()
    else:
        main()
