"""mk46: warp packing round 2 — fewer gather BYTES per row.

mk39 found XLA:TPU warp-gather cost sensitive to both row count and row
bytes (4x[H*W,3]f32 35.8 ms; 1x[H*W,12]bf16 15.7; 1x[H*W,12]f32 51.7).
The flow-EMA scan serializes one warp per frame, so ms/warp is the whole
lever. Probe cheaper rows at the same row count, plus a quarter-row ds2
variant:

  bf16x12 : warp_flow_packed as adopted (baseline, 24 B/row)
  u8x12   : corners quantized to uint8 (12 B/row), dequant post-gather
            (max quant err 1/510 per corner on [0,1]; gated-path grade)
  i32x3   : 4 u8 corners bit-packed per channel -> [H*W, 3] int32 rows
            (12 B/row, 4x fewer columns), shift/mask unpack on VPU
  i32x4c  : corner-major pack: each i32 = one corner's 3 u8 channels
            -> [H*W, 4] int32 rows
  ds2     : bf16x12 at 540x960 on a half-res prev + bilinear upsample
            of the warped result (quarter rows; QUALITY CHANGES —
            measure speed here, gate separately)

Protocol per CLAUDE.md: fresh salted inputs, CHAIN-minus-1, scalar fetch.
Each variant chains K warps sequentially (scan-like dependency: output
feeds the next warp's image) to match the production serialization.
"""

import functools
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H, W = 1080, 1920
CHAIN = 8  # serialized warps per measured call (mimics the scan)
SALT = (time.time_ns() // 1000) % 1_000_000_007


def _coords(flow):
    h, w = flow.shape[0], flow.shape[1]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.clip(gx + flow[..., 0], 0.0, w - 1.001)
    y = jnp.clip(gy + flow[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(-1)
    return idx, (x - x0)[..., None], (y - y0)[..., None]


def _corners(img):
    px = jnp.concatenate(
        [img, jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)], axis=-1)
    return jnp.concatenate(
        [px, jnp.concatenate([px[1:], px[-1:]], axis=0)], axis=-1)


def warp_bf16x12(img, flow):
    from neuralstyletransferv1_tpu.ops.warp import warp_flow_packed
    return warp_flow_packed(img, flow)


def warp_u8x12(img, flow):
    h, w = flow.shape[0], flow.shape[1]
    c = img.shape[-1]
    idx, fx, fy = _coords(flow)
    p = _corners(img)
    flat = jnp.round(p * 255.0).astype(jnp.uint8).reshape(h * w, 4 * c)
    g = jnp.take(flat, idx, axis=0).reshape(h, w, 4 * c)
    g = g.astype(jnp.float32) * (1.0 / 255.0)
    v00, v01 = g[..., :c], g[..., c:2 * c]
    v10, v11 = g[..., 2 * c:3 * c], g[..., 3 * c:]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def warp_i32x3(img, flow):
    """Per channel, the 4 corners' u8 codes packed into one int32."""
    h, w = flow.shape[0], flow.shape[1]
    c = img.shape[-1]
    idx, fx, fy = _coords(flow)
    p = jnp.round(_corners(img) * 255.0).astype(jnp.int32)  # [h,w,4c]
    packed = (p[..., :c] | (p[..., c:2 * c] << 8)
              | (p[..., 2 * c:3 * c] << 16) | (p[..., 3 * c:] << 24))
    g = jnp.take(packed.reshape(h * w, c), idx, axis=0).reshape(h, w, c)
    s = 1.0 / 255.0
    v00 = (g & 0xFF).astype(jnp.float32) * s
    v01 = ((g >> 8) & 0xFF).astype(jnp.float32) * s
    v10 = ((g >> 16) & 0xFF).astype(jnp.float32) * s
    v11 = ((g >> 24) & 0xFF).astype(jnp.float32) * s
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def warp_i32x4c(img, flow):
    """Per corner, the 3 u8 channels packed into one int32."""
    h, w = flow.shape[0], flow.shape[1]
    idx, fx, fy = _coords(flow)
    p = jnp.round(_corners(img) * 255.0).astype(jnp.int32)  # [h,w,12]
    cs = []
    for k in range(4):
        r, gg, b = p[..., 3 * k], p[..., 3 * k + 1], p[..., 3 * k + 2]
        cs.append(r | (gg << 8) | (b << 16))
    packed = jnp.stack(cs, axis=-1)  # [h,w,4]
    g = jnp.take(packed.reshape(h * w, 4), idx, axis=0).reshape(h, w, 4)
    s = 1.0 / 255.0
    outs = []
    for k in range(4):
        v = g[..., k]
        outs.append(jnp.stack(
            [(v & 0xFF).astype(jnp.float32) * s,
             ((v >> 8) & 0xFF).astype(jnp.float32) * s,
             ((v >> 16) & 0xFF).astype(jnp.float32) * s], axis=-1))
    v00, v01, v10, v11 = outs
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(img.dtype)


def warp_ds2(img, flow):
    """Half-res warp + upsample: quarter gather rows. Approximate."""
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear
    from neuralstyletransferv1_tpu.ops.warp import warp_flow_packed
    h, w = flow.shape[0], flow.shape[1]
    img2 = resize_bilinear(img[None], (h // 2, w // 2))[0]
    f2 = resize_bilinear(flow[None], (h // 2, w // 2))[0] * 0.5
    wv = warp_flow_packed(img2, f2)
    return resize_bilinear(wv[None], (h, w))[0].astype(img.dtype)


VARIANTS = {
    "bf16x12": warp_bf16x12,
    "u8x12": warp_u8x12,
    "i32x3": warp_i32x3,
    "i32x4c": warp_i32x4c,
    "ds2": warp_ds2,
}


def run_cell(name):
    fn = VARIANTS[name]

    def chain(img, flow, n):
        def body(i, y):
            return fn(y, flow + (i % 3) * 1e-4)
        return jnp.mean(jax.lax.fori_loop(0, n, body, img))

    gN = jax.jit(functools.partial(chain, n=CHAIN))
    g1 = jax.jit(functools.partial(chain, n=1))

    def mk(s):
        k1, k2 = jax.random.split(jax.random.key(s + SALT))
        img = jax.random.uniform(k1, (H, W, 3), jnp.float32)
        flow = jax.random.normal(k2, (H, W, 2), jnp.float32) * 3.0
        return img, flow

    def run(g):
        i, f = mk(0)
        float(g(i, f))
        best = float("inf")
        for r in range(3):
            i, f = mk(100 + r)
            float(jnp.sum(i[0, :4, 0]))
            t0 = time.perf_counter()
            float(g(i, f))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (run(gN) - run(g1)) / (CHAIN - 1)
    # quality vs exact warp (informational; ds2 expected worse)
    from neuralstyletransferv1_tpu.ops.warp import warp_flow
    i, f = mk(7)
    mae = float(jnp.mean(jnp.abs(
        fn(i, f).astype(jnp.float32)
        - warp_flow(i, f, border="replicate"))))
    print(f"CELL {name} {t * 1e3:.4f} {mae:.2e}", flush=True)


def main():
    res = {}
    for name in VARIANTS:
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
                _, _, ms, mae = line.split()
                res[name] = float(ms)
                print(f"[{name}] {float(ms):.2f} ms/warp  mae={mae}",
                      flush=True)
                break
            tail = (p.stdout + p.stderr).strip().splitlines()[-3:]
            print(f"[{name}] CRASHED attempt {attempt} (rc={p.returncode}): "
                  f"{' | '.join(tail)}", flush=True)
            if attempt == 1:
                time.sleep(30)
    if res:
        print("\n--- mk46 @1080p, ms/warp (serialized chain) ---")
        for k, v in sorted(res.items(), key=lambda kv: kv[1]):
            print(f"{k:10s} {v:7.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        print("device:", jax.devices()[0], flush=True)
        run_cell(sys.argv[2])
    else:
        main()
