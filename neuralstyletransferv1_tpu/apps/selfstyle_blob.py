"""selfstyle_blob — magenta self-style variants + blob-mask morph video.

Port of the reference app (reference: scripts/selfstyle_blob.py): the input
image is self-styled (content == style) at a ladder of magenta tile configs
(:79-139), optionally pre-styled with a transformer model, then composited
into a video where soft feathered gaussian blobs drift across the frame, each
blob revealing a different self-style variant (:199-276, 295-476).

TPU-native: all tile-config variants render through the batched magenta
driver; every output frame composites in one jitted call with the blob
fields computed in-graph from the frame index.
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np

# (tile, overlap) ladder (reference morph_v2.py:116-124 uses 128/16..512/64).
TILE_CONFIGS = [(128, 16), (192, 24), (256, 32), (384, 48), (512, 64)]


def self_style_variants(content01, tile_configs, seed=0, magenta_root="models/magenta"):
    """Magenta self-style at each tile config; returns [V,H,W,3] float01.

    Uses the real SavedModel graph when complete weights exist under
    ``magenta_root``; otherwise the compact random-weight net (self-style
    needs texture variation per tile, so the color-transfer fallback —
    identity for content==style — is not used here)."""
    import jax
    import jax.numpy as jnp

    from ..models import magenta

    sm_dir = magenta.find_savedmodel(magenta_root)
    params = None if sm_dir else magenta.init(jax.random.key(seed))
    outs = []
    H, W = content01.shape[:2]
    c = jnp.asarray(content01)
    for tile, overlap in tile_configs:
        if tile > min(H, W):
            continue
        from PIL import Image

        style = np.asarray(
            Image.fromarray((content01 * 255).astype(np.uint8)).resize((tile, tile), Image.LANCZOS),
            np.float32,
        ) / 255.0
        transfer = magenta.savedmodel_transfer_fn(sm_dir, style) if sm_dir else None
        outs.append(magenta.stylize_tiled(params, c, jnp.asarray(style),
                                          tile_size=tile, overlap=overlap,
                                          transfer_fn=transfer))
    if not outs:
        outs = [c]
    return jnp.stack(outs, 0)


def blob_morph_frames(variants, base01, num_frames, fps, n_blobs=2, blob_sigma_frac=0.22, speed=1.0):
    """Animated soft-blob composite (reference: selfstyle_blob.py:199-276).

    Blob k drifts on a lissajous path; its gaussian field selects variant
    (k mod V); the remainder shows the base image.
    """
    import jax
    import jax.numpy as jnp

    V, H, W, _ = variants.shape
    sigma = blob_sigma_frac * min(H, W)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    base = jnp.asarray(base01)

    ts = jnp.arange(num_frames, dtype=jnp.float32) / fps * speed

    @jax.jit
    def render(ts):
        def one(t):
            weights = []
            for k in range(n_blobs):
                cx = W * (0.5 + 0.33 * jnp.sin(t * (0.55 + 0.13 * k) + k * 2.1))
                cy = H * (0.5 + 0.33 * jnp.cos(t * (0.42 + 0.11 * k) + k * 1.3))
                d2 = (xs - cx) ** 2 + (ys - cy) ** 2
                weights.append(jnp.exp(-d2 / (2 * sigma * sigma)))
            wsum = sum(weights)
            base_w = jnp.clip(1.0 - wsum, 0.0, 1.0)
            out = base * base_w[..., None]
            total = base_w
            for k, wgt in enumerate(weights):
                out = out + variants[k % V] * wgt[..., None]
                total = total + wgt
            return out / jnp.clip(total, 1e-6, None)[..., None]

        return jax.vmap(one)(ts)

    frames = np.asarray(render(ts))
    return [np.clip(f * 255, 0, 255).astype(np.uint8) for f in frames]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--fps", type=int, default=24)
    ap.add_argument("--blobs", type=int, default=2)
    ap.add_argument("--tile_configs", type=str, default=None,
                    help="e.g. '128:16,256:32' (default: full ladder that fits)")
    args = ap.parse_args(argv)

    import cv2
    from PIL import Image

    im = Image.open(args.image).convert("RGB")
    w0, h0 = im.size
    s = args.size / max(w0, h0)
    if s < 1.0:
        im = im.resize((int(w0 * s) // 2 * 2, int(h0 * s) // 2 * 2), Image.LANCZOS)
    content01 = np.asarray(im, np.float32) / 255.0

    configs = TILE_CONFIGS
    if args.tile_configs:
        configs = [tuple(int(v) for v in c.split(":")) for c in args.tile_configs.split(",")]
    print(f"[selfstyle_blob] rendering {len(configs)} self-style variants…")
    variants = self_style_variants(content01, configs)
    print(f"[selfstyle_blob] {variants.shape[0]} variants; composing blob morph…")

    frames = blob_morph_frames(
        variants, content01, int(args.seconds * args.fps), args.fps, n_blobs=args.blobs
    )
    h, w = frames[0].shape[:2]
    for fourcc in ("avc1", "mp4v"):
        writer = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*fourcc), args.fps, (w, h))
        if writer.isOpened():
            break
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    print(f"[selfstyle_blob] wrote {args.output} ({len(frames)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
