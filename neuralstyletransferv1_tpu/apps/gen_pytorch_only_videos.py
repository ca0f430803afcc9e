"""gen_pytorch_only_videos — transition videos between transformer styles.

Port of the reference app's core (reference:
scripts/gen_pytorch_only_videos.py): style one image with several transformer
checkpoints, then render transitions between consecutive variants using
animated wipe masks — spiral (:28-55), organic blob (:58-100), radial
(:103-135) — plus the dual-blob morph treatment. Brightness-ordered sequencing
(:724-752) keeps transitions visually monotone. (The face-detection variants
remain with morph_faces, pending the SSD port.)

TPU-native: all masks evaluate in-graph from the frame index and every
transition renders as one vmapped call.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

import numpy as np


def _mask_fields(H, W, kind: str, seed: int):
    """Static per-kind field in [0,1]; progress thresholds it per frame."""
    import jax.numpy as jnp

    y = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    if kind == "spiral":
        cy, cx = H / 2, W / 2
        r = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        theta = jnp.arctan2(y - cy, x - cx) + jnp.pi
        spiral = (theta + r / max(H, W) * 3.0 * 2 * jnp.pi) % (2 * jnp.pi)
        return spiral / (2 * jnp.pi), 10.0
    if kind == "radial":
        cy, cx = H / 2, W / 2
        r = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2)
        max_r = jnp.sqrt(cx**2 + cy**2)
        return r / max_r, 8.0
    # blob: multi-octave sine noise blended with a linear wipe (reference
    # :58-100; phases drawn like np.random.seed(seed)).
    rng = np.random.default_rng(seed)
    yn = jnp.linspace(0, 1, H)[:, None]
    xn = jnp.linspace(0, 1, W)[None, :]
    noise = jnp.zeros((H, W), jnp.float32)
    for octave in range(3):
        freq = 3.0 * (2**octave)
        amp = 1.0 / (2**octave)
        phase_x = float(rng.random() * 2 * np.pi)
        phase_y = float(rng.random() * 2 * np.pi)
        noise = noise + amp * jnp.sin(yn * freq * jnp.pi + phase_y)
        noise = noise + amp * jnp.sin(xn * freq * jnp.pi + phase_x)
    noise = (noise - noise.min()) / (noise.max() - noise.min() + 1e-6)
    return xn * 0.6 + noise * 0.4, 8.0


def transition_frames(img_a, img_b, kind: str, num_frames: int, seed: int = 42):
    """Animated wipe from img_a to img_b (uint8 RGB in/out)."""
    import jax
    import jax.numpy as jnp

    H, W = img_a.shape[:2]
    field, sharp = _mask_fields(H, W, kind, seed)
    a = jnp.asarray(img_a.astype(np.float32))
    b = jnp.asarray(img_b.astype(np.float32))
    ts = jnp.linspace(0.0, 1.0, num_frames)

    @jax.jit
    def render(ts):
        def one(t):
            m = jnp.clip((t * 1.2 - 0.1 - field) * sharp + 0.5, 0, 1)[..., None]
            return a * (1 - m) + b * m

        return jax.vmap(one)(ts)

    out = np.asarray(render(ts))
    return [np.clip(f, 0, 255).astype(np.uint8) for f in out]


def brightness_order(images):
    """Order variants by mean luma (reference: :724-752)."""
    lumas = [float(np.mean(im @ np.array([0.299, 0.587, 0.114]))) for im in images]
    return [im for _, im in sorted(zip(lumas, images), key=lambda p: p[0])]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--models", nargs="+", required=True, help="transformer checkpoints")
    ap.add_argument("--output", required=True)
    ap.add_argument("--io_preset", default="auto")
    ap.add_argument("--size", type=int, default=720)
    ap.add_argument("--fps", type=int, default=24)
    ap.add_argument("--transition_frames", type=int, default=36)
    ap.add_argument("--hold_frames", type=int, default=12)
    ap.add_argument("--masks", type=str, default="spiral,blob,radial",
                    help="cycle of transition kinds")
    ap.add_argument("--order", choices=["given", "brightness"], default="brightness")
    args = ap.parse_args(argv)

    import cv2
    from PIL import Image

    from ..engine.pipeline import main as pipeline_main

    im = Image.open(args.image).convert("RGB")
    w0, h0 = im.size
    s = args.size / max(w0, h0)
    if s < 1.0:
        im = im.resize((int(w0 * s) // 2 * 2, int(h0 * s) // 2 * 2), Image.LANCZOS)

    variants = [np.asarray(im)]
    with tempfile.TemporaryDirectory(prefix="gpov_") as td:
        td = pathlib.Path(td)
        src = td / "src.png"
        im.save(src)
        for mi, mpath in enumerate(args.models):
            outp = td / f"v{mi}.png"
            rc = pipeline_main([
                "--input_image", str(src), "--output_image", str(outp),
                "--model", mpath, "--io_preset", args.io_preset,
                "--no-smooth_lightness", "--work_dir", str(td / "_w"),
            ])
            if rc == 0 and outp.exists():
                variants.append(np.asarray(Image.open(outp).convert("RGB")))
            else:
                print(f"[gpov][warn] {mpath} failed; skipping")

    if len(variants) < 2:
        print("[gpov][error] fewer than 2 variants")
        return 2
    if args.order == "brightness":
        variants = brightness_order(variants)

    kinds = args.masks.split(",")
    frames: list[np.ndarray] = []
    for i, (a, b) in enumerate(zip(variants, variants[1:])):
        frames.extend([a] * args.hold_frames)
        frames.extend(transition_frames(a, b, kinds[i % len(kinds)], args.transition_frames, seed=42 + i))
    frames.extend([variants[-1]] * args.hold_frames)

    h, w = frames[0].shape[:2]
    for fourcc in ("avc1", "mp4v"):
        writer = cv2.VideoWriter(args.output, cv2.VideoWriter_fourcc(*fourcc), args.fps, (w, h))
        if writer.isOpened():
            break
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    print(f"[gpov] wrote {args.output} ({len(frames)} frames, {len(variants)} variants)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
