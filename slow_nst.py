#!/usr/bin/env python3
"""Optimization-based (Gram-matrix) neural style transfer CLI.

New capability in the rebuild (BASELINE config #3); the reference only ships
the loss helpers (reference: utils.py:80-96). Runs the whole 500-step
optimization as one compiled TPU program.

Usage:
  python slow_nst.py --content in.jpg --style style.jpg --output out.png \
      [--steps 500] [--size 512] [--vgg_weights vgg16.pth]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
from PIL import Image


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--content", required=True)
    ap.add_argument("--style", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--content_weight", type=float, default=1.0)
    ap.add_argument("--style_weight", type=float, default=1e4)
    ap.add_argument("--tv_weight", type=float, default=1e-4)
    ap.add_argument("--init_from", choices=["content", "random"], default="content")
    ap.add_argument("--vgg_weights", type=str, default=None,
                    help="torchvision-format vgg16 state-dict (.pth). Random init if absent.")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from neuralstyletransferv1_tpu.engine import gram_nst
    from neuralstyletransferv1_tpu.models import vgg

    def load(path):
        img = Image.open(path).convert("RGB")
        w, h = img.size
        s = args.size / max(w, h)
        if s < 1.0:
            img = img.resize((int(w * s), int(h * s)), Image.LANCZOS)
        return jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]

    content = load(args.content)
    style = load(args.style)

    if args.vgg_weights:
        import torch

        sd = torch.load(args.vgg_weights, map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        params = vgg.import_torchvision_vgg16(sd)
        print(f"[vgg] loaded {args.vgg_weights}")
    else:
        import jax

        params = vgg.init(jax.random.key(0))
        print("[vgg][warn] no --vgg_weights given; using random VGG features "
              "(structure testing only — stylization quality needs pretrained weights)")

    t0 = time.time()
    out, history = gram_nst.optimize(
        params, content, style,
        steps=args.steps, lr=args.lr,
        content_weight=args.content_weight, style_weight=args.style_weight,
        tv_weight=args.tv_weight, init_from=args.init_from,
    )
    out_np = np.asarray(out[0])
    hist = np.asarray(history)
    dt = time.time() - t0
    print(f"[nst] {args.steps} steps in {dt:.1f}s ({args.steps / dt:.1f} steps/s)  "
          f"loss {hist[0]:.4f} -> {hist[-1]:.4f}")
    Image.fromarray((np.clip(out_np, 0, 1) * 255).astype(np.uint8)).save(args.output)
    print(f"[ok] wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
