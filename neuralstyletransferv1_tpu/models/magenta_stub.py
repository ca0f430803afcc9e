"""Magenta arbitrary-stylization slot loader.

Builds the JAX magenta model (models/magenta.py) with the style image baked
in. The reference's pretrained TF-Hub weights are unusable in any
environment — variables shard 0 is stripped from the mount
(.MISSING_LARGE_BLOBS:8) — so weights initialize randomly with a loud
warning; a SavedModel converter can slot in here once real weights exist.
"""

from __future__ import annotations

import numpy as np


def load_magenta_slot(style_path: str, args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..engine.stylizer import StyleModel
    from ..io.frames import load_image_exif_rgb
    from . import magenta

    tile = int(getattr(args, "magenta_tile", 256))
    overlap = int(getattr(args, "magenta_overlap", 32))
    target_res = getattr(args, "magenta_target_res", None)

    style_pil = load_image_exif_rgb(style_path).resize((tile, tile), Image.LANCZOS)
    style01 = jnp.asarray(np.asarray(style_pil, np.float32) / 255.0)

    print(
        "[magenta][warn] pretrained weights unavailable (variables shard 0 is "
        "stripped from the reference mount); using random-weight arbitrary "
        "stylization — structure/throughput valid, aesthetics are not."
    )
    params = magenta.init(jax.random.key(0))
    from pathlib import Path

    return StyleModel(
        "magenta",
        {
            "magenta": params,
            "style01": style01,
            "tile": tile,
            "overlap": overlap,
            "target_res": int(target_res) if target_res else 0,
        },
        "raw_01",
        Path(style_path).stem,
        "magenta",
    )
