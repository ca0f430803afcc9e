"""Magenta arbitrary-stylization slot loader.

Prefers the REAL TF-Hub SavedModel weights when a complete artifact sits
under --magenta_model_root (reference layout models/magenta/<hash>/,
pipeline.py:153-168), executing the actual graph in JAX
(io/tf_saved_model.py). Falls back to the compact random-weight net with a
loud warning when the weights are absent (the reference mount strips
variables shard 0, .MISSING_LARGE_BLOBS:8).
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

    model_root = getattr(args, "magenta_model_root", "/app/models/magenta")
    params: dict = {
        "style01": style01,
        "tile": tile,
        "overlap": overlap,
        "target_res": int(target_res) if target_res else 0,
    }
    sm_dir = magenta.find_savedmodel(model_root)
    if sm_dir:
        print(f"[magenta] real weights: executing SavedModel graph from {sm_dir}")
        params["transfer_fn"] = magenta.savedmodel_transfer_fn(sm_dir, style01)
    else:
        print(
            "[magenta][warn] no complete SavedModel under "
            f"{model_root} (the reference mount strips variables shard 0); "
            "falling back to Reinhard moment-matching color transfer — the "
            "tiled path is identical, the aesthetic is a global color match "
            "rather than learned texture."
        )
        params["transfer_fn"] = magenta.color_transfer_fn(style01)
    from pathlib import Path

    return StyleModel("magenta", params, "raw_01", Path(style_path).stem, "magenta")
