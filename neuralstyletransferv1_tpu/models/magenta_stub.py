"""Magenta arbitrary-stylization slot (placeholder loader).

The reference runs Google's magenta arbitrary-image-stylization-v1-256
TF-Hub module with a reference-side tiling loop (reference:
pipeline.py:153-265). The shipped weights are unusable in any environment —
variables shard 0 is stripped from the mount (.MISSING_LARGE_BLOBS:8) — so
this loader currently raises with a clear message. The JAX architecture +
SavedModel weight converter land with the magenta model family
(models/magenta.py, planned); the tiling/stitching math is already
implemented TPU-side in ops (see engine notes).
"""


def load_magenta_slot(style_path: str, args):
    raise NotImplementedError(
        "magenta backend: weight shard 0 is missing from the reference mount "
        "(.MISSING_LARGE_BLOBS); the JAX magenta port activates once weights "
        "are available. Use transformer/reconet slots meanwhile."
    )
