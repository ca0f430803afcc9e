"""Model zoo: functional JAX network definitions.

Every model is a pair of pure functions:
  ``init(rng) -> params``   (random initialization, torch-compatible fan-in)
  ``apply(params, x) -> y`` (jittable forward; NHWC activations)

Checkpoint importers in :mod:`neuralstyletransferv1_tpu.io.checkpoints` map
reference torch state-dicts onto these param pytrees.
"""

from . import transformer_net, transformer_net_nst, reconet
from .io_presets import IO_PRESETS, preprocess, postprocess, resolve_auto_preset

__all__ = [
    "transformer_net",
    "transformer_net_nst",
    "reconet",
    "IO_PRESETS",
    "preprocess",
    "postprocess",
    "resolve_auto_preset",
]
