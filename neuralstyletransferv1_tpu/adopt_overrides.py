"""Measured-adoption overrides for the int8 fused-site defaults.

The int8 engine constants (``engine/stylizer.py`` ``_I8_FUSED_*``) and the
kernel-form flags (``PAIR_D2``, ``RECO_SKIP``) may only change on an in-net
TPU A/B win (PERF.md rule). The A/B queue (``experiments/run_tpu_queue.sh``)
often runs unattended — the relay comes and goes — so the adoption step must
be able to land without a human editing constants:
``experiments/adopt_from_queue.py --apply`` writes ``i8_adopt.json`` next to
this module when the queue shows wins outside noise, and the watch loop
(``experiments/tpu_watch.sh``) deletes the file again if the post-adoption
bench headline regresses.

Precedence per knob:
  explicit env var (``PAIR_D2`` / ``RECO_SKIP``, for A/B harnesses)
  > ``i8_adopt.json`` (measured adoption)
  > built-in default (the last published measured configuration).

Tuple keys replace the default wholesale (the JSON records the full adopted
set, not a delta), so a stale default can never resurrect through a merge.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

PATH = Path(__file__).with_name("i8_adopt.json")

#: The published, measured defaults (PERF.md round-3). adopt_from_queue
#: reads these too, so the A/B decision tables and the engine stay in sync.
DEFAULTS: dict[str, tuple | bool] = {
    "sites": ("res_i8", "dec_i8"),  # s2d2 Johnson engine path
    # int8_static mode (frozen norms); "res_s8" (s8-carry chain) is the
    # mk35-measured candidate
    "sites_static": ("res_i8", "dec_i8"),
    # t7 splits by graph form: BN-folded graphs (zero runtime norms, static
    # quantize scales) measure differently from IN graphs — mk32 2026-08-19
    # showed plain XLA-int8 beating every Pallas chain on the BN form
    # (145.4 vs 131.2 fps B16, 181.2 vs 168.3 B48) while the IN form ties.
    # An empty tuple = quantized convs ride XLA int8 with no fused sites.
    "t7": ("res_i8",),       # IN-form .t7 graphs
    "t7_bn": ("res_i8",),    # BN-folded .t7 graphs (adoption: mk32 rows)
    "nst": ("res_i8",),
    "reco": ("res_i8",),
    # static-norm (frozen IN/FRN) int8 variants for the NST / ReCoNet
    # backends; candidates ("dec_i8", NST "c2_i8") await their mk35 rows
    "nst_static": ("res_i8",),
    "reco_static": ("res_i8",),
    "pair_d2": False,  # K=128 column-pair d2 form (default = measured K=64)
    "reco_skip": False,  # ReCoNet combine folded into the next a-site
}


def _load() -> dict:
    try:
        with open(PATH, encoding="utf-8") as f:
            d = json.load(f)
        return d if isinstance(d, dict) else {}
    except (OSError, ValueError):
        return {}


_DATA = _load()


def reload() -> None:
    """Re-read i8_adopt.json (tests; modules cache values at import)."""
    global _DATA
    _DATA = _load()


def sites(key: str) -> tuple:
    """Adopted fused-site tuple for ``key`` ('sites'/'t7'/'nst'/'reco')."""
    v = _DATA.get(key)
    if isinstance(v, (list, tuple)) and all(isinstance(t, str) for t in v):
        return tuple(v)
    return DEFAULTS[key]  # type: ignore[return-value]


def flag(key: str, env: str | None = None) -> bool:
    """Adopted boolean for ``key``; an explicit env var wins (harnesses)."""
    if env is not None and env in os.environ:
        return os.environ[env] == "1"
    v = _DATA.get(key)
    return v if isinstance(v, bool) else DEFAULTS[key]  # type: ignore
