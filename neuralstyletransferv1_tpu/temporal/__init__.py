"""Temporal-coherence post-processing (flow EMA, LAB EMA, motion blend)."""

from .ema import (
    flow_ema_fuse,
    lab_ema_step,
    motion_adaptive_blend,
    temporal_postprocess_scan,
    uniform_blend,
)

__all__ = [
    "flow_ema_fuse",
    "lab_ema_step",
    "motion_adaptive_blend",
    "temporal_postprocess_scan",
    "uniform_blend",
]
