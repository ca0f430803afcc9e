"""Orchestration layer and app CLIs (sky_swap, run_videos, drive_videos, …)."""
