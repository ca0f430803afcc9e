#!/usr/bin/env python3
"""CLI shim: reference-compatible drive_videos entry point (batch planner + montage)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.drive_videos import main

if __name__ == "__main__":
    sys.exit(main())
