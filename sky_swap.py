#!/usr/bin/env python3
"""CLI shim: reference-compatible sky_swap entry point (DeepLabV3+ masking)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.sky_swap import main

if __name__ == "__main__":
    sys.exit(main())
