#!/usr/bin/env python3
"""CLI shim: reference-compatible run_sky_swap workflow (extract → masks → masked stylize)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.run_sky_swap import main

if __name__ == "__main__":
    sys.exit(main())
