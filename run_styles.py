#!/usr/bin/env python3
"""CLI shim: fixed 4-slot env-driven batch styling (reference run_styles.sh)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.run_styles import main

if __name__ == "__main__":
    sys.exit(main())
