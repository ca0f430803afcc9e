#!/usr/bin/env python3
"""CLI shim: generate_magenta_self_style (self-style sample generator)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.generate_magenta_self_style import main

if __name__ == "__main__":
    sys.exit(main())
