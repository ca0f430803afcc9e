#!/usr/bin/env python3
"""CLI shim: artistic animated text overlays on video."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.cryptic_text import main

if __name__ == "__main__":
    sys.exit(main())
