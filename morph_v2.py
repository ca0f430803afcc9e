#!/usr/bin/env python3
"""CLI shim: automatic self-style morph videos (segmentation -> crop -> styles -> flow morph)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.morph_v2 import main

if __name__ == "__main__":
    sys.exit(main())
