#!/usr/bin/env python3
"""CLI shim: FG/BG masked styled stills + crossfade slideshow."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.style_mask import main

if __name__ == "__main__":
    sys.exit(main())
