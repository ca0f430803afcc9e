#!/usr/bin/env python3
"""CLI shim: styled-stills crossfade slideshows (reference morph.sh)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.morph_slideshow import main

if __name__ == "__main__":
    sys.exit(main())
