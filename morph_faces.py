#!/usr/bin/env python3
"""CLI shim: multi-face zoom-blend videos (SSD detect -> styled sets -> zoom/blob morphs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.morph_faces import main

if __name__ == "__main__":
    sys.exit(main())
