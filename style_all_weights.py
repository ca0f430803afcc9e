#!/usr/bin/env python3
"""CLI shim: style a frame range with every weight-ladder checkpoint."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.style_all_weights import main

if __name__ == "__main__":
    sys.exit(main())
