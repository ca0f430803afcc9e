#!/usr/bin/env python3
"""CLI shim: optical-flow morph slideshow (the reference's morph/slideshow family)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.morph import main

if __name__ == "__main__":
    sys.exit(main())
