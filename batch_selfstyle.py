#!/usr/bin/env python3
"""CLI shim: batch_selfstyle app."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.batch_selfstyle import main

if __name__ == "__main__":
    sys.exit(main())
