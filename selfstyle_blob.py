#!/usr/bin/env python3
"""CLI shim: magenta self-style variants composited through drifting blob masks."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.selfstyle_blob import main

if __name__ == "__main__":
    sys.exit(main())
