#!/usr/bin/env python3
"""CLI shim: transformer-style transition videos with animated wipe masks."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.gen_pytorch_only_videos import main

if __name__ == "__main__":
    sys.exit(main())
