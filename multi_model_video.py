#!/usr/bin/env python3
"""CLI shim: compose pre-styled frame dirs with weight walks and style pulses."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.multi_model_video import main

if __name__ == "__main__":
    sys.exit(main())
