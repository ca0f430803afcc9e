#!/usr/bin/env python3
"""CLI shim: generate_video_samples (presets/sample-generator family)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.apps.generate_video_samples import main

if __name__ == "__main__":
    sys.exit(main())
