#!/usr/bin/env python3
"""CLI shim: the reference-compatible pipeline entry point.

Same flag surface as the reference's pipeline.py (see
neuralstyletransferv1_tpu/engine/config.py); execution is the TPU-native
engine (neuralstyletransferv1_tpu/engine/pipeline.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from neuralstyletransferv1_tpu.engine.pipeline import main

if __name__ == "__main__":
    sys.exit(main())
