#!/usr/bin/env python3
"""CLI shim: face-detector smoke check (reference: scripts/test_face_detect.py).

Prints detected face boxes for one image through the first-party SSD
(models/caffe_ssd.py). Usage:
    python test_face_detect.py <image> [prototxt] [caffemodel]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    image = sys.argv[1]
    prototxt = sys.argv[2] if len(sys.argv) > 2 else "models/face_detector/deploy.prototxt"
    model = sys.argv[3] if len(sys.argv) > 3 else \
        "models/face_detector/res10_300x300_ssd_iter_140000.caffemodel"
    from neuralstyletransferv1_tpu.models.caffe_ssd import detect_faces

    faces = detect_faces(image, prototxt, model)
    print(f"Detected {len(faces)} face(s):")
    for f in faces:
        print(f"  #{f['id']}: bbox={f['bbox']} conf={f['confidence']:.2f} "
              f"coverage={f['coverage']:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
