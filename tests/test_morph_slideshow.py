"""morph_slideshow (morph.sh port): transitions + end-to-end."""

from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"


def test_transition_masks_progress():
    from neuralstyletransferv1_tpu.apps.morph_slideshow import crossfade_frames

    a = np.zeros((20, 30, 3), np.uint8)
    b = np.full((20, 30, 3), 200, np.uint8)
    for kind in ("fade", "dissolve", "wipeleft", "wiperight",
                 "smoothleft", "smoothright"):
        frames = crossfade_frames(a, b, kind, 5, seed=1)
        assert len(frames) == 5
        means = [f.mean() for f in frames]
        assert means[0] < means[-1], kind  # progresses toward b


def test_end_to_end_slideshow(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps.morph_slideshow import main

    rng = np.random.default_rng(0)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cv2.imwrite(str(in_dir / "photo.png"),
                (rng.random((64, 96, 3)) * 255).astype(np.uint8))
    rc = main([
        "--in_dir", str(in_dir), "--out_dir", str(tmp_path / "out"),
        "--work_root", str(tmp_path / "w"),
        "--models", f"candy:{CKPT}", f"mosaic:{CKPT}:transformer",
        "--io_preset", "raw_255", "--scale", "96", "--fps", "6",
        "--hold_orig_start", "0.5", "--hold_orig_end", "0.5",
        "--hold_model", "0.5", "--trans", "0.5", "--seed", "42",
    ])
    assert rc == 0
    vids = list((tmp_path / "out").glob("*_morph.mp4"))
    assert len(vids) == 1
    cap = cv2.VideoCapture(str(vids[0]))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    # stills: orig + 2 models + 1 blend + orig = 5; holds 0.5s + 4 trans
    assert n >= 5 * 3
