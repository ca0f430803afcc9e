"""morph_v2 motion vocabulary: Ken Burns / zoom pulse / hue rotate."""

import numpy as np


def _frames(n=12, h=48, w=64):
    rng = np.random.default_rng(0)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    return [np.roll(base, i, axis=1) for i in range(n)]


def test_zoom_pulse_multiplier():
    from neuralstyletransferv1_tpu.apps.morph_v2 import calculate_zoom_pulse

    assert calculate_zoom_pulse(0.0, 0.05, 2.0) == 1.0
    assert 1.0 < calculate_zoom_pulse(0.125, 0.05, 2.0) <= 1.05


def test_hue_shift_changes_colors():
    from neuralstyletransferv1_tpu.apps.morph_v2 import apply_hue_shift

    f = _frames(1)[0]
    out = apply_hue_shift(f, 90.0)
    assert out.shape == f.shape
    assert np.abs(out.astype(int) - f.astype(int)).mean() > 5
    # zero shift is identity
    np.testing.assert_array_equal(apply_hue_shift(f, 0.0), f)


def test_ken_burns_pans_and_keeps_shape():
    from neuralstyletransferv1_tpu.apps.morph_v2 import apply_motion_effects

    frames = _frames(16)
    out = apply_motion_effects(frames, pan_zoom=2.0, pan_direction="horizontal")
    assert len(out) == len(frames)
    assert all(f.shape == frames[0].shape for f in out)
    # frame 0 is unzoomed; late frames are zoomed crops → differ from source
    np.testing.assert_array_equal(out[0], frames[0])
    assert np.abs(out[-1].astype(int) - frames[-1].astype(int)).mean() > 1


def test_motion_effects_disabled_is_identity():
    from neuralstyletransferv1_tpu.apps.morph_v2 import apply_motion_effects

    frames = _frames(5)
    out = apply_motion_effects(frames)
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_gen_pytorch_dual_blob_and_face_mode(tmp_path):
    import pytest

    cv2 = pytest.importorskip("cv2")
    from pathlib import Path

    from neuralstyletransferv1_tpu.apps.gen_pytorch_only_videos import main

    ckpt = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"
    rng = np.random.default_rng(0)
    img = tmp_path / "in.png"
    cv2.imwrite(str(img), (rng.random((96, 128, 3)) * 255).astype(np.uint8))

    out1 = tmp_path / "dual.mp4"
    rc = main(["--image", str(img), "--models", str(ckpt), str(ckpt),
               "--output", str(out1), "--io_preset", "raw_255",
               "--size", "128", "--fps", "6", "--dual_blob",
               "--duration", "1.0", "--max_zoom", "2.0"])
    assert rc == 0 and out1.exists()

    out2 = tmp_path / "faces.mp4"
    rc = main(["--image", str(img), "--models", str(ckpt),
               "--output", str(out2), "--io_preset", "raw_255",
               "--size", "96", "--fps", "6", "--face_mode",
               "--manual_faces", "20,20,50,50", "--duration", "1.0",
               "--max_zoom", "2.0"])
    assert rc == 0 and out2.exists()
