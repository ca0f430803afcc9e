"""cryptic_text app: fills, distortions, animations, end-to-end overlay."""

import numpy as np
import pytest


def test_gradient_fills_shapes():
    from neuralstyletransferv1_tpu.apps.cryptic_text import apply_gradient_fill

    mask = np.zeros((20, 40), np.uint8)
    mask[5:15, 10:30] = 255
    for g in ("fire", "ice", "rainbow", "chrome", "white"):
        rgba = apply_gradient_fill(mask, g, progress=0.3)
        assert rgba.shape == (20, 40, 4)
        np.testing.assert_array_equal(rgba[..., 3], mask)
        assert rgba[..., :3].max() > 100


def test_distortions_preserve_shape():
    import random

    from neuralstyletransferv1_tpu.apps.cryptic_text import apply_distortion

    rng = random.Random(0)
    rgba = np.zeros((32, 48, 4), np.uint8)
    rgba[10:22, 16:32] = 255
    for d in ("ripple", "melt", "breathe", "glitch_warp", "wave_distort", "none"):
        out = apply_distortion(rgba, d, progress=0.4, rng=rng)
        assert out.shape == rgba.shape, d
    # breathe at zero-crossing progress is identity-ish
    out = apply_distortion(rgba, "breathe", progress=0.0, rng=rng)
    assert np.abs(out.astype(int) - rgba.astype(int)).mean() < 2


def test_animation_positions_in_frame():
    from neuralstyletransferv1_tpu.apps.cryptic_text import (
        ANIMATIONS,
        get_animation_position,
    )

    for anim in ANIMATIONS:
        for t in (0.0, 0.3, 0.7, 1.0):
            (x, y), rot, scale = get_animation_position(anim, t, (320, 240), (60, 20))
            assert -400 < x < 800 and -400 < y < 700, (anim, t, x, y)
            assert 0.2 <= scale <= 1.5


def test_letter_masks():
    from neuralstyletransferv1_tpu.apps.cryptic_text import render_letter_masks

    letters = render_letter_masks("AB", None, 32)
    assert len(letters) == 2
    assert letters[0]["char"] == "A"
    assert letters[1]["x_offset"] > 0
    assert letters[0]["mask"].max() > 200  # PIL default font antialiases


def test_end_to_end_overlay(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps.cryptic_text import main

    vid = tmp_path / "in.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 8, (160, 120))
    rng = np.random.default_rng(0)
    base = (rng.random((120, 160, 3)) * 128).astype(np.uint8)
    for _ in range(12):
        vw.write(base)
    vw.release()
    out = tmp_path / "out.mp4"
    rc = main(["--input", str(vid), "--output", str(out),
               "--phrases", "HELLO,WORLD", "--seed", "7",
               "--animation", "float", "--distortion", "ripple",
               "--fill", "gradient_fire"])
    assert rc == 0 and out.exists()
    cap = cv2.VideoCapture(str(out))
    ok, fr = cap.read()
    n = 1
    changed = np.abs(fr.astype(int) - base.astype(int)).mean() > 1
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        n += 1
        changed = changed or np.abs(fr.astype(int) - base.astype(int)).mean() > 1
    cap.release()
    assert n == 12
    assert changed, "text overlay did not alter any frame"
