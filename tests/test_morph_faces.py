"""morph_faces app: zoom/blend math parity pieces + end-to-end smoke."""

import numpy as np
import pytest


def test_filter_overlapping_faces():
    from neuralstyletransferv1_tpu.apps.morph_faces import filter_overlapping_faces

    faces = [
        {"id": 1, "bbox": (10, 10, 50, 50), "confidence": 0.9},
        {"id": 2, "bbox": (12, 12, 50, 50), "confidence": 0.8},  # overlaps #1
        {"id": 3, "bbox": (200, 200, 40, 40), "confidence": 0.7},
    ]
    kept = filter_overlapping_faces(faces, iou_threshold=0.3)
    assert [f["bbox"][0] for f in kept] == [10, 200]
    assert [f["id"] for f in kept] == [1, 2]  # re-numbered


def test_safe_zoom_and_crop():
    from neuralstyletransferv1_tpu.apps.morph_faces import (
        apply_zoom_crop,
        calculate_safe_zoom,
    )

    # center near the edge needs a higher zoom floor: 0.5/0.1 = 5
    assert calculate_safe_zoom((0.1, 0.5), 1.0) == pytest.approx(5.0)
    assert calculate_safe_zoom(None, 1.3) == 1.3
    img = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    out = apply_zoom_crop(img, 2.0, (0.5, 0.5), (64, 32))
    assert out.shape == (32, 64, 3)


def test_blob_masks_partition():
    from neuralstyletransferv1_tpu.apps.morph_faces import create_soft_multi_blob_masks

    m = create_soft_multi_blob_masks(32, 48, frame_idx=3, num_blobs=4)
    assert m.shape == (4, 32, 48)
    np.testing.assert_allclose(m.sum(0), 1.0, atol=1e-3)
    # deterministic given the same frame/seed
    m2 = create_soft_multi_blob_masks(32, 48, frame_idx=3, num_blobs=4)
    np.testing.assert_array_equal(m, m2)


def test_zoom_out_frames_shape_and_endpoints():
    import cv2

    from neuralstyletransferv1_tpu.apps.morph_faces import create_face_zoom_out

    rng = np.random.default_rng(0)
    imgs = [(rng.random((60, 80, 3)) * 255).astype(np.uint8) for _ in range(3)]
    orig = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    frames = create_face_zoom_out(imgs, orig, (40, 24), 1.0, 3.0, 8, 2.0, (0.5, 0.5))
    assert len(frames) == 16
    assert frames[0].shape == (24, 40, 3)
    # last frame blends fully to the original at min zoom (full view)
    want = cv2.resize(orig, (40, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(frames[-1].astype(int) - want.astype(int)).mean() < 2


def test_end_to_end_manual_faces(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps.morph_faces import main

    rng = np.random.default_rng(1)
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    p = tmp_path / "in.png"
    cv2.imwrite(str(p), img)
    rc = main([
        "--image", str(p), "--output_dir", str(tmp_path / "out"),
        "--manual_faces", "20,20,40,40;70,40,40,40",
        "--tiles", "32", "--fps", "6", "--morph_time", "1.0",
        "--transition", "0.5", "--scale", "128",
    ])
    assert rc == 0
    vids = list((tmp_path / "out" / "in").glob("*.mp4"))
    assert vids, "no video written"
    cap = cv2.VideoCapture(str(vids[0]))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n > 10
    assert (tmp_path / "out" / "in" / f"{vids[0].stem}_run.json").exists()


def test_end_to_end_blob_mode(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps.morph_faces import main

    rng = np.random.default_rng(2)
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    p = tmp_path / "in.png"
    cv2.imwrite(str(p), img)
    rc = main([
        "--image", str(p), "--output_dir", str(tmp_path / "out"),
        "--manual_faces", "30,20,50,50", "--blob", "--num_blobs", "3",
        "--tiles", "32", "--fps", "6", "--morph_time", "0.3",
    ])
    assert rc == 0
    assert list((tmp_path / "out" / "in").glob("*_faces_blob.mp4"))
