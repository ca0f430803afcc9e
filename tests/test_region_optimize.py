"""Crop-optimized region path: bbox/bucket math + engine equivalence."""

from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"


def test_bbox_and_padding():
    from neuralstyletransferv1_tpu.region.crops import compute_mask_bbox, pad_bbox

    m = np.zeros((50, 80), np.float32)
    m[10:20, 30:45] = 1.0
    assert compute_mask_bbox(m) == (30, 10, 45, 20)
    assert pad_bbox((30, 10, 45, 20), 8, 80, 50) == (22, 2, 53, 28)
    # empty mask → full frame
    assert compute_mask_bbox(np.zeros((50, 80), np.float32)) == (0, 0, 80, 50)


def test_bucket_ladder():
    from neuralstyletransferv1_tpu.region.crops import bucket_hw

    assert bucket_hw(100, 200) == (128, 256)
    assert bucket_hw(512, 513) == (512, 768)
    assert bucket_hw(2100, 64) == (2176, 128)


def test_style_crop_batched_groups_and_restores():
    from neuralstyletransferv1_tpu.region.crops import style_crop_batched

    calls = []

    def fake_fn(batch):
        calls.append(batch.shape)
        return batch * 0.5

    rng = np.random.default_rng(0)
    crops = [rng.random((100, 120, 3)).astype(np.float32),
             rng.random((90, 110, 3)).astype(np.float32),   # same bucket
             rng.random((300, 300, 3)).astype(np.float32)]
    outs = style_crop_batched(crops, fake_fn)
    assert sorted(c[0] for c in calls) == [1, 2]  # two buckets, one batched
    for o, c in zip(outs, crops):
        assert o.shape == c.shape
        np.testing.assert_allclose(o, c * 0.5, atol=1e-6)


def test_composite_covers_frame_and_normalizes():
    from neuralstyletransferv1_tpu.region.blend import RegionConfig
    from neuralstyletransferv1_tpu.region.crops import (
        composite_from_crops,
        prepare_region_crops,
    )

    H, W = 40, 60
    masks = np.zeros((2, H, W), np.float32)
    masks[0, :, :30] = 1.0
    masks[1, :, 30:] = 1.0
    configs = [RegionConfig([0], [1.0], 1.0), RegionConfig([1], [1.0], 1.0)]
    crops = prepare_region_crops(masks, configs, H, W, padding=4)
    styled = {
        0: {0: np.full(
            (crops[0].padded_bbox[3] - crops[0].padded_bbox[1],
             crops[0].padded_bbox[2] - crops[0].padded_bbox[0], 3), 0.25, np.float32)},
        1: {1: np.full(
            (crops[1].padded_bbox[3] - crops[1].padded_bbox[1],
             crops[1].padded_bbox[2] - crops[1].padded_bbox[0], 3), 0.75, np.float32)},
    }
    out = composite_from_crops(styled, crops, None, H, W, masks)
    assert out.shape == (H, W, 3)
    np.testing.assert_allclose(out[:, :28], 0.25, atol=1e-5)
    np.testing.assert_allclose(out[:, 32:], 0.75, atol=1e-5)


def _run_engine_region(img, out, tmp_path, extra):
    from neuralstyletransferv1_tpu.engine.pipeline import main

    rc = main([
        "--input_image", str(img), "--output_image", str(out),
        "--model", str(CKPT), "--io_preset", "raw_255",
        "--model_b", str(CKPT), "--io_preset_b", "raw_01",
        "--region_mode", "voronoi", "--region_count", "2",
        "--region_seed", "fixed", "--region_feather", "0",
        "--region_assignment", "sequential",
        "--no-smooth_lightness",
        "--work_dir", str(tmp_path / "w"),
    ] + extra)
    assert rc == 0


def test_engine_crop_path_matches_fullframe(tmp_path):
    """With crops that exactly fill a bucket (128x128 frame, padding beyond
    it) the crop path must reproduce the full-frame region path."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = tmp_path / "in.png"
    Image.fromarray((rng.random((128, 128, 3)) * 255).astype(np.uint8)).save(img)

    a = tmp_path / "full.png"
    b = tmp_path / "opt.png"
    _run_engine_region(img, a, tmp_path, [])
    _run_engine_region(img, b, tmp_path, ["--region_optimize", "--region_padding", "256"])
    fa = np.asarray(Image.open(a), np.float32)
    fb = np.asarray(Image.open(b), np.float32)
    mae = np.abs(fa - fb).mean() / 255.0
    assert mae < 1e-2, mae


def test_engine_crop_path_bucket_padding_tolerance(tmp_path):
    """Crops that need wrap-padding to reach their bucket shift the
    instance-norm statistics slightly; the deviation stays bounded (the
    reference's own crop path deviates from ITS full-frame path too — IN
    stats are computed over the crop, not the frame)."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = tmp_path / "in.png"
    Image.fromarray((rng.random((64, 96, 3)) * 255).astype(np.uint8)).save(img)

    a = tmp_path / "full.png"
    b = tmp_path / "opt.png"
    _run_engine_region(img, a, tmp_path, [])
    _run_engine_region(img, b, tmp_path, ["--region_optimize", "--region_padding", "128"])
    fa = np.asarray(Image.open(a), np.float32)
    fb = np.asarray(Image.open(b), np.float32)
    mae = np.abs(fa - fb).mean() / 255.0
    assert mae < 0.06, mae
