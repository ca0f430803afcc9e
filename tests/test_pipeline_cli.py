"""End-to-end CLI tests: our pipeline.py vs the reference pipeline.py.

This is BASELINE config #1: Johnson TransformerNet, single 512px image,
CPU-comparable, per-frame MAE ≤ 1e-2 against the reference output.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
CKPT = REPO / "_testdata" / "test_johnson.pth"


@pytest.fixture(scope="module")
def small_image(tmp_path_factory):
    d = tmp_path_factory.mktemp("img")
    src = Image.open("/root/reference/input/frame.jpeg").convert("RGB").resize((192, 144))
    p = d / "in.png"
    src.save(p)
    return p


@pytest.fixture(scope="module")
def ckpt():
    if not CKPT.exists():
        import torch

        sys.path.insert(0, "/root/reference")
        import transformer_net as ref_tn

        sys.path.remove("/root/reference")
        torch.manual_seed(7)
        CKPT.parent.mkdir(exist_ok=True)
        torch.save(ref_tn.TransformerNet().state_dict(), CKPT)
    return CKPT


def _run_ours(args, tmp):
    from neuralstyletransferv1_tpu.engine.pipeline import main

    rc = main(args + ["--work_dir", str(tmp / "_work")])
    assert rc == 0


def test_single_image_mode(small_image, ckpt, tmp_path):
    out = tmp_path / "out.png"
    _run_ours(
        [
            "--input_image", str(small_image),
            "--output_image", str(out),
            "--model", str(ckpt),
            "--io_preset", "raw_255",
        ],
        tmp_path,
    )
    assert out.exists()
    assert Image.open(out).size == (192, 144)


def test_single_image_matches_reference_pipeline(small_image, ckpt, tmp_path, reference_path):
    ours = tmp_path / "ours.png"
    _run_ours(
        [
            "--input_image", str(small_image),
            "--output_image", str(ours),
            "--model", str(ckpt),
            "--io_preset", "raw_255",
            "--no-smooth_lightness",
        ],
        tmp_path,
    )
    theirs = tmp_path / "theirs.png"
    r = subprocess.run(
        [
            sys.executable, str(reference_path / "pipeline.py"),
            "--input_image", str(small_image),
            "--output_image", str(theirs),
            "--model", str(ckpt),
            "--io_preset", "raw_255",
            "--no-smooth_lightness",
            "--device", "cpu",
            "--work_dir", str(tmp_path / "_refwork"),
        ],
        cwd=str(reference_path),
        capture_output=True,
        text=True,
        timeout=600,
    )
    if r.returncode != 0:
        pytest.skip(f"reference pipeline unavailable here: {r.stderr[-500:]}")
    a = np.asarray(Image.open(ours), np.float32) / 255.0
    b = np.asarray(Image.open(theirs), np.float32) / 255.0
    mae = np.abs(a - b).mean()
    assert mae <= 1e-2, f"MAE vs reference pipeline: {mae}"


def test_batch_mode_and_multimodel_blend(small_image, ckpt, tmp_path):
    in_dir = tmp_path / "ins"
    in_dir.mkdir()
    for i in range(2):
        Image.open(small_image).save(in_dir / f"img{i}.png")
    out_dir = tmp_path / "outs"
    _run_ours(
        [
            "--input_dir", str(in_dir),
            "--output_dir", str(out_dir),
            "--pattern", "*.png",
            "--model", str(ckpt),
            "--model_b", str(ckpt),
            "--blend_models_weights", "0.6,0.4",
            "--io_preset", "raw_255",
        ],
        tmp_path,
    )
    outs = sorted(out_dir.glob("*.png"))
    assert len(outs) == 2


def test_region_blend_cli(small_image, ckpt, tmp_path):
    out = tmp_path / "region.png"
    _run_ours(
        [
            "--input_image", str(small_image),
            "--output_image", str(out),
            "--model", str(ckpt),
            "--model_b", str(ckpt),
            "--region_mode", "voronoi",
            "--region_seed", "7",
            "--io_preset", "raw_255",
        ],
        tmp_path,
    )
    assert out.exists()


def test_mask_composite_cli(small_image, ckpt, tmp_path):
    mask = tmp_path / "mask.png"
    m = np.zeros((144, 192), np.uint8)
    m[:, :96] = 255
    Image.fromarray(m).save(mask)
    out = tmp_path / "masked.png"
    _run_ours(
        [
            "--input_image", str(small_image),
            "--output_image", str(out),
            "--model", str(ckpt),
            "--mask", str(mask),
            "--mask_feather", "4",
            "--io_preset", "raw_255",
            "--no-smooth_lightness",
        ],
        tmp_path,
    )
    a = np.asarray(Image.open(out), np.float32)
    orig = np.asarray(Image.open(small_image), np.float32)
    # Right half (mask=0, keep mode) must be the original.
    assert np.abs(a[:, 120:] - orig[:, 120:]).mean() < 2.0
    # Left half should be stylized (different from original).
    assert np.abs(a[:, :72] - orig[:, :72]).mean() > 5.0
