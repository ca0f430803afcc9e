"""run_videos env-contract adapter: flag construction parity + end-to-end run."""

import os
from pathlib import Path

import pytest


@pytest.fixture
def clean_env(monkeypatch):
    for k in list(os.environ):
        if k.split("_")[0] in {"MODEL", "MAGENTA", "IO", "BLEND", "FLOW", "SMOOTH", "PIPELINE"} or k in {
            "SCALE", "FPS", "PRE_FPS", "MAX_FRAMES", "STRIDE", "OUT_DIR", "MOTION_BLEND", "CHROMA_ALPHA",
        }:
            monkeypatch.delenv(k, raising=False)
    return monkeypatch


def test_build_args_basic(clean_env):
    from neuralstyletransferv1_tpu.apps.run_videos import build_pipeline_args

    clean_env.setenv("MODEL_A", "/m/candy.pth")
    clean_env.setenv("MODEL_A_TYPE", "pytorch")  # maps to transformer
    clean_env.setenv("MODEL_B", "/m/x.t7")
    clean_env.setenv("MODEL_B_TYPE", "torch7")
    clean_env.setenv("SCALE", "480")
    clean_env.setenv("FPS", "12")
    clean_env.setenv("FLOW_EMA", "1")
    clean_env.setenv("BLEND_WEIGHTS", "0.7,0.3")
    clean_env.setenv("OUT_DIR", "/tmp/out")
    clean_env.setenv("PIPELINE_ARGS", "--region_mode voronoi --region_seed 7")

    args = build_pipeline_args("/videos/clip.mp4")
    s = " ".join(args)
    assert "--input_video /videos/clip.mp4" in s
    assert "--output_video /tmp/out/clip.mp4" in s
    assert "--model /m/candy.pth --model_type transformer" in s
    assert "--model_b /m/x.t7 --model_b_type torch7" in s
    assert "--scale 480" in s and "--fps 12" in s
    assert "--flow_ema" in s and "--flow_alpha 0.7" in s
    assert "--blend_models_weights 0.7,0.3" in s
    assert "--region_mode voronoi" in s


def test_relative_model_resolution(clean_env):
    from neuralstyletransferv1_tpu.apps.run_videos import build_pipeline_args

    clean_env.setenv("MODEL_A", "candy")
    clean_env.setenv("MODEL_A_TYPE", "pytorch")
    clean_env.setenv("PYTORCH_DIR", "/models/pt")
    args = build_pipeline_args("v.mp4")
    assert "/models/pt/candy.pth" in " ".join(args)


def test_magenta_slot(clean_env):
    from neuralstyletransferv1_tpu.apps.run_videos import build_pipeline_args

    clean_env.setenv("MODEL_A_TYPE", "magenta")
    clean_env.setenv("MAGENTA_STYLE", "starry_night.jpg")
    clean_env.setenv("MAGENTA_STYLES_DIR", "/styles")
    args = build_pipeline_args("v.mp4")
    s = " ".join(args)
    assert "--model magenta --model_type magenta" in s
    assert "--magenta_style /styles/starry_night.jpg" in s


def test_run_videos_end_to_end(clean_env, tmp_path):
    """Adapter → engine in-process on a tiny synthetic video."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    vid = tmp_path / "in.mp4"
    vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 8, (96, 64))
    for t in range(6):
        fr = np.full((64, 96, 3), t * 30, np.uint8)
        cv2.circle(fr, (10 + t * 12, 32), 10, (255, 0, 0), -1)
        vw.write(fr)
    vw.release()

    ckpt = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"
    if not ckpt.exists():
        pytest.skip("synthetic checkpoint missing")
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    clean_env.setenv("MODEL_A", str(ckpt))
    clean_env.setenv("MODEL_A_TYPE", "transformer")
    clean_env.setenv("IO_PRESET", "raw_255")
    clean_env.setenv("OUT_DIR", str(out_dir))
    clean_env.setenv("SCALE", "96")
    clean_env.setenv("FPS", "8")
    clean_env.setenv("MAX_FRAMES", "4")
    clean_env.setenv("PIPELINE_ARGS", f"--work_dir {tmp_path / '_work'}")

    from neuralstyletransferv1_tpu.apps.run_videos import main

    assert main([str(vid)]) == 0
    assert (out_dir / "in.mp4").exists()
