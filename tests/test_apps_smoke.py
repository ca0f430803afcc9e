"""Smoke/behavior tests for the app modules that previously had no direct
coverage (reference scripts: style_all_weights.py, style_video_pipeline.py,
multi_model_video.py, style_morph.py, gen_pytorch_only_videos.py,
style_showcase.py, batch_selfstyle_all_images.py, selfstyle_blob.py,
run_sky_swap.sh, style_mask/). Each test drives the app's real CLI/env
contract end-to-end on tiny synthetic inputs and asserts the contracted
artifacts exist and are well-formed."""

from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"


def _write_img(path, w=96, h=64, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(path)


def _write_video(path, n=4, w=96, h=64, fps=8):
    cv2 = pytest.importorskip("cv2")
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    rng = np.random.default_rng(0)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    for t in range(n):
        vw.write(np.roll(base, t * 2, axis=1))
    vw.release()


def _frame_count(path):
    cv2 = pytest.importorskip("cv2")
    cap = cv2.VideoCapture(str(path))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


def _ladder_dir(tmp_path, rungs=("candy_style1e9", "candy_style5e9")):
    import shutil

    wdir = tmp_path / "weights"
    wdir.mkdir()
    for r in rungs:
        shutil.copy(CKPT, wdir / f"{r}.pth")
    return wdir


def test_style_all_weights(tmp_path):
    from neuralstyletransferv1_tpu.apps.style_all_weights import main

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in (1, 2):
        _write_img(frames / f"frame_{i:04d}.png", seed=i)
    wdir = _ladder_dir(tmp_path)
    out_root = tmp_path / "styled"
    assert main([
        "--frames_dir", str(frames), "--weights_dir", str(wdir),
        "--out_root", str(out_root), "--io_preset", "raw_255",
        "--frame_batch", "2", "--work_dir", str(tmp_path / "w"),
    ]) == 0
    for rung in ("candy_style1e9", "candy_style5e9"):
        outs = list((out_root / rung).glob("*.png")) + \
            list((out_root / rung).glob("*.jpg"))
        assert len(outs) == 2, (rung, outs)


@pytest.mark.slow
def test_style_video_pipeline(tmp_path):
    """extract → ladder-style → walk_{family}.json (reference:
    scripts/style_video_pipeline.py:140-171)."""
    import json

    from neuralstyletransferv1_tpu.apps.style_video_pipeline import main

    vid = tmp_path / "in.mp4"
    _write_video(vid, n=3)
    wdir = _ladder_dir(tmp_path)
    out = tmp_path / "out"
    assert main([
        "--video", str(vid), "--output_dir", str(out),
        "--weights_dir", str(wdir), "--fps", "4", "--scale", "64",
        "--io_preset", "raw_255", "--frame_batch", "2",
        "--work_dir", str(tmp_path / "w"),
    ]) == 0
    walks = list(out.glob("walk_*.json"))
    assert walks, list(out.iterdir())
    plan = json.loads(walks[0].read_text())
    assert plan
    styled = list((out / "styled").glob("*/*.png")) + \
        list((out / "styled").glob("*/*.jpg"))
    assert styled


def test_multi_model_video(tmp_path):
    """Weight-walk composite over pre-styled stills + run-parameters JSON
    (reference: scripts/multi_model_video.py:53-166)."""
    from neuralstyletransferv1_tpu.apps.multi_model_video import main

    base = tmp_path / "base"
    base.mkdir()
    for name in ("img1", "img2"):
        for suffix in ("original", "candy", "mosaic"):
            _write_img(base / f"{name}_{suffix}.png",
                       seed=hash((name, suffix)) % 1000)
    out = tmp_path / "mmv.mp4"
    assert main([
        "--base_dir", str(base), "--base_weights", "candy,mosaic",
        "--output", str(out), "--fps", "8", "--hold_frames", "3",
    ]) == 0
    assert out.exists() and _frame_count(out) == 6
    logs = list(out.parent.glob("*.json"))
    assert logs, "run-parameters JSON log not written"


def test_style_morph(tmp_path):
    """Ladder-interpolation video from pre-styled rung stills (reference:
    scripts/style_morph.py:105-118 smoothstep rungs + sine drift)."""
    from neuralstyletransferv1_tpu.apps.style_morph import main

    styled = tmp_path / "styled"
    styled.mkdir()
    for name in ("img1", "img2"):
        for rung in ("candy", "candy_style1e9"):
            _write_img(styled / f"{name}_{rung}.png",
                       seed=hash((name, rung)) % 1000)
    out = tmp_path / "morph.mp4"
    assert main([
        "--styled_dir", str(styled), "--output", str(out),
        "--families", "candy", "--frame_seconds", "0.5", "--fps", "4",
    ]) == 0
    assert out.exists() and _frame_count(out) >= 2


@pytest.mark.slow
def test_gen_pytorch_only_videos(tmp_path):
    """Two-model transition video with an animated spiral wipe (reference:
    scripts/gen_pytorch_only_videos.py:28-55)."""
    import shutil

    from neuralstyletransferv1_tpu.apps.gen_pytorch_only_videos import main

    img = tmp_path / "img.png"
    _write_img(img)
    m1 = tmp_path / "m1.pth"
    m2 = tmp_path / "m2.pth"
    shutil.copy(CKPT, m1)
    shutil.copy(CKPT, m2)
    out = tmp_path / "trans.mp4"
    assert main([
        "--image", str(img), "--models", str(m1), str(m2),
        "--output", str(out), "--io_preset", "raw_255", "--size", "64",
        "--fps", "8", "--transition_frames", "4", "--hold_frames", "2",
        "--masks", "spiral", "--order", "given",
    ]) == 0
    assert out.exists() and _frame_count(out) >= 6


@pytest.mark.slow
def test_style_showcase_env_contract(tmp_path, monkeypatch):
    """original → styles → blends → original showcase (reference:
    scripts/style_showcase.py): env-discovered models, crossfaded chain."""
    import shutil

    from neuralstyletransferv1_tpu.apps.style_showcase import main

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_img(in_dir / "img.png")
    pdir = tmp_path / "pytorch"
    pdir.mkdir()
    shutil.copy(CKPT, pdir / "alpha.pth")
    shutil.copy(CKPT, pdir / "beta.pth")
    out_dir = tmp_path / "out"
    env = {
        "IN_DIR": str(in_dir), "OUT_DIR": str(out_dir),
        "PYTORCH_DIR": str(pdir), "TORCH_DIR": str(tmp_path / "none"),
        "SCALE": "64", "FPS": "4", "MOTION": "none",
        "HOLD_MODEL": "0.5", "HOLD_ORIG_START": "0.25",
        "HOLD_ORIG_END": "0.25", "TRANS": "0.25",
        "IO_PRESET": "raw_255", "INCLUDE_BLENDS": "1",
    }
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    assert main([]) == 0
    outs = list(out_dir.glob("*.mp4"))
    assert len(outs) == 1 and _frame_count(outs[0]) >= 4


@pytest.mark.slow
def test_batch_selfstyle(tmp_path, monkeypatch):
    """Magenta self-style over a directory at the tile ladder (reference:
    scripts/batch_selfstyle_all_images.py; random-weight magenta fallback
    — no SavedModel dir in the test env)."""
    from neuralstyletransferv1_tpu.apps.batch_selfstyle import main

    monkeypatch.chdir(tmp_path)  # keep the relative magenta_root empty
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_img(in_dir / "a.png", w=64, h=64)
    out_dir = tmp_path / "out"
    assert main([
        "--input_dir", str(in_dir), "--output_dir", str(out_dir),
        "--size", "64", "--tile_configs", "32:8",
    ]) == 0
    assert (out_dir / "a_t32o8.png").exists()


@pytest.mark.slow
def test_selfstyle_blob(tmp_path, monkeypatch):
    """Self-style variants + drifting blob-mask morph video (reference:
    scripts/selfstyle_blob.py:199-276)."""
    from neuralstyletransferv1_tpu.apps.selfstyle_blob import main

    monkeypatch.chdir(tmp_path)
    img = tmp_path / "img.png"
    _write_img(img, w=64, h=64)
    out = tmp_path / "blob.mp4"
    assert main([
        "--image", str(img), "--output", str(out), "--size", "64",
        "--seconds", "0.5", "--fps", "4", "--blobs", "1",
        "--tile_configs", "32:8,32:16",
    ]) == 0
    assert out.exists() and _frame_count(out) >= 2


@pytest.mark.slow
def test_run_sky_swap_env_contract(tmp_path, monkeypatch, ref_mobilenet_ckpt):
    """Masked-stylization video workflow (reference: run_sky_swap.sh):
    extract → DeepLab masks (backbone auto-detected from the checkpoint)
    → masked pipeline pass → assemble."""
    from neuralstyletransferv1_tpu.apps.run_sky_swap import main

    vid = tmp_path / "in.mp4"
    _write_video(vid, n=2)
    out_dir = tmp_path / "out"
    env = {
        "INPUT_VIDEO": str(vid), "OUT_DIR": str(out_dir),
        "WORK_ROOT": str(tmp_path / "w"),
        "STYLE_MODEL": str(CKPT), "STYLE_MODEL_TYPE": "transformer",
        "IO_PRESET": "raw_255", "DEEPLAB_WEIGHTS": str(ref_mobilenet_ckpt),
        "CANVAS_W": "96", "CANVAS_H": "64", "FPS": "4",
        "INFER_RES": "96", "MASK_RES": "64",
        "MASK_TARGET_LABELS": "person", "MAX_FRAMES": "2",
    }
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    assert main([]) == 0
    outs = list(out_dir.glob("*.mp4"))
    assert outs and _frame_count(outs[-1]) >= 1


@pytest.mark.slow
def test_style_mask(tmp_path, ref_mobilenet_ckpt):
    """FG/BG masked stills + crossfade slideshow (reference:
    style_mask/style_mask.sh:87-159)."""
    from neuralstyletransferv1_tpu.apps.style_mask import main

    img = tmp_path / "img.png"
    _write_img(img)
    out = tmp_path / "slide.mp4"
    stills = tmp_path / "stills"
    assert main([
        "--images", str(img), "--output", str(out),
        "--deeplab_weights", str(ref_mobilenet_ckpt),
        "--target_labels", "person", "--fg_model", str(CKPT),
        "--io_preset", "raw_255", "--size", "64", "--mask_res", "64",
        "--hold_secs", "0.5", "--fade_secs", "0.25", "--fps", "4",
        "--out_stills", str(stills),
    ]) == 0
    assert out.exists() and _frame_count(out) >= 2
    assert list(stills.glob("*.png")) or list(stills.glob("*.jpg"))


def test_detect_backbone_from_keys():
    """Backbone auto-detection from reference state-dict key shapes
    (modeling/backbone/*: features=mobilenet, layer0=drn, block1=xception,
    layer1..4=resnet)."""
    from neuralstyletransferv1_tpu.models.deeplab import detect_backbone

    assert detect_backbone({"backbone.features.0.0.weight": 0}) == "mobilenet"
    assert detect_backbone({"module.backbone.layer0.0.weight": 0}) == "drn"
    assert detect_backbone({"backbone.block1.rep.0.weight": 0}) == "xception"
    assert detect_backbone({"backbone.layer1.0.conv1.weight": 0}) == "resnet"
