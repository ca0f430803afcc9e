"""run_styles env contract end-to-end."""

from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"


def test_run_styles_env_contract(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    from neuralstyletransferv1_tpu.apps.run_styles import main

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    vw = cv2.VideoWriter(str(in_dir / "clip.mp4"), cv2.VideoWriter_fourcc(*"mp4v"),
                         8, (96, 64))
    rng = np.random.default_rng(0)
    base = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    for t in range(4):
        vw.write(np.roll(base, t * 2, axis=1))
    vw.release()

    env = {
        "IN_DIR": str(in_dir), "OUT_DIR": str(out_dir),
        "WORK_ROOT": str(tmp_path / "w"),
        "MODEL_A": str(CKPT), "IO_PRESET_A": "raw_255",
        "MODEL_B": str(CKPT), "MODEL_B_TYPE": "transformer",
        "IO_PRESET_B": "raw_01",
        "USE_C": "0", "USE_D": "0",
        "BLEND_WEIGHTS": "0.6,0.4",
        "FPS": "8", "SCALE": "96",
    }
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    assert main([]) == 0
    outs = list(out_dir.glob("*.mp4"))
    assert len(outs) == 1
    assert "2m_w-0.600,0.400" in outs[0].name


def test_generate_blend_weights():
    import random

    from neuralstyletransferv1_tpu.apps.run_styles import generate_blend_weights

    rng = random.Random(1)
    assert generate_blend_weights(2, "0.7,0.3", False, rng) == [0.7, 0.3]
    w = generate_blend_weights(3, "", True, rng)
    assert abs(sum(w) - 1.0) < 1e-6
    assert generate_blend_weights(4, "", False, rng) == [0.25] * 4
    with pytest.raises(ValueError):
        generate_blend_weights(2, "0.9,0.9", False, rng)
