"""Presets DB + generate_* family: schema, population, sample rendering."""

from pathlib import Path

import numpy as np
import pytest

CKPT = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"


@pytest.fixture(scope="module")
def populated_db(tmp_path_factory):
    from neuralstyletransferv1_tpu.apps.generate_multimodel_presets import main

    db = tmp_path_factory.mktemp("db") / "presets.db"
    assert main(["--db", str(db)]) == 0
    return db


def test_populate_and_load(populated_db):
    from neuralstyletransferv1_tpu.presets import load_presets

    presets = load_presets(populated_db)
    # 10 categories × 25-30 presets (reference: generate_multimodel_presets.py)
    assert len(presets) >= 200
    cats = {p["category"] for p in presets}
    assert {"Blob Morph", "Tentacle Morph", "Wave Morph", "Pulse Morph",
            "Voronoi Static", "Radial Patterns", "Spiral Patterns",
            "Grid Patterns", "Resolution Mix", "Model Mix"} <= cats
    blob = next(p for p in presets if p["category"] == "Blob Morph")
    assert blob["params"]["model_type"] == "magenta"
    assert blob["params"]["region_mode"] == "voronoi"
    assert blob["params"]["region_morph"].endswith("blob")
    mix = next(p for p in presets if p["category"] == "Model Mix")
    assert mix["params"]["blend_models_weights"] == "0.5,0.5"


def test_populate_is_seeded(populated_db, tmp_path):
    from neuralstyletransferv1_tpu.apps.generate_multimodel_presets import main
    from neuralstyletransferv1_tpu.presets import load_presets

    db2 = tmp_path / "presets2.db"
    assert main(["--db", str(db2)]) == 0
    a = [(p["name"], sorted(p["params"].items())) for p in load_presets(populated_db)]
    b = [(p["name"], sorted(p["params"].items())) for p in load_presets(db2)]
    assert a == b


def test_preset_to_argv():
    from neuralstyletransferv1_tpu.presets import preset_to_argv

    argv = preset_to_argv({"model": "x.pth", "blend_models_lab": True,
                           "region_count": 3, "flow_ema": False})
    assert argv == ["--model", "x.pth", "--blend_models_lab", "--region_count", "3"]


@pytest.fixture()
def small_db_with_renderable_presets(tmp_path):
    """A tiny DB whose presets use the synthetic transformer checkpoint, so
    rendering works without the stripped reference weights."""
    from neuralstyletransferv1_tpu.presets import (
        connect, create_schema, insert_preset, upsert_category,
    )

    db = tmp_path / "small.db"
    conn = connect(db)
    create_schema(conn)
    upsert_category(conn, 1, "Transformer", "test", 1)
    upsert_category(conn, 2, "Regions", "test", 2)
    upsert_category(conn, 3, "Morphs", "test", 3)
    insert_preset(conn, name="Solo Candy", category_id=1,
                  model_type="transformer", model_path=str(CKPT),
                  io_preset="raw_255", blend=0.9)
    insert_preset(conn, name="Voronoi Duo", category_id=2,
                  model_type="transformer", model_path=str(CKPT),
                  io_preset="raw_255", model_b_type="transformer",
                  model_b_path=str(CKPT), io_preset_b="raw_01",
                  region_mode="voronoi", region_count=2, region_feather=10)
    insert_preset(conn, name="Blob Motion", category_id=3,
                  model_type="transformer", model_path=str(CKPT),
                  io_preset="raw_255", region_mode="voronoi", region_count=2,
                  region_feather=10, region_morph="1.0,0.2,2.0,blob")
    conn.commit()
    conn.close()
    return db


def test_generate_preset_samples_renders(small_db_with_renderable_presets, tmp_path):
    from PIL import Image

    from neuralstyletransferv1_tpu.apps.generate_preset_samples import main
    from neuralstyletransferv1_tpu.presets import load_presets

    rng = np.random.default_rng(0)
    img = tmp_path / "in.png"
    Image.fromarray((rng.random((64, 96, 3)) * 255).astype(np.uint8)).save(img)
    out = tmp_path / "samples"
    rc = main([
        "--db", str(small_db_with_renderable_presets),
        "--input_image", str(img), "--output_dir", str(out),
        "--work_dir", str(tmp_path / "w"), "--scale", "96",
    ])
    assert rc == 0
    rendered = sorted(p.name for p in out.glob("*.jpg"))
    assert len(rendered) == 3, rendered
    # sample paths recorded back into the DB
    presets = load_presets(small_db_with_renderable_presets)
    assert all("sample_image" in p for p in presets)


@pytest.mark.slow
def test_generate_video_and_morph_samples(small_db_with_renderable_presets, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from neuralstyletransferv1_tpu.apps.generate_morph_samples import main as gif_main
    from neuralstyletransferv1_tpu.apps.generate_video_samples import main as vid_main

    rng = np.random.default_rng(1)
    img = tmp_path / "in.png"
    Image.fromarray((rng.random((64, 96, 3)) * 255).astype(np.uint8)).save(img)

    out_v = tmp_path / "vid"
    rc = vid_main([
        "--db", str(small_db_with_renderable_presets),
        "--input_image", str(img), "--output_dir", str(out_v),
        "--work_dir", str(tmp_path / "wv"), "--scale", "64",
        "--frames", "6", "--fps", "6",
    ])
    assert rc == 0
    assert len(list(out_v.glob("*.mp4"))) == 2  # the two region presets

    out_g = tmp_path / "gif"
    rc = gif_main([
        "--db", str(small_db_with_renderable_presets),
        "--input_image", str(img), "--output_dir", str(out_g),
        "--work_dir", str(tmp_path / "wg"), "--scale", "64",
        "--frames", "6", "--fps", "6",
    ])
    assert rc == 0
    gifs = list(out_g.glob("*.gif"))
    assert len(gifs) == 1  # only the morph preset
    assert (out_g / "morph_samples.json").exists()


def test_generate_style_selfstyle(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from neuralstyletransferv1_tpu.apps.generate_style_selfstyle import main

    rng = np.random.default_rng(2)
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    cv2.imwrite(str(src_dir / "a.png"), (rng.random((80, 100, 3)) * 255).astype(np.uint8))
    db = tmp_path / "ss.db"
    rc = main([
        "--input_dir", str(src_dir), "--output_dir", str(tmp_path / "out"),
        "--db", str(db), "--tile", "48", "--overlap", "8", "--scale", "100",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "a_selfstyle.jpg").exists()
    assert (tmp_path / "out" / "a_comparison.jpg").exists()
    from neuralstyletransferv1_tpu.presets import load_presets

    assert len(load_presets(db)) == 1


def test_generate_mask_samples(ref_mobilenet_ckpt, tmp_path):
    """End-to-end: random-weight mobilenet DeepLab -> mask -> styled sheet."""
    cv2 = pytest.importorskip("cv2")
    import json

    from neuralstyletransferv1_tpu.apps.generate_mask_samples import main

    rng = np.random.default_rng(3)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cv2.imwrite(str(in_dir / "bike-dog-person.png"),
                (rng.random((96, 128, 3)) * 255).astype(np.uint8))
    samples = [{"input_prefix": "bike-dog-person", "target_ids": "15",
                "invert": False, "name": "person_styled",
                "preset_name": "Mask: Style Person", "tags": ["mask"]}]
    sj = tmp_path / "samples.json"
    sj.write_text(json.dumps(samples))
    rc = main([
        "--input_dir", str(in_dir), "--output_dir", str(tmp_path / "out"),
        "--work_dir", str(tmp_path / "w"),
        "--deeplab_weights", str(ref_mobilenet_ckpt),
        "--backbone", "mobilenet",
        "--model", str(CKPT), "--io_preset", "raw_255",
        "--samples_json", str(sj), "--scale", "128",
    ])
    assert rc == 0
    assert (tmp_path / "out" / "person_styled_comparison.jpg").exists()
    assert (tmp_path / "out" / "person_styled_preset.json").exists()
    assert (tmp_path / "out" / "mask_samples_metadata.json").exists()


def test_generate_magenta_self_style(tmp_path):
    """Seeded-random self-style sample set (reference:
    scripts/generate_magenta_self_style.py:18-103): deterministic pick,
    selfstyle_<stem>.jpg naming, skip-existing resume."""
    import numpy as np
    from PIL import Image

    from neuralstyletransferv1_tpu.apps.generate_magenta_self_style import main

    rng = np.random.default_rng(0)
    in_dir = tmp_path / "pool"
    in_dir.mkdir()
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (72, 88, 3), np.uint8)).save(
            in_dir / f"img{i}.jpg")
    out_dir = tmp_path / "out"
    args = ["--input_dir", str(in_dir), "--output_dir", str(out_dir),
            "--count", "2", "--seed", "42", "--scale", "88",
            "--magenta_tile", "64", "--magenta_overlap", "16"]
    assert main(list(args)) == 0
    outs = sorted(p.name for p in out_dir.iterdir())
    assert len(outs) == 2 and all(n.startswith("selfstyle_img") for n in outs)
    # deterministic seed -> same picks; skip-existing leaves mtimes alone
    mtimes = {p.name: p.stat().st_mtime_ns for p in out_dir.iterdir()}
    assert main(list(args)) == 0
    assert {p.name: p.stat().st_mtime_ns
            for p in out_dir.iterdir()} == mtimes
