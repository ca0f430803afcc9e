"""C++ threaded frame loader vs PIL decode oracle."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def loader_lib():
    from neuralstyletransferv1_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native toolchain / decode libs unavailable")
    return native_loader


def test_png_decode_exact(loader_lib, tmp_path):
    from PIL import Image

    from neuralstyletransferv1_tpu.io.native_loader import NativeFrameLoader

    rng = np.random.default_rng(0)
    paths = []
    wants = []
    for i in range(6):
        img = (rng.random((40 + i, 60, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"f{i:03d}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
        wants.append(img)
    with NativeFrameLoader(paths, threads=3, capacity=4) as ld:
        got = list(ld)
    assert len(got) == 6
    for g, w in zip(got, wants):
        np.testing.assert_array_equal(g, w)


def test_jpeg_decode_close_to_pil(loader_lib, tmp_path):
    from PIL import Image

    from neuralstyletransferv1_tpu.io.native_loader import NativeFrameLoader

    rng = np.random.default_rng(1)
    img = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(img).save(p, quality=90)
    want = np.asarray(Image.open(p).convert("RGB"))
    with NativeFrameLoader([p]) as ld:
        got = next(iter(ld))
    assert got.shape == want.shape
    # PIL bundles libjpeg-turbo; the system libjpeg may differ by IDCT ±1
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_in_order_delivery_many_files(loader_lib, tmp_path):
    from PIL import Image

    from neuralstyletransferv1_tpu.io.native_loader import NativeFrameLoader

    paths = []
    for i in range(40):
        img = np.full((8, 8, 3), i, np.uint8)
        p = tmp_path / f"c{i:03d}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    with NativeFrameLoader(paths, threads=6, capacity=5) as ld:
        vals = [int(f[0, 0, 0]) for f in ld]
    assert vals == list(range(40))


def test_corrupt_file_falls_back_to_pil(loader_lib, tmp_path):
    from PIL import Image

    from neuralstyletransferv1_tpu.io.native_loader import NativeFrameLoader

    good = (np.full((10, 10, 3), 7)).astype(np.uint8)
    p1 = tmp_path / "good.png"
    Image.fromarray(good).save(p1)
    p2 = tmp_path / "bad.png"
    # valid PNG signature but truncated body → native fails, PIL... also
    # fails; use a BMP disguised as .png: native rejects, PIL reads it.
    bmp = tmp_path / "real.bmp"
    Image.fromarray(good * 2).save(bmp, format="BMP")
    p2.write_bytes(bmp.read_bytes())
    with NativeFrameLoader([p1, p2]) as ld:
        frames = list(ld)
    assert len(frames) == 2
    assert frames[1][0, 0, 0] == 14
