"""--quantize int8 path (models/transformer_net_s2d2 quant support +
engine wiring): quality gate vs the exact path, calibration, machinery."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2


@pytest.fixture(scope="module")
def baked():
    params = transformer_net.init(jax.random.key(0))
    return s2d2.bake_io_affine(s2d2.from_johnson_params(params), "imagenet_255")


def test_calibration_covers_all_sites(baked):
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 48, 3)), jnp.float32)
    scales = s2d2.calibrate_act_scales(baked, x)
    assert sorted(scales) == sorted(s2d2.QUANT_SITES)
    assert all(v > 0 for v in scales.values())


def test_int8_quality_gate(baked):
    """MAE vs the exact path <= 1e-2 on the clipped [0,1] output (the
    VERDICT round-2 gate); random net + random input is the harsh case."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 96, 3)), jnp.float32)
    scales = s2d2.calibrate_act_scales(baked, x)
    quant = s2d2.quantize_net(baked, scales)

    ref = jax.jit(lambda x: jnp.clip(s2d2.apply(baked, x), 0, 1))(x)
    got = jax.jit(lambda x: jnp.clip(s2d2.apply(baked, x, quant=quant), 0, 1))(x)
    mae = np.abs(np.asarray(ref) - np.asarray(got)).mean()
    assert mae < 1e-2, mae


def test_quantize_net_weights_roundtrip(baked):
    """Per-out-channel scales reconstruct the weights within int8 step."""
    quant = s2d2.quantize_net(baked, {s: 1.0 for s in s2d2.QUANT_SITES})
    for site in ("c2", "r3a", "d2"):
        w = np.asarray(s2d2._site_weight(baked, site), np.float32)
        qs = quant[site]
        wq = np.asarray(qs["w"], np.float32)
        # ws folds act_scale/127 (=1/127 here); unfold for the pure w scale
        ws = np.asarray(qs["ws"], np.float32) * 127.0
        err = np.abs(wq * ws - w)
        step = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
        assert (err <= step * 0.5 + 1e-7).all()


def test_engine_quantize_flag(tmp_path):
    """--quantize int8 through the engine produces output close to the
    exact run (image mode, batched path)."""
    from PIL import Image

    from neuralstyletransferv1_tpu.engine.pipeline import main

    ckpt = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"
    if not ckpt.exists():
        pytest.skip("synthetic checkpoint missing")
    src = tmp_path / "in"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray((rng.random((48, 64, 3)) * 255).astype(np.uint8)).save(
            src / f"im_{i:02d}.png")

    def run(out, extra):
        rc = main([
            "--input_dir", str(src), "--pattern", "*.png",
            "--model", str(ckpt), "--io_preset", "raw_255",
            "--frame_batch", "3", "--image_ext", "png",
            "--output_dir", str(out), "--work_dir", str(tmp_path / "_w" / out.name),
        ] + extra)
        assert rc == 0

    outa, outb = tmp_path / "a", tmp_path / "b"
    run(outa, [])
    run(outb, ["--quantize", "int8"])
    fa = [np.asarray(Image.open(p), np.float32)
          for p in sorted(outa.glob("*.png"))]
    fb = [np.asarray(Image.open(p), np.float32)
          for p in sorted(outb.glob("*.png"))]
    assert len(fa) == len(fb) == 3
    for x, y in zip(fa, fb):
        assert np.abs(x - y).mean() < 2.0  # u8 scale: ~0.8% of range


def test_res_i8_pallas_parity(baked):
    """fused_sites=("res_i8",) — the Pallas int8 res-chain kernels
    (models/s2d2_sites_i8.py, interpret mode on CPU) match the XLA int8
    path: same quant scales, stats taken over the same bf16-rounded conv
    outputs, so drift is bf16/summation-order only."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32))
    quant = s2d2.quantize_net(baked, scales)
    assert s2d2_sites_i8.res_supported(8, 64)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant)
        y_pal = s2d2.apply(bp, x, quant=quant, fused_sites=("res_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


def test_d3_i8_pallas_parity(baked):
    """fused_sites=("d3_i8",) — the Pallas int8 deconv3 rows site (zero
    column pads + border strip fixups, like the zero-SAME XLA branch)
    matches the XLA int8 d3 everywhere the strips don't overwrite, and the
    bf16 strips keep the borders exact."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32),
                                       sites=s2d2.QUANT_SITES_PALLAS)
    quant = s2d2.quantize_net(baked, {"d3": scales["d3"]})
    assert s2d2_sites_i8.d3_supported(16, 128)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant)
        y_pal = s2d2.apply(bp, x, quant=quant, fused_sites=("d3_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


def test_dec_i8_pallas_parity(baked):
    """fused_sites=("dec_i8",) — the Pallas int8 deconv1+deconv2 sites
    (edge halos in-kernel, in4 affine in the d2 prologue) match the XLA
    int8 path to bf16 rounding."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32))
    quant = s2d2.quantize_net(baked, scales)
    assert s2d2_sites_i8.dec_supported(8, 64)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant)
        y_pal = s2d2.apply(bp, x, quant=quant, fused_sites=("dec_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())
