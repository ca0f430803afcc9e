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


@pytest.mark.slow
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


def test_head_i8_pallas_parity(baked):
    """fused_sites=("head_i8",) — the pair-packed Pallas int8 c2+c3 sites
    (phase-permutation-dot halos, even/odd stride-2 pair dots) match the
    XLA int8 path."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32))
    quant = s2d2.quantize_net(baked, {k: scales[k] for k in ("c2", "c3")})
    assert s2d2_sites_i8.head_supported(16, 128)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant)
        y_pal = s2d2.apply(bp, x, quant=quant, fused_sites=("head_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


def test_res_dec_i8_carry_parity(baked):
    """The full engine config — res chain + dec sites with every residual
    add folded into the next kernel's prologue (res_site_skip, incl. the
    block-5 carry into d1) — matches the XLA int8 path."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32))
    scales = {k: v for k, v in scales.items()
              if k.startswith("r") or k in ("d1", "d2")}
    quant = s2d2.quantize_net(baked, scales)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant)
        y_pal = s2d2.apply(bp, x, quant=quant,
                           fused_sites=("res_i8", "dec_i8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.parametrize("norm", ["bn", "in"])
def test_t7_int8_res_chain_parity(norm):
    """The .t7 fast-path int8 res chain: the Pallas fused sites (zero
    halos, residual folds) match the XLA int8 reference branch, and both
    stay within the quality gate of the unquantized fast form — for the
    BN-folded (rn=None) AND instance-norm variants."""
    from tests.test_t7_fast import _johnson_layers, _in
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    layers = _johnson_layers()
    if norm == "in":
        layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
                  for l in layers]
        for l in layers:
            if l["op"] == "concat_table":
                l["branches"][0][:] = [
                    (_in(b["weight"].shape[0]) if b["op"] == "batchnorm"
                     else b) for b in l["branches"][0]]
    fp = t7_fast.try_fast_johnson(layers)
    assert fp is not None

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 50, (2, 32, 64, 3)).astype(np.float32))
    scales = t7_fast.calibrate_t7_scales(fp, x)
    assert sorted(scales) == sorted([f"r{i}{ab}" for i in range(3)
                                     for ab in "ab"]
                                    + ["c2", "d1", "d2", "d3"])
    quant = t7_fast.quantize_t7(fp, scales)
    assert s2d2_sites_i8.res_supported(8, 16)

    # Both int8 paths at bf16, like the engine runs them: the Pallas chain
    # carries bf16 between kernels, so an f32 XLA reference diverges at
    # int8 code boundaries and this random net amplifies ~1.4x per conv.
    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    y_ref = t7_fast.t7_fast_apply(fp, x)
    y_xla = t7_fast.t7_fast_apply(fpb, xb, quant=quant)
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                      fused_sites=("res_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False

    # Pallas vs XLA int8: same math to bf16 rounding (measured 2.3e-3 MAE
    # on the ~tanh*150 output scale = 1.5e-5 relative).
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 0.05, (d.mean(), d.max())
    # int8 vs the exact f32 fast form: this synthetic net (no norm taming
    # the res activations after BN folding) is the harsh case — gate at 5%
    # of the mean output magnitude (measured 2.5%).
    q = np.abs(np.asarray(y_ref, np.float32) - np.asarray(y_xla, np.float32))
    ref_mag = np.abs(np.asarray(y_ref, np.float32)).mean()
    assert q.mean() < 0.05 * ref_mag, (q.mean(), ref_mag)


@pytest.mark.parametrize("shape", [(2, 32, 64, 3), (1, 32, 160, 3),
                                   (1, 160, 64, 3)])
def test_t7_s8_carry_chain_bit_exact(shape):
    """BN-folded .t7 res chain with s8 carries (res_site_s8o +
    res_site_s8i_yadd): with every norm folded, the inter-conv quantize
    scale is static, so the a-site emits the b-site's s8 input directly
    and the b-site folds the residual add. Both paths round through bf16
    at every materialization point, so the s8-carry chain must be
    BIT-IDENTICAL to the XLA int8 reference branch. The 160-wide case
    exercises a non-trivial s8 carry pad (W0=40 -> WPS=64: 22 zeroed
    columns between the right halo and the tile boundary); the 160-tall
    case (H4=40 -> TS=20, NS=2) exercises the cross-strip s8 halo rows
    (the consumer kernel's hmap/tmap BlockSpecs on the carry tensor)."""
    from tests.test_t7_fast import _johnson_layers
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    fp = t7_fast.try_fast_johnson(_johnson_layers())
    assert fp is not None
    assert all(rp["rn1"] is None and rp["rn2"] is None for rp in fp["res"])

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(0, 50, shape).astype(np.float32))
    quant = t7_fast.quantize_t7(fp, t7_fast.calibrate_t7_scales(fp, x))

    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    y_xla = t7_fast.t7_fast_apply(fpb, xb, quant=quant)
    s2d2_sites_i8._INTERPRET = True
    try:
        y_s8 = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                     fused_sites=("res_s8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert np.array_equal(np.asarray(y_xla, np.float32),
                          np.asarray(y_s8, np.float32))


@pytest.mark.parametrize("deconv_k,shape", [(3, (2, 32, 64, 3)),
                                            (4, (1, 160, 64, 3)),
                                            (3, (1, 32, 160, 3))])
def test_t7_dec_s8_carry_bit_exact(deconv_k, shape):
    """dec_s8: the s8 carry extended through deconv1/deconv2 of a
    BN-folded .t7 graph (io/t7_fast._t7_dec_i8_s8). The last res b-site
    emits deconv1's s8 input (site_s8 YADD+S8OUT), deconv1 emits
    deconv2's s8 input (quantize BEFORE the d2s shuffle — commutes with
    the permutation), and deconv2 emits the bf16 raw. Every path rounds
    through bf16 at each XLA-reference materialization point, so the
    output must be BIT-IDENTICAL to the XLA int8 branch
    (_t7_res_quant_xla + _t7_dec_quant_xla). k=3 exercises the 2x2/pt=0
    scatter form, k=4 the 3x3/pt=1 form; the 160-tall case crosses strip
    boundaries on both carry tensors (NS=2 at the res grid, NS=4 at the
    doubled deconv2 grid)."""
    from tests.test_t7_fast import _johnson_layers
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    fp = t7_fast.try_fast_johnson(_johnson_layers(deconv_k=deconv_k))
    assert fp is not None
    assert fp["n_d1"] is None and fp["n_d2"] is None

    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.normal(0, 50, shape).astype(np.float32))
    quant = t7_fast.quantize_t7(fp, t7_fast.calibrate_t7_scales(fp, x))
    assert "d1" in quant and "d2" in quant

    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    y_xla = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                  fused_sites=("dec_xla_i8",))
    s2d2_sites_i8._INTERPRET = True
    try:
        y_s8 = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                     fused_sites=("res_s8", "dec_s8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert np.array_equal(np.asarray(y_xla, np.float32),
                          np.asarray(y_s8, np.float32))


@pytest.mark.parametrize("deconv_k,shape", [(3, (2, 32, 64, 3)),
                                            (4, (1, 160, 64, 3))])
def test_t7_tail_s8_matches_xla(deconv_k, shape):
    """tail_s8 on a BN-folded .t7 graph: deconv2 emits the 9x9 output
    conv's s8 input directly ("zero2" zero-SAME layout — t7 semantics,
    so no border fixup exists) and the fused d3_s8_site collapses the
    tap-packed 1x5 conv + dy-sum in VMEM. Gated against the pure-XLA
    int8 reference (_t7_res/_dec/_tail_quant_xla, which round through
    bf16 at every kernel materialization point) — integer convs are
    exact, so only isolated f32 dy-sum association flips survive the
    final bf16 round."""
    from tests.test_t7_fast import _johnson_layers
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    fp = t7_fast.try_fast_johnson(_johnson_layers(deconv_k=deconv_k))
    assert fp is not None

    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(0, 50, shape).astype(np.float32))
    quant = t7_fast.quantize_t7(fp, t7_fast.calibrate_t7_scales(fp, x))
    assert "d3" in quant

    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    y_xla = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                  fused_sites=("dec_xla_i8",
                                               "tail_xla_i8"))
    s2d2_sites_i8._INTERPRET = True
    try:
        y_s8 = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                     fused_sites=("res_s8", "dec_s8",
                                                  "tail_s8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_s8, np.float32))
    assert d.mean() < 1e-4, (d.mean(), d.max())
    assert d.max() < 2e-2, d.max()


@pytest.mark.slow
def test_t7_s8_carry_in_variant_falls_back():
    """res_s8 on an instance-norm .t7 graph (deferred stats => dynamic
    quantize scales) must NOT take the static-scale chain: with
    ("res_i8", "res_s8") requested it matches the res_i8 chain exactly."""
    from tests.test_t7_fast import _johnson_layers, _in
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    layers = _johnson_layers()
    layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
              for l in layers]
    for l in layers:
        if l["op"] == "concat_table":
            l["branches"][0][:] = [
                (_in(b["weight"].shape[0]) if b["op"] == "batchnorm"
                 else b) for b in l["branches"][0]]
    fp = t7_fast.try_fast_johnson(layers)
    assert fp is not None
    assert any(rp["rn1"] is not None for rp in fp["res"])

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.normal(0, 50, (1, 32, 64, 3)).astype(np.float32))
    quant = t7_fast.quantize_t7(fp, t7_fast.calibrate_t7_scales(fp, x))
    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    s2d2_sites_i8._INTERPRET = True
    try:
        y_i8 = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                     fused_sites=("res_i8",))
        y_both = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                       fused_sites=("res_i8", "res_s8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert np.array_equal(np.asarray(y_i8, np.float32),
                          np.asarray(y_both, np.float32))


def test_engine_t7_quantize_flag():
    """--quantize int8 on a .t7 slot: the stylizer's lazy-calibration t7
    branch (engine/stylizer.py) produces output close to the exact bf16
    fast path (CPU = the XLA int8 reference branch)."""
    from tests.test_t7_fast import _johnson_layers
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.StyleModel("t7", {"layers": _johnson_layers()}, "caffe_bgr",
                          "synthetic_t7", "torch7")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 32, 64, 3)), jnp.float32)

    f_ref = st.jit_stylizer(model, dtype=jnp.bfloat16)
    f_i8 = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8")
    y_ref = np.asarray(f_ref(x), np.float32)
    y_i8 = np.asarray(f_i8(x), np.float32)
    assert y_i8.shape == y_ref.shape
    # [0,1] output space; synthetic random net is the harsh case.
    d = np.abs(y_ref - y_i8)
    assert d.mean() < 3e-2, (d.mean(), d.max())


def test_res_site_sw_padding_exact():
    """The sw (content-width) mechanism: a zero-halo site on a width-padded
    tensor with sw=<real width> matches the XLA int8 conv on the unpadded
    tensor EXACTLY — padding columns are zeroed at quantize (so the conv at
    column sw-1 sees true zero-pad semantics) and excluded from the stats."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8 as si8
    from neuralstyletransferv1_tpu.ops.conv import conv2d_i8

    rng = np.random.default_rng(21)
    B, H, SW, C = 2, 16, 29, 128   # 29 -> padded 32, like 500 -> 504 @1080p
    y = jnp.asarray(rng.normal(0, 1, (B, H, SW, C)), jnp.bfloat16)
    w = rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32)
    ws = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = jnp.asarray(np.clip(np.round(w / ws), -127, 127).astype(np.int8))
    bias = jnp.asarray(rng.normal(0, 0.1, C), jnp.float32)
    qin = jnp.float32(127.0 / 4.0)
    wsf = jnp.asarray(ws * (4.0 / 127.0), jnp.float32)

    xq = jnp.clip(jnp.round(y.astype(jnp.float32) * qin),
                  -127.0, 127.0).astype(jnp.int8)
    ra_ref = (conv2d_i8(xq, wq, padding=1).astype(jnp.float32) * wsf
              + bias).astype(jnp.bfloat16)

    yp = jnp.pad(y, ((0, 0), (0, 0), (0, 32 - SW), (0, 0)))
    a = jnp.full((B, C), float(qin), jnp.float32)
    c = jnp.zeros((B, C), jnp.float32)
    si8._INTERPRET = True
    try:
        ra, sout = si8.res_site(yp, a, c, wq.reshape(9, C, C), wsf, bias,
                                -127.0, halo="zero", sw=SW)
    finally:
        si8._INTERPRET = False
    d = np.abs(np.asarray(ra[:, :, :SW], np.float32)
               - np.asarray(ra_ref, np.float32))
    assert d.max() == 0.0, (d.mean(), d.max())
    # stats cover ONLY the content columns
    rf = np.asarray(ra_ref, np.float32)
    np.testing.assert_allclose(np.asarray(sout[:, 0]), rf.sum(axis=(1, 2)),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sout[:, 1]),
                               (rf * rf).sum(axis=(1, 2)), rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("wshape", [48, 36])  # res width 32 (%8) / 29 (sw)
def test_nst_int8_res_chain_parity(wshape):
    """The NST fast-path int8 res chain: Pallas fused sites (zero halos,
    deferred-IN stats in the epilogue, residual folds) track the XLA int8
    reference. wshape=36 exercises the non-%8 res width (29 on the pad-40
    grid, like 500 at 1080p): the chain pads to %8 and the kernels mask
    the padding columns out of quantize + stats (sw).

    Tolerances are relative: single sites are bit-exact (see
    test_res_site_sw_padding_exact), but the two paths' IN stats differ in
    summation order (~2e-5 on inv), which flips int8 codes at quantize
    boundaries and this random unnormalized-gain net amplifies ~10x per
    block (measured block-wise: 2e-5 -> 3e-2 over 5 blocks)."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8
    from neuralstyletransferv1_tpu.models import transformer_net_nst
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    p = nstf.from_nst_params(transformer_net_nst.init(jax.random.key(2)))
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((2, 24, wshape, 3)), jnp.float32)
    scales = nstf.calibrate_act_scales(p, x)
    assert sorted(scales) == sorted([f"r{i}{ab}" for i in range(1, 6)
                                     for ab in "ab"] + ["c2", "d1", "d2"])
    quant = nstf.quantize_net(p, scales)

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)
    y_ref = nstf.apply(p, x)
    y_xla = nstf.apply(pb, xb, quant=quant)
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = nstf.apply(pb, xb, quant=quant, fused_sites=("res_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False

    assert y_pal.shape == y_xla.shape == y_ref.shape
    ref_mag = np.abs(np.asarray(y_ref, np.float32)).mean()
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 0.05 * ref_mag, (d.mean(), ref_mag)
    # both int8 paths within quality range of the exact output
    for y_i8 in (y_xla, y_pal):
        q = np.abs(np.asarray(y_ref, np.float32)
                   - np.asarray(y_i8, np.float32))
        assert q.mean() < 0.10 * ref_mag, (q.mean(), ref_mag)


def test_engine_nst_quantize_flag():
    """--quantize int8 on an NST slot through the stylizer's generic
    lazy-calibration branch."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.make_random_model("nst", seed=1)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32)
    f_ref = st.jit_stylizer(model, dtype=jnp.bfloat16)
    f_i8 = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8")
    y_ref = np.asarray(f_ref(x), np.float32)
    y_i8 = np.asarray(f_i8(x), np.float32)
    d = np.abs(y_ref - y_i8)
    assert d.mean() < 3e-2, (d.mean(), d.max())


@pytest.mark.slow
@pytest.mark.parametrize("frn", [False, True])
def test_reconet_int8_res_chain_parity(frn):
    """The ReCoNet fast-path int8 res chain: Pallas fused sites (reflect
    halos, deferred IN/FRN stats, TLU folded into the b-site quantize as a
    per-channel floor) track the XLA int8 reference; combine + post-skip
    activation stay XLA (ReCoNet activates after the add)."""
    from neuralstyletransferv1_tpu.models import reconet
    from neuralstyletransferv1_tpu.models import reconet_fast as recf
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    p = recf.from_reconet_params(reconet.init(jax.random.key(3), frn=frn))
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.random((2, 32, 64, 3)) * 2 - 1, jnp.float32)
    scales = recf.calibrate_act_scales(p, x)
    assert sorted(scales) == sorted([f"r{i}{ab}" for i in range(4)
                                     for ab in "ab"] + ["d1", "d2"])
    quant = recf.quantize_net(p, scales)

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)
    y_ref = recf.apply(p, x)
    y_xla = recf.apply(pb, xb, quant=quant)
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = recf.apply(pb, xb, quant=quant, fused_sites=("res_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False

    assert y_pal.shape == y_xla.shape == y_ref.shape
    # tanh output in [-1,1]; stats summation-order code flips bound the
    # pal-vs-xla gap (see test_nst_int8_res_chain_parity's rationale)
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 0.02, (d.mean(), d.max())
    for y_i8 in (y_xla, y_pal):
        q = np.abs(np.asarray(y_ref, np.float32)
                   - np.asarray(y_i8, np.float32))
        assert q.mean() < 0.05, (q.mean(), q.max())


def test_engine_reconet_quantize_flag():
    """--quantize int8 on a ReCoNet slot through the stylizer's generic
    lazy-calibration branch."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.make_random_model("reconet", seed=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 32, 48, 3)), jnp.float32)
    f_ref = st.jit_stylizer(model, dtype=jnp.bfloat16)
    f_i8 = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8")
    y_ref = np.asarray(f_ref(x), np.float32)
    y_i8 = np.asarray(f_i8(x), np.float32)
    d = np.abs(y_ref - y_i8)
    assert d.mean() < 3e-2, (d.mean(), d.max())


def test_engine_quantize_mesh_equivalence():
    """--quantize int8 + --mesh_devices: the lazy-calibration wrapper
    composes with the data-parallel sharded jit — sharded output equals
    single-device output."""
    from neuralstyletransferv1_tpu.engine import stylizer as st
    from neuralstyletransferv1_tpu.parallel.mesh import make_mesh

    model = st.make_random_model("johnson", seed=3)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((4, 32, 48, 3)), jnp.float32)
    f_one = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8")
    f_mesh = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8",
                             mesh=make_mesh(2))
    y_one = np.asarray(f_one(x), np.float32)
    y_mesh = np.asarray(f_mesh(x), np.float32)
    np.testing.assert_allclose(y_mesh, y_one, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("frn", [False, True])
def test_reconet_skip_fold_parity(frn, monkeypatch):
    """RECO_SKIP=1 — combine + post-skip activation folded into the next
    a-site's prologue (res_site_skip act=) matches the default XLA-combine
    Pallas chain bitwise (max() is exact in bf16)."""
    from neuralstyletransferv1_tpu.models import reconet
    from neuralstyletransferv1_tpu.models import reconet_fast as recf
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    p = recf.from_reconet_params(reconet.init(jax.random.key(4), frn=frn))
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.random((2, 32, 64, 3)) * 2 - 1, jnp.float32)
    scales = recf.calibrate_act_scales(p, x)
    quant = recf.quantize_net(p, scales)
    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)

    s2d2_sites_i8._INTERPRET = True
    try:
        monkeypatch.delenv("RECO_SKIP", raising=False)
        y_def = recf.apply(pb, xb, quant=quant, fused_sites=("res_i8",))
        monkeypatch.setenv("RECO_SKIP", "1")
        y_skip = recf.apply(pb, xb, quant=quant, fused_sites=("res_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    d = np.abs(np.asarray(y_def, np.float32) - np.asarray(y_skip, np.float32))
    assert d.mean() < 2e-3, (d.mean(), d.max())


def test_engine_quantize_odd_shape():
    """--quantize int8 + a non-%4 resolution: calibration pads the probe
    frame and make_fn pads per-batch (reflect pad-and-crop), so odd shapes
    ride the quantized fast form instead of falling back."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.make_random_model("johnson", seed=5)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((2, 34, 50, 3)), jnp.float32)
    f_ref = st.jit_stylizer(model, dtype=jnp.bfloat16)
    f_i8 = st.jit_stylizer(model, dtype=jnp.bfloat16, quantize="int8")
    y_ref = np.asarray(f_ref(x), np.float32)
    y_i8 = np.asarray(f_i8(x), np.float32)
    assert y_i8.shape == y_ref.shape == (2, 34, 50, 3)
    d = np.abs(y_ref - y_i8)
    assert d.mean() < 3e-2, (d.mean(), d.max())

    # larger odd resolution: the quantize path pads to %8/%32 (h4 even,
    # w4 % 8) so the fused-site gates hold on TPU instead of silently
    # falling back to bf16; output crops back exactly
    x2 = jnp.asarray(rng.random((1, 100, 132, 3)), jnp.float32)
    y2r = np.asarray(f_ref(x2), np.float32)
    y2q = np.asarray(f_i8(x2), np.float32)
    assert y2q.shape == y2r.shape == (1, 100, 132, 3)
    d2 = np.abs(y2r - y2q)
    assert d2.mean() < 3e-2, (d2.mean(), d2.max())


@pytest.mark.parametrize("deconv_k,norm", [(3, "bn"), (4, "bn"), (3, "in")])
def test_t7_dec_i8_parity(deconv_k, norm):
    """The .t7 fused int8 deconv1/2 sites: the f2-scattered transposed
    convs run as KHxKW zero-halo sites (2x2/pt=0 for k3 — the scatter's
    (0,1) pads land on the zero halo col / zeroed tail strip — 3x3/pt=1
    for k4), deferred norms from the kernel stat epilogues. Matches the
    XLA int8 reference branch (fused_sites=("dec_xla_i8",))."""
    from tests.test_t7_fast import _johnson_layers, _in
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    layers = _johnson_layers(deconv_k=deconv_k)
    if norm == "in":
        layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
                  for l in layers]
        for l in layers:
            if l["op"] == "concat_table":
                l["branches"][0][:] = [
                    (_in(b["weight"].shape[0]) if b["op"] == "batchnorm"
                     else b) for b in l["branches"][0]]
    fp = t7_fast.try_fast_johnson(layers)
    assert fp is not None
    assert t7_fast._dec_kform(fp["d1_pad"]) is not None

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(0, 50, (2, 32, 64, 3)).astype(np.float32))
    scales = t7_fast.calibrate_t7_scales(fp, x)
    quant = t7_fast.quantize_t7(fp, scales)
    assert "d1" in quant and "d2" in quant

    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)
    y_xla = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                  fused_sites=("dec_xla_i8",))
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                      fused_sites=("dec_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    # same int8 codes either side of the shared XLA-i8 res chain; drift is
    # bf16/summation-order through two sites only
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    ref_mag = np.abs(np.asarray(y_xla, np.float32)).mean()
    assert d.mean() < 5e-3 * max(ref_mag, 1.0), (d.mean(), ref_mag)


@pytest.mark.parametrize("wshape", [48, 36])  # dec width 32 / 29 (sw)
def test_nst_dec_i8_parity(wshape):
    """The NST fused int8 deconv1/2 sites (2x2 zero-halo block kernels,
    deferred INs from the kernel stat epilogues, sw through the d2s width
    doubling) match the XLA int8 dec reference."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8
    from neuralstyletransferv1_tpu.models import transformer_net_nst
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    p = nstf.from_nst_params(transformer_net_nst.init(jax.random.key(6)))
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.random((2, 24, wshape, 3)), jnp.float32)
    scales = nstf.calibrate_act_scales(p, x)
    quant = nstf.quantize_net(p, scales)
    assert "d1" in quant and "d2" in quant

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)
    y_xla = nstf.apply(pb, xb, quant=quant, fused_sites=("dec_xla_i8",))
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = nstf.apply(pb, xb, quant=quant, fused_sites=("dec_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    # both share the XLA-i8 res chain; drift is two sites of
    # bf16/summation-order
    ref_mag = np.abs(np.asarray(y_xla, np.float32)).mean()
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 0.01 * max(ref_mag, 0.1), (d.mean(), ref_mag)


@pytest.mark.parametrize("frn", [False, True])
def test_reconet_dec_i8_parity(frn):
    """The ReCoNet fused int8 deconv1/2 sites (edge-block halos ==
    res_site halo="edge", deferred IN/FRN stats from the epilogues, TLU in
    the d2 quantize floor) match the XLA int8 dec reference."""
    from neuralstyletransferv1_tpu.models import reconet
    from neuralstyletransferv1_tpu.models import reconet_fast as recf
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    p = recf.from_reconet_params(reconet.init(jax.random.key(8), frn=frn))
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.random((2, 32, 64, 3)) * 2 - 1, jnp.float32)
    scales = recf.calibrate_act_scales(p, x)
    quant = recf.quantize_net(p, scales)
    assert "d1" in quant and "d2" in quant

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)
    y_xla = recf.apply(pb, xb, quant=quant, fused_sites=("dec_xla_i8",))
    s2d2_sites_i8._INTERPRET = True
    try:
        y_pal = recf.apply(pb, xb, quant=quant, fused_sites=("dec_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 5e-3, (d.mean(), d.max())


@pytest.mark.parametrize("norm", ["bn", "in"])
def test_t7_c2_i8_parity(norm):
    """The .t7 c2 site: the stride-2 scatter (2x2 block conv, (1,0) zero
    pads) as a KH=KW=2/PT=PL=1 zero-halo int8 site matches an XLA int8
    c2 built the same way."""
    from tests.test_t7_fast import _johnson_layers, _in
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8
    from neuralstyletransferv1_tpu.ops.conv import conv2d_i8

    layers = _johnson_layers()
    if norm == "in":
        layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
                  for l in layers]
        for l in layers:
            if l["op"] == "concat_table":
                l["branches"][0][:] = [
                    (_in(b["weight"].shape[0]) if b["op"] == "batchnorm"
                     else b) for b in l["branches"][0]]
    fp = t7_fast.try_fast_johnson(layers)
    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.normal(0, 50, (2, 32, 64, 3)).astype(np.float32))
    scales = t7_fast.calibrate_t7_scales(fp, x)
    assert "c2" in scales
    quant = t7_fast.quantize_t7(fp, scales)

    fpb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    xb = x.astype(jnp.bfloat16)

    # reproduce the c2 input, then compare the site against XLA int8
    vals = {}
    t7_fast.t7_fast_apply(fpb, xb, tap=lambda s, t: vals.__setitem__(s, t))
    y1 = vals["c2"]
    q2 = quant["c2"]
    xq = jnp.clip(jnp.round(y1.astype(jnp.float32) * q2["qin"]),
                  -127.0, 127.0).astype(jnp.int8)
    r_ref = (conv2d_i8(xq, q2["w"], padding=((1, 0), (1, 0)))
             .astype(jnp.float32) * q2["ws"]
             + fpb["c2_b"].astype(jnp.float32)).astype(jnp.bfloat16)
    B, _, _, Cin = y1.shape
    aq = jnp.full((B, Cin), float(q2["qin"]), jnp.float32)
    cq = jnp.zeros((B, Cin), jnp.float32)
    s2d2_sites_i8._INTERPRET = True
    try:
        r_pal, _ = s2d2_sites_i8.res_site(
            y1, aq, cq, q2["w"].reshape(4, Cin, -1), q2["ws"],
            fpb["c2_b"].astype(jnp.float32), -127.0, halo="zero",
            kh=2, kw=2, pt=1, pl_=1)
        # and end-to-end through the dispatch
        y_full = t7_fast.t7_fast_apply(fpb, xb, quant=quant,
                                       fused_sites=("c2_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    r_ref = np.asarray(r_ref, np.float32)
    d = np.abs(r_ref - np.asarray(r_pal, np.float32))
    # integer convs are exact; the XLA reference may FMA-contract
    # `*ws + bias` (one rounding) where the kernel rounds twice, so
    # isolated 1-ulp bf16 flips survive — same contract as the s8 tests
    assert (d > 0).mean() < 1e-3, (d.mean(), d.max())
    assert d.max() <= 2.0 ** -7 * max(np.abs(r_ref).max(), 1e-6), d.max()
    assert y_full.shape == xb.shape


def test_nst_c2_i8_parity():
    """The NST c2 site (same 2x2/PT=1 zero-pad stride-2 scatter form as
    t7's) is bit-exact vs XLA int8, and the full apply with
    fused_sites=("c2_i8",) runs end-to-end."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8
    from neuralstyletransferv1_tpu.models import transformer_net_nst
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf
    from neuralstyletransferv1_tpu.ops.conv import conv2d_i8

    p = nstf.from_nst_params(transformer_net_nst.init(jax.random.key(9)))
    rng = np.random.default_rng(41)
    x = jnp.asarray(rng.random((2, 24, 48, 3)), jnp.float32)
    scales = nstf.calibrate_act_scales(p, x)
    quant = nstf.quantize_net(p, scales)
    assert "c2" in quant

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, p)
    xb = x.astype(jnp.bfloat16)
    vals = {}
    nstf.apply(pb, xb, tap=lambda s, t: vals.__setitem__(s, t))
    y1 = vals["c2"]
    q2 = quant["c2"]
    xq = jnp.clip(jnp.round(y1.astype(jnp.float32) * q2["qin"]),
                  -127.0, 127.0).astype(jnp.int8)
    r_ref = (conv2d_i8(xq, q2["w"], padding=((1, 0), (1, 0)))
             .astype(jnp.float32) * q2["ws"]
             + pb["c2_b"].astype(jnp.float32)).astype(jnp.bfloat16)
    B, _, _, Cin = y1.shape
    aq = jnp.full((B, Cin), float(q2["qin"]), jnp.float32)
    cq = jnp.zeros((B, Cin), jnp.float32)
    s2d2_sites_i8._INTERPRET = True
    try:
        r_pal, _ = s2d2_sites_i8.res_site(
            y1, aq, cq, q2["w"].reshape(4, Cin, -1), q2["ws"],
            pb["c2_b"].astype(jnp.float32), -127.0, halo="zero",
            kh=2, kw=2, pt=1, pl_=1)
        y_full = nstf.apply(pb, xb, quant=quant, fused_sites=("c2_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
    r_ref = np.asarray(r_ref, np.float32)
    d = np.abs(r_ref - np.asarray(r_pal, np.float32))
    # integer convs are exact; the XLA reference may FMA-contract
    # `*ws + bias` (one rounding) where the kernel rounds twice, so
    # isolated 1-ulp bf16 flips survive — same contract as the s8 tests
    assert (d > 0).mean() < 1e-3, (d.mean(), d.max())
    assert d.max() <= 2.0 ** -7 * max(np.abs(r_ref).max(), 1e-6), d.max()
    assert y_full.shape == xb.shape


@pytest.mark.slow
def test_dec_i8_pair_form_parity(baked, monkeypatch):
    """PAIR_D2=1 — the column-pair (K=128) d2 form matches the default
    K=64 d2s form (both are exact vs the XLA int8 path)."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(43)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    scales = s2d2.calibrate_act_scales(baked, x.astype(jnp.float32))
    scales = {k: v for k, v in scales.items()
              if k.startswith("r") or k in ("d1", "d2")}
    quant = s2d2.quantize_net(baked, scales)

    s2d2_sites_i8._INTERPRET = True
    try:
        monkeypatch.setattr(s2d2_sites_i8, "_PAIR_D2", False)
        y_k64 = s2d2.apply(bp, x, quant=quant,
                           fused_sites=("res_i8", "dec_i8"))
        monkeypatch.setattr(s2d2_sites_i8, "_PAIR_D2", True)
        y_pair = s2d2.apply(bp, x, quant=quant,
                            fused_sites=("res_i8", "dec_i8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    d = np.abs(np.asarray(y_k64, np.float32) - np.asarray(y_pair, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())
