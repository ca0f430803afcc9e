"""Static-norm modes (--quantize bf16_static / int8_static): every instance
norm frozen to calibration-batch statistics
(transformer_net_s2d2.calibrate_in_stats / apply(static_stats=...)).

The mode is an opt-in quality trade (IN is per-image in the reference,
/root/reference/transformer_net.py:4-33); these tests pin the invariants
that make it sound: B=1 calibration reproduces the dynamic output exactly
on the calibration input, the int8 static path stays inside the engine
quality gate, and the Pallas fused chains accept frozen stats."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuralstyletransferv1_tpu.models import transformer_net
from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d2

ALL_NORMS = ("in1", "in2", "in3", "in4", "in5") + tuple(
    f"r{i}in{j}" for i in range(1, 6) for j in (1, 2))


@pytest.fixture(scope="module")
def baked():
    params = transformer_net.init(jax.random.key(0))
    return s2d2.bake_io_affine(s2d2.from_johnson_params(params), "imagenet_255")


def test_calibrate_in_stats_covers_all_norms(baked):
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 48, 3)), jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, x)
    assert sorted(stats) == sorted(ALL_NORMS)
    for m, inv in stats.values():
        assert m.shape[0] == 1 and inv.shape == m.shape
        assert np.isfinite(np.asarray(m)).all()
        assert (np.asarray(inv) > 0).all()


def test_static_matches_dynamic_on_calibration_input(baked):
    """B=1 calibration: frozen stats == measured stats, so the static
    graph must reproduce the dynamic output to float-rounding level."""
    x = jnp.asarray(np.random.default_rng(1).random((1, 48, 64, 3)), jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, x)
    ref = jax.jit(lambda t: s2d2.apply(baked, t))(x)
    got = jax.jit(lambda t: s2d2.apply(baked, t, static_stats=stats))(x)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 1e-4, (d.mean(), d.max())


def test_static_int8_quality_gate(baked):
    """int8 + frozen norms stays inside the 1e-2 MAE engine gate on the
    clipped [0,1] output (random net + random input = the harsh case)."""
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 96, 3)), jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, x[:1])
    scales = s2d2.calibrate_act_scales(baked, x[:1], static_stats=stats)
    quant = s2d2.quantize_net(baked, scales)
    ref = jax.jit(lambda t: jnp.clip(s2d2.apply(baked, t), 0, 1))(x)
    got = jax.jit(lambda t: jnp.clip(
        s2d2.apply(baked, t, quant=quant, static_stats=stats), 0, 1))(x)
    mae = np.abs(np.asarray(ref) - np.asarray(got)).mean()
    assert mae < 1e-2, mae


def test_static_drops_stat_dependent_fused_sites(baked):
    """head/head_i8/tail fused sites compute stats internally — under
    static_stats they must be ignored, not fed frozen stats they cannot
    use. The call must produce the XLA-head static output."""
    x = jnp.asarray(np.random.default_rng(3).random((1, 32, 48, 3)), jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, x)
    a = s2d2.apply(baked, x, static_stats=stats)
    b = s2d2.apply(baked, x, static_stats=stats, fused_sites=("head", "tail"))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_static_pallas_chain_parity(baked):
    """The Pallas res+dec fused chains accept frozen stats: interpret-mode
    kernels with static affines match the XLA static int8 path."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, xf[:1])
    scales = s2d2.calibrate_act_scales(baked, xf[:1], static_stats=stats)
    quant = s2d2.quantize_net(baked, scales)
    assert s2d2_sites_i8.res_supported(8, 64)
    assert s2d2_sites_i8.dec_supported(8, 64)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant, static_stats=stats)
        y_pal = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                           fused_sites=("res_i8", "dec_i8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


@pytest.mark.slow
def test_static_s8_chain_bit_exact(baked):
    """The s8-carry res chain (fused_sites=("res_s8",) under static_stats:
    a-sites emit the b-sites' s8 inputs with the frozen in1 affine folded,
    b-sites apply frozen in2 post-round and fold the residual add) matches
    the XLA static int8 reference code-for-code: the s8 carries are
    bit-identical (checked transitively by the y outputs' scale), and the
    bf16 y outputs differ only by isolated f32-FMA-contraction flips of
    one bf16 ulp (XLA chooses mul+add vs fma per fusion — measured one
    element in 65k per block; not controllable from jnp)."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, xf[:1])
    scales = s2d2.calibrate_act_scales(baked, xf[:1], static_stats=stats)
    quant = s2d2.quantize_net(baked, scales)
    assert s2d2_sites_i8.res_supported(8, 64)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant, static_stats=stats)
        y_s8 = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                          fused_sites=("res_s8",))
        y_s8dec = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                             fused_sites=("res_s8", "res_i8", "dec_i8"))
        assert s2d2_sites_i8.dec_supported(8, 64)
        y_ds8 = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                           fused_sites=("res_s8", "res_i8", "dec_s8",
                                        "dec_i8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    d = np.abs(np.asarray(y_s8, np.float32) - np.asarray(y_xla, np.float32))
    # ulp-level: a 1-ulp flip mid-chain spreads spatially through the
    # following 3x3 convs, so gate the mean/max, not the touched fraction
    assert d.mean() < 1e-5, (d.mean(), d.max())
    assert d.max() < 2e-2, d.max()
    d = np.abs(np.asarray(y_s8dec, np.float32) - np.asarray(y_xla, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())
    d = np.abs(np.asarray(y_ds8, np.float32) - np.asarray(y_xla, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


@pytest.mark.slow
def test_tail_s8_matches_xla_reference(baked):
    """The fused s8 tail (d2 emits deconv3's s8 input with the frozen in5
    affine + ReLU folded, "zero2" zero-SAME layout; the d3 site collapses
    the tap-packed dy-sum in VMEM; borders strip-fixed from the codes)
    matches the pure-XLA reference ``tail_s8_xla`` to isolated 1-ulp bf16
    FMA-contraction flips — integer convs are exact, so any structural
    error (halo, layout, affine order) would blow the gate."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8 as si8

    rng = np.random.default_rng(7)
    B, H2, W2, co = 2, 16, 128, 64
    WPS2 = si8._wps(W2)
    qs = jnp.asarray(rng.integers(-127, 128, (B, H2, W2, co)), jnp.int8)
    X = jnp.pad(qs, ((0, 0), (0, 0), (1, WPS2 - W2 - 1), (0, 0)))
    X = X.at[:, :, 0].set(qs[:, :, 0])
    X = X.at[:, :, W2 + 1].set(qs[:, :, -1])

    x = jnp.asarray(rng.random((1, 32, 256, 3)), jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, x)
    scales = s2d2.calibrate_act_scales(baked, x,
                                       sites=s2d2.QUANT_SITES_PALLAS,
                                       static_stats=stats)
    quant = s2d2.quantize_net(baked, scales)
    assert si8.d3s8_supported(H2, W2)

    si8._INTERPRET = True
    try:
        y_pal = si8._tail_s8(X, baked, quant, stats, w2=W2)
        y_ref = si8.tail_s8_xla(X, baked, quant, stats, w2=W2)
    finally:
        si8._INTERPRET = False
    assert y_pal.shape == (B, H2, W2, 12)
    d = np.abs(np.asarray(y_pal, np.float32) - np.asarray(y_ref, np.float32))
    assert d.mean() < 1e-4, (d.mean(), d.max())
    assert d.max() < 2e-2, d.max()


@pytest.mark.slow
def test_tail_s8_through_apply(baked):
    """fused_sites with "tail_s8": the whole res->dec->d3 region runs on
    s8 carries and apply returns the d2s of the fused tail. Gated against
    the bf16-d3 static int8 path at quality level (the delta IS d3's
    quantization error) plus a did-it-run guard."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8 as si8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, xf[:1])
    scales = s2d2.calibrate_act_scales(baked, xf[:1],
                                       sites=s2d2.QUANT_SITES_PALLAS,
                                       static_stats=stats)
    quant = s2d2.quantize_net(baked, scales)
    quant_nod3 = {k: v for k, v in quant.items() if k != "d3"}

    calls = []
    real_site = si8.d3_s8_site

    def counting_site(*a, **kw):
        calls.append(1)
        return real_site(*a, **kw)

    si8._INTERPRET = True
    si8.d3_s8_site = counting_site
    try:
        y_ref = s2d2.apply(bp, x, quant=quant_nod3, static_stats=stats,
                           fused_sites=("res_s8", "res_i8",
                                        "dec_s8", "dec_i8"))
        y_tail = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                            fused_sites=("res_s8", "res_i8", "dec_s8",
                                         "dec_i8", "tail_s8"))
    finally:
        si8._INTERPRET = False
        si8.d3_s8_site = real_site
    assert calls == [1], calls
    assert y_tail.shape == y_ref.shape
    d = np.abs(np.asarray(y_tail, np.float32) - np.asarray(y_ref, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


@pytest.mark.slow
def test_head_s8_handoff(baked):
    """head_i8 + res_s8 under frozen norms: the deferred in3 apply folds
    into the first a-site's quantize (in_aff) and block 1's residual gets
    the affine + ReLU in the b-site epilogue (yaff) — no standalone XLA
    pass between the head and res Pallas kernels. Matches the XLA static
    int8 reference to accumulated 1-ulp flips."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8 as si8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, xf[:1])
    scales = s2d2.calibrate_act_scales(baked, xf[:1],
                                       sites=s2d2.QUANT_SITES_PALLAS,
                                       static_stats=stats)
    quant = {k: v for k, v in s2d2.quantize_net(baked, scales).items()
             if k != "d3"}
    assert si8.head_supported(16, 128)

    si8._INTERPRET = True
    try:
        y_xla = s2d2.apply(bp, x, quant=quant, static_stats=stats)
        y_pal = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                           fused_sites=("head_i8", "res_s8", "res_i8",
                                        "dec_s8", "dec_i8"))
    finally:
        si8._INTERPRET = False
    d = np.abs(np.asarray(y_pal, np.float32) - np.asarray(y_xla, np.float32))
    assert d.mean() < 2e-3, (d.mean(), d.max())


ALL_NST_NORMS = ("in1", "in2", "in3", "in4", "in5") + tuple(
    f"r{i}in{j}" for i in range(1, 6) for j in (1, 2))
ALL_RECO_NORMS = ("in1", "in2", "in3", "in4", "in5") + tuple(
    f"r{i}in{j}" for i in range(4) for j in (1, 2))


@pytest.fixture(scope="module")
def nst_fast():
    from neuralstyletransferv1_tpu.models import transformer_net_nst as nst
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    return nstf.from_nst_params(nst.init(jax.random.key(3)))


def test_nst_calibrate_in_stats_covers_all_norms(nst_fast):
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 48, 3)), jnp.float32)
    stats = nstf.calibrate_in_stats(nst_fast, x)
    assert sorted(stats) == sorted(ALL_NST_NORMS)
    for m, inv in stats.values():
        assert m.shape[0] == 1 and inv.shape == m.shape
        assert np.isfinite(np.asarray(m)).all()
        assert (np.asarray(inv) > 0).all()


def test_nst_static_matches_dynamic_on_calibration_input(nst_fast):
    """B=1 calibration reproduces the dynamic NST output exactly (all NST
    convs are zero-padded, so the frozen stats are literally the measured
    ones on this input)."""
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    x = jnp.asarray(np.random.default_rng(1).random((1, 48, 64, 3)), jnp.float32)
    stats = nstf.calibrate_in_stats(nst_fast, x)
    ref = jax.jit(lambda t: nstf.apply(nst_fast, t))(x)
    got = jax.jit(lambda t: nstf.apply(nst_fast, t, static_stats=stats))(x)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 1e-4, (d.mean(), d.max())


def test_nst_static_int8_quality_gate(nst_fast):
    """int8 + frozen norms stays inside the engine gate on the clipped
    [0,1] output (random net + random input = the harsh case)."""
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    x = jnp.asarray(np.random.default_rng(2).random((2, 32, 64, 3)), jnp.float32)
    stats = nstf.calibrate_in_stats(nst_fast, x[:1])
    scales = nstf.calibrate_act_scales(nst_fast, x[:1], static_stats=stats)
    quant = nstf.quantize_net(nst_fast, scales)
    ref = jax.jit(lambda t: jnp.clip(
        nstf.apply(nst_fast, t, static_stats=stats), 0, 1))(x)
    got = jax.jit(lambda t: jnp.clip(
        nstf.apply(nst_fast, t, quant=quant, static_stats=stats), 0, 1))(x)
    mae = np.abs(np.asarray(ref) - np.asarray(got)).mean()
    assert mae < 1e-2, mae


@pytest.mark.parametrize("shape", [
    (1, 48, 64, 3),
    pytest.param((1, 48, 48, 3), marks=pytest.mark.slow),
    pytest.param((2, 32, 64, 3), marks=pytest.mark.slow)])
def test_nst_s8_static_chain(nst_fast, shape):
    """The NST s8-carry res chain (fused_sites=("res_s8",) under frozen
    norms: a-sites emit the b-sites' s8 inputs with the frozen in1 affine
    folded into the output quantize, b-sites apply frozen in2 post-round
    and fold the residual add) matches the XLA static int8 reference
    (_res_quant_xla) to isolated 1-ulp bf16 FMA-contraction flips — the
    same gate as the Johnson s8 chain. W=64 puts the pad-40 res grid at
    width 36 (non-%8): the chain pads to 40 with the kernels masking both
    the quantize and the emitted codes beyond sw=36, the production-1080p
    geometry (grid width 500→504). W=48 is the aligned control; the B=2
    case exercises per-batch strips."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8
    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, nst_fast)
    x = jnp.asarray(np.random.default_rng(6).random(shape), jnp.float32)
    stats = nstf.calibrate_in_stats(nst_fast, x[:1])
    scales = nstf.calibrate_act_scales(nst_fast, x[:1], static_stats=stats)
    quant = nstf.quantize_net(nst_fast, scales)
    xb = x.astype(jnp.bfloat16)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = nstf.apply(pb, xb, quant=quant, static_stats=stats)
        y_s8 = nstf.apply(pb, xb, quant=quant, static_stats=stats,
                          fused_sites=("res_s8",))
        # + the dec extension: res chain -> deconv1 -> deconv2 all on s8
        # carries (the last b-site emits d1's input; d1 emits d2's with
        # the frozen in4 affine folded; d2s runs at s8). Its reference is
        # the XLA int8 dec branch.
        y_xla_dec = nstf.apply(pb, xb, quant=quant, static_stats=stats,
                               fused_sites=("dec_xla_i8",))
        y_ds8 = nstf.apply(pb, xb, quant=quant, static_stats=stats,
                           fused_sites=("res_s8", "dec_s8"))
        # + the tail extension: d2 emits the output conv's s8 input
        # (frozen in5 + ReLU folded, "zero2" layout, sw-masked codes at
        # the crop seam) and the fused d3 site runs the dy-sum in VMEM
        y_xla_tail = nstf.apply(pb, xb, quant=quant, static_stats=stats,
                                fused_sites=("dec_xla_i8", "tail_xla_i8"))
        y_ts8 = nstf.apply(pb, xb, quant=quant, static_stats=stats,
                           fused_sites=("res_s8", "dec_s8", "tail_s8"))
        # res_s8 must NOT engage without static stats (dynamic scales):
        # ("res_i8", "res_s8") under dynamic stats == the res_i8 chain
        y_i8d = nstf.apply(pb, xb,
                           quant=nstf.quantize_net(
                               nst_fast, nstf.calibrate_act_scales(
                                   nst_fast, x[:1])),
                           fused_sites=("res_i8",))
        y_bothd = nstf.apply(pb, xb,
                             quant=nstf.quantize_net(
                                 nst_fast, nstf.calibrate_act_scales(
                                     nst_fast, x[:1])),
                             fused_sites=("res_i8", "res_s8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    ref = np.asarray(y_xla, np.float32)
    got = np.asarray(y_s8, np.float32)
    d = np.abs(ref - got)
    scale = np.abs(ref).mean() + 1e-6
    # 1-ulp FMA-contraction flips at the per-channel quantize boundaries
    # flip isolated int8 codes; non-calibration frames land more rounds on
    # the .5 boundary (measured ~1% of elements, each one output bf16 ulp)
    assert d.mean() / scale < 2e-4, (d.mean(), d.max(), scale)
    assert d.max() < 0.1, d.max()
    dd = np.abs(np.asarray(y_xla_dec, np.float32)
                - np.asarray(y_ds8, np.float32))
    dscale = np.abs(np.asarray(y_xla_dec, np.float32)).mean() + 1e-6
    assert dd.mean() / dscale < 2e-4, (dd.mean(), dd.max(), dscale)
    assert dd.max() < 0.1, dd.max()
    dt_ = np.abs(np.asarray(y_xla_tail, np.float32)
                 - np.asarray(y_ts8, np.float32))
    tscale = np.abs(np.asarray(y_xla_tail, np.float32)).mean() + 1e-6
    # one quantize stage deeper than the dec gate: the res chain's ~1%
    # 1-ulp boundary flips (non-calibration frames) each flip a d3 input
    # code too, so the accumulated fraction roughly triples (measured
    # 3.5e-4 on the B=2 frame; each diff is still a single code step)
    assert dt_.mean() / tscale < 6e-4, (dt_.mean(), dt_.max(), tscale)
    assert dt_.max() < 0.1, dt_.max()
    assert np.array_equal(np.asarray(y_i8d, np.float32),
                          np.asarray(y_bothd, np.float32))


@pytest.mark.parametrize("frn", [False, True])
def test_reconet_static_matches_dynamic_on_calibration_input(frn):
    """B=1 calibration reproduces the dynamic ReCoNet output (IN and FRN
    freezes; FRN's frozen pair is (0, rsqrt(nu2+eps)))."""
    from neuralstyletransferv1_tpu.models import reconet
    from neuralstyletransferv1_tpu.models import reconet_fast as recf

    fp = recf.from_reconet_params(reconet.init(jax.random.key(5), frn=frn))
    x = jnp.asarray(np.random.default_rng(4).random((1, 32, 48, 3)) * 2 - 1,
                    jnp.float32)
    stats = recf.calibrate_in_stats(fp, x)
    assert sorted(stats) == sorted(ALL_RECO_NORMS)
    ref = jax.jit(lambda t: recf.apply(fp, t))(x)
    got = jax.jit(lambda t: recf.apply(fp, t, static_stats=stats))(x)
    d = np.abs(np.asarray(ref) - np.asarray(got))
    assert d.mean() < 1e-4, (frn, d.mean(), d.max())

    scales = recf.calibrate_act_scales(fp, x, static_stats=stats)
    quant = recf.quantize_net(fp, scales)
    gq = jax.jit(lambda t: recf.apply(fp, t, quant=quant,
                                      static_stats=stats))(x)
    dq = np.abs(np.asarray(ref) - np.asarray(gq))
    # tanh output on [-1,1] (3e-2 here == 1.5e-2 on [0,1]); the random
    # high-gain init is the harsh PTQ case — real checkpoints measure ~10x
    # tighter, and the engine additionally gates MAE in-run (bench.py)
    assert dq.mean() < 3e-2, (frn, dq.mean(), dq.max())


def test_head_i8_static(baked):
    """fused_sites=("head_i8",) under frozen norms: the pair-packed int8
    c2+c3 sites take their in2/in3 stats from static_stats (not the
    kernel epilogues), matching the XLA int8 head evaluated on the same
    frozen graph."""
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), baked)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((2, 32, 256, 3)), jnp.bfloat16)
    xf = x.astype(jnp.float32)
    stats = s2d2.calibrate_in_stats(baked, xf[:1])
    scales = s2d2.calibrate_act_scales(baked, xf[:1], static_stats=stats)
    quant = s2d2.quantize_net(baked, {k: scales[k] for k in ("c2", "c3")})
    assert s2d2_sites_i8.head_supported(16, 128)

    # guard against a vacuous pass: the fused head must actually run (it
    # was silently stripped under static_stats once — both sides then ran
    # the identical XLA head and the comparison proved nothing)
    calls = []
    real_head_chain = s2d2_sites_i8.head_chain

    def counting_head_chain(*a, **kw):
        calls.append(kw.get("static_stats") is not None)
        return real_head_chain(*a, **kw)

    s2d2_sites_i8._INTERPRET = True
    s2d2_sites_i8.head_chain = counting_head_chain
    try:
        y_xla = s2d2.apply(bp, x, quant=quant, static_stats=stats)
        y_pal = s2d2.apply(bp, x, quant=quant, static_stats=stats,
                           fused_sites=("head_i8",))
    finally:
        s2d2_sites_i8._INTERPRET = False
        s2d2_sites_i8.head_chain = real_head_chain
    assert calls == [True], calls
    assert y_pal.shape == y_xla.shape
    d = np.abs(np.asarray(y_xla, np.float32) - np.asarray(y_pal, np.float32))
    assert d.mean() < 1e-3, (d.mean(), d.max())


@pytest.mark.parametrize("frn", [False,
                                 pytest.param(True, marks=pytest.mark.slow)])
def test_reconet_s8_static_chain(frn):
    """The ReCoNet s8-carry res chain (fused_sites=("res_s8",) under
    frozen norms: reflect halos ride the carry; on FRN nets the TLU folds
    into the a-site's emit quantize as a per-channel pre-round floor, and
    the post-skip activation stays XLA) matches the XLA static int8
    reference to isolated 1-ulp bf16 FMA-contraction flips."""
    from neuralstyletransferv1_tpu.models import reconet
    from neuralstyletransferv1_tpu.models import reconet_fast as recf
    from neuralstyletransferv1_tpu.models import s2d2_sites_i8

    fp = recf.from_reconet_params(reconet.init(jax.random.key(5), frn=frn))
    pb = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype == jnp.float32 else a, fp)
    x = jnp.asarray(np.random.default_rng(8).random((1, 64, 64, 3)) * 2 - 1,
                    jnp.float32)
    stats = recf.calibrate_in_stats(fp, x)
    scales = recf.calibrate_act_scales(fp, x, static_stats=stats)
    quant = recf.quantize_net(fp, scales)
    xb = x.astype(jnp.bfloat16)

    s2d2_sites_i8._INTERPRET = True
    try:
        y_xla = recf.apply(pb, xb, quant=quant, static_stats=stats)
        y_s8 = recf.apply(pb, xb, quant=quant, static_stats=stats,
                          fused_sites=("res_s8",))
        # + the dec extension (edge halos; frozen in4 affine — and FRN
        # nd1 tau floor — folded into d1's emit quantize; d2s at s8) vs
        # the XLA int8 dec branch
        y_xla_dec = recf.apply(pb, xb, quant=quant, static_stats=stats,
                               fused_sites=("dec_xla_i8",))
        y_ds8 = recf.apply(pb, xb, quant=quant, static_stats=stats,
                           fused_sites=("res_s8", "dec_s8"))
        # without static stats, res_s8 must fall back to the res_i8 chain
        qd = recf.quantize_net(fp, recf.calibrate_act_scales(fp, x))
        y_i8d = recf.apply(pb, xb, quant=qd, fused_sites=("res_i8",))
        y_bothd = recf.apply(pb, xb, quant=qd,
                             fused_sites=("res_i8", "res_s8"))
    finally:
        s2d2_sites_i8._INTERPRET = False
    ref = np.asarray(y_xla, np.float32)
    got = np.asarray(y_s8, np.float32)
    d = np.abs(ref - got)
    scale = np.abs(ref).mean() + 1e-6
    assert d.mean() / scale < 2e-4, (frn, d.mean(), d.max(), scale)
    assert d.max() < 0.1, (frn, d.max())
    dd = np.abs(np.asarray(y_xla_dec, np.float32)
                - np.asarray(y_ds8, np.float32))
    dscale = np.abs(np.asarray(y_xla_dec, np.float32)).mean() + 1e-6
    assert dd.mean() / dscale < 2e-4, (frn, dd.mean(), dd.max(), dscale)
    assert dd.max() < 0.1, (frn, dd.max())
    assert np.array_equal(np.asarray(y_i8d, np.float32),
                          np.asarray(y_bothd, np.float32))


def test_engine_static_flags_nst_reconet():
    """--quantize bf16_static / int8_static on NST and ReCoNet slots: the
    stylizer calibrates on the first batch (call_static_gen) and the
    output stays close to the exact path on correlated frames (the mode's
    intended regime)."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    rng = np.random.default_rng(11)
    base = rng.random((32, 64, 3))
    x = jnp.asarray(
        np.stack([np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1)
                  for _ in range(2)]), jnp.float32)
    for arch in ("nst", "reconet"):
        model = st.make_random_model(arch, seed=3)
        y_ref = np.asarray(st.jit_stylizer(model, dtype=jnp.bfloat16)(x),
                           np.float32)
        for q in ("bf16_static", "int8_static"):
            y = np.asarray(
                st.jit_stylizer(model, dtype=jnp.bfloat16, quantize=q)(x),
                np.float32)
            d = np.abs(y_ref - y)
            assert d.mean() < 3e-2, (arch, q, d.mean(), d.max())


def _t7_in_layers():
    from tests.test_t7_fast import _in, _johnson_layers
    layers = _johnson_layers()
    layers = [(_in(l["weight"].shape[0]) if l["op"] == "batchnorm" else l)
              for l in layers]
    for l in layers:
        if l["op"] == "concat_table":
            l["branches"][0][:] = [
                (_in(b["weight"].shape[0]) if b["op"] == "batchnorm" else b)
                for b in l["branches"][0]]
    return layers


def test_t7_static_fold_matches_dynamic_on_calib_input():
    """fold_static_in on a B=1 calibration input reproduces the dynamic
    deferred-IN output (up to the f32 weight-fold rounding) and yields a
    BN-folded-form net (no deferred norms left)."""
    from neuralstyletransferv1_tpu.io import t7_fast

    fp = t7_fast.try_fast_johnson(_t7_in_layers())
    assert fp is not None and t7_fast.has_deferred_norms(fp)
    x = jnp.asarray(np.random.default_rng(7).normal(0, 50, (1, 32, 40, 3)),
                    jnp.float32)
    stats = t7_fast.calibrate_t7_in_stats(fp, x)
    folded = t7_fast.fold_static_in(fp, stats)
    assert not t7_fast.has_deferred_norms(folded)
    y_dyn = np.asarray(t7_fast.t7_fast_apply(fp, x), np.float32)
    y_st = np.asarray(t7_fast.t7_fast_apply(folded, x), np.float32)
    d = np.abs(y_dyn - y_st)
    scale = np.abs(y_dyn).mean() + 1e-6
    assert d.mean() / scale < 1e-4, (d.mean(), scale)


def test_engine_t7_static_flags():
    """--quantize bf16_static / int8_static on an instance-norm .t7 slot:
    the stylizer folds the frozen norms (call_static_t7) and the output
    stays close to the exact dynamic path on the calibration batch."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    model = st.StyleModel("t7", {"layers": _t7_in_layers()}, "caffe_bgr",
                          "synthetic_t7_in", "torch7")
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((2, 32, 64, 3)), jnp.float32)
    y_ref = np.asarray(st.jit_stylizer(model, dtype=jnp.bfloat16)(x),
                       np.float32)
    for q in ("bf16_static", "int8_static"):
        y = np.asarray(
            st.jit_stylizer(model, dtype=jnp.bfloat16, quantize=q)(x),
            np.float32)
        d = np.abs(y_ref - y)
        assert d.mean() < 3e-2, (q, d.mean(), d.max())


def test_engine_static_flags(tmp_path):
    """--quantize bf16_static / int8_static through the engine CLI: output
    close to the exact run (image mode, batched path; calibration rides
    the first batch)."""
    from PIL import Image

    from neuralstyletransferv1_tpu.engine.pipeline import main

    ckpt = Path(__file__).resolve().parent.parent / "_testdata" / "test_johnson.pth"
    if not ckpt.exists():
        pytest.skip("synthetic checkpoint missing")
    src = tmp_path / "in"
    src.mkdir()
    rng = np.random.default_rng(0)
    base = rng.random((32, 48, 3))
    for i in range(3):
        # correlated frames: the static mode's intended regime
        im = np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1)
        Image.fromarray((im * 255).astype(np.uint8)).save(
            src / f"im_{i:02d}.png")

    def run(out, extra):
        rc = main([
            "--input_dir", str(src), "--pattern", "*.png",
            "--model", str(ckpt), "--io_preset", "raw_255",
            "--frame_batch", "3", "--image_ext", "png",
            "--output_dir", str(out),
            "--work_dir", str(tmp_path / "_w" / out.name),
        ] + extra)
        assert rc == 0

    ref = tmp_path / "ref"
    run(ref, [])
    fa = [np.asarray(Image.open(p), np.float32)
          for p in sorted(ref.glob("*.png"))]
    assert len(fa) == 3
    for mode in ("bf16_static", "int8_static"):
        out = tmp_path / mode
        run(out, ["--quantize", mode])
        fb = [np.asarray(Image.open(p), np.float32)
              for p in sorted(out.glob("*.png"))]
        assert len(fb) == 3
        for xf, yf in zip(fa, fb):
            assert np.abs(xf - yf).mean() < 2.0, mode  # u8 scale
