"""Benchmark: batched 1080p stylization throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "config": "bf16"|"int8-fused-sites", "extras": {...}}

Headline config matches BASELINE.md's north star (≥200 stylized 1080p
frames/s/chip on v5e): Johnson TransformerNet in its f=2 space-to-depth form
(models/transformer_net_s2d2 — identical math, MXU-aligned, zero phase
repacks, zero-SAME conv1/deconv3 with exact border-strip fixups), the
imagenet_255 preset affines baked into conv1/deconv3 (bake_io_affine), bf16
activations/weights with f32 accumulation. Batch 48 is the measured optimum
of the round-2c sweep. The headline reports the BEST config that meets
BASELINE's quality gate (per-frame MAE ≤ 1e-2): when the opt-in
``--quantize int8`` fused-site mode (measured in-net win, MAE ~3e-5 —
PERF.md round-3) beats bf16 under an in-run gate check, the headline rides
it and ``config`` records that. ``vs_baseline`` is value / 200 (the
reference publishes no numbers of its own — BASELINE.md).

``extras`` covers every BASELINE.md config + the other fast-path backends so
the driver regress-detects them each round (VERDICT round 2, Weak #3 /
Missing #4):
  - int8_fps_1080: the opt-in --quantize int8 engine config (Pallas fused
    res+dec sites, quality MAE ~3e-5 vs bf16 — PERF.md round-3)
  - latency_ms_p50_512 / latency_ms_p50_1080: B1 single-image p50 incl. the
    relay round trip (BASELINE "single-image latency" row)
  - t7_fps_1080 / nst_fps_1080 / reconet_fps_1080: the other three f=2
    fast-path backends, full pre/post IO-preset math included
  - ladder_passes_per_sec / ladder_sec_per_pass (config #2): vmapped
    8-model Johnson bank @1080p — reference claims ≈4.3 s per 1080p style
    pass (full_weight_ladder/README.md:99)
  - gram_nst_500steps_512_sec (config #3): VGG16 Gram NST, 500 Adam steps
    @512px, one compiled lax.scan program (wall incl. compile — a one-shot
    workload in practice)
  - deeplab_masked_fps (config #4): DeepLab-resnet @513 mask → upsample →
    composite with the stylized 1080p frame (sky_swap workload)
  - magenta_tiled_fps_1080: frame-batched tiled magenta transform (compact
    net, random weights — the real SavedModel's shard is stripped)
  - flow_video_fps_1080 / flow_video_fps_1080_ds2 (config #5): stylize +
    DIS flow on gray pairs + the full temporal chain (flow EMA, LAB
    smoothing, motion blend) in one graph; ds2 = --flow_downscale 2
  - e2e_video_fps_1080: REAL pipeline wall-clock decode→style→encode on a
    synthetic 1080p clip through engine.pipeline.main (--frame_batch 16)

Measurement notes (this environment's axon relay):
- identical (executable, args) calls are memoized → every timed call uses a
  fresh input;
- block_until_ready does not block → a scalar reduce is fetched to force
  execution;
- K iterations are chained in-graph and a 1-iteration run is subtracted to
  remove dispatch+fetch overhead (throughput metrics; latency keeps it in).

Set BENCH_EXTRAS=0 to print only the headline metric.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, str(os.path.dirname(os.path.abspath(__file__))))
from neuralstyletransferv1_tpu.compile_cache import enable as _cc_enable

_CC_DIR = _cc_enable()  # persistent XLA cache — repeat runs compile warm

BASELINE_FPS = 200.0  # north-star target, BASELINE.json
H, W = 1080, 1920
BATCH = 48
CHAIN = 8
REPEATS = 2
# Per-run input salt: the axon relay memoizes identical (executable, args)
# calls ACROSS runs too — fixed seeds made round-2/round-3 headlines
# byte-identical (416.1 ms twice; VERDICT round-3 Weak #2). Salting the
# seed stream makes cached-result reuse provably impossible.
SALT = (time.time_ns() // 1000) % 1_000_000_007


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _chain_time(fn, make_input, chain, repeats=1):
    """Best wall time of `chain` in-graph iterations of fn (shape-preserving)."""
    g = jax.jit(
        lambda x: jnp.sum(
            jax.lax.fori_loop(0, chain, lambda i, y: fn(y).astype(y.dtype), x).astype(jnp.float32)
        )
    )
    float(g(make_input(0)))  # compile + warm
    best = float("inf")
    for r in range(repeats):
        x = make_input(100 + r)
        float(jnp.sum(x.astype(jnp.float32)))  # materialize input
        t0 = time.perf_counter()
        float(g(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _fps(fn, make_input, batch, chain=4, repeats=1):
    d_chain = _chain_time(fn, make_input, chain, repeats)
    d_one = _chain_time(fn, make_input, 1, repeats)
    per_batch = max(1e-9, (d_chain - d_one) / (chain - 1))
    return batch / per_batch


def _rand_img(seed, b, h, w, dtype=jnp.bfloat16):
    return jax.random.uniform(jax.random.key(seed + SALT), (b, h, w, 3), dtype)


def _headline(bparams):
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    def step(x):
        return jnp.clip(s2d.apply(bparams, x), 0.0, 1.0)

    d_chain = _chain_time(step, lambda s: _rand_img(s, BATCH, H, W), CHAIN, REPEATS)
    d_one = _chain_time(step, lambda s: _rand_img(s, BATCH, H, W), 1, REPEATS)
    if d_chain <= d_one:
        _log(f"WARNING: chain{CHAIN} ({d_chain:.4f}s) <= chain1 ({d_one:.4f}s)"
             " — relay memoization suspected despite per-run salt")
    per_batch = max(1e-9, (d_chain - d_one) / (CHAIN - 1))
    _log(f"headline per-batch{BATCH}: {per_batch * 1000:.1f} ms "
         f"(chain{CHAIN} {d_chain:.3f}s, chain1 {d_one:.3f}s, salt {SALT})")
    return BATCH / per_batch


def _int8(extras, bparams, bparams32):
    """Opt-in --quantize int8 engine config (site set mirrors
    engine/stylizer._I8_FUSED_SITES — Pallas fused res+dec today; PERF.md
    round-3). Quality vs the bf16 path is MAE ~3e-5 on clipped output."""
    from neuralstyletransferv1_tpu.engine.stylizer import (
        _I8_FUSED_SITES,
        _I8_QUANT_KEEP,
    )
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = s2d.calibrate_act_scales(bparams32, xc)
    keep = set(_I8_QUANT_KEEP)
    if "head_i8" in _I8_FUSED_SITES:
        keep |= {"c2", "c3"}
    scales = {k: v for k, v in scales.items()
              if k.startswith("r") or k in keep}
    quant = s2d.quantize_net(bparams32, scales)

    def step(x):
        return jnp.clip(s2d.apply(bparams, x, quant=quant,
                                  fused_sites=_I8_FUSED_SITES), 0.0, 1.0)

    # In-run quality gate vs the bf16 path (BASELINE's per-frame MAE
    # budget is 1e-2 on [0,1] output; measured ~3e-5): the headline may
    # only ride int8 when the gate holds on this device/toolchain.
    xq = _rand_img(42, 4, H, W)
    y_bf = jax.jit(lambda x: jnp.clip(s2d.apply(bparams, x), 0.0, 1.0))(xq)
    y_i8 = jax.jit(step)(xq)
    mae = float(jnp.mean(jnp.abs(y_bf.astype(jnp.float32)
                                 - y_i8.astype(jnp.float32))))
    extras["int8_mae_vs_bf16"] = mae
    extras["int8_fps_1080"] = _fps(
        step, lambda s: _rand_img(s, BATCH, H, W), BATCH, chain=CHAIN,
        repeats=REPEATS)
    _log(f"int8 engine mode {extras['int8_fps_1080']:.1f} fps "
         f"(MAE {mae:.2e})")
    return extras["int8_fps_1080"], mae


def _static_norm(extras, bparams, bparams32):
    """Opt-in static-norm configs (--quantize bf16_static / int8_static):
    every instance norm frozen to first-batch calibration statistics
    (transformer_net_s2d2.calibrate_in_stats). The quality gate runs on
    NOISE-PERTURBED variants of the calibration frame (sigma 0.03 on
    [0,1]) — the mode's contract is intra-video statistics drift, and the
    engine always calibrates on the job's own first batch; fully
    independent random frames through a random-gain net are also recorded
    (``*_mae_indep``) for transparency but do not gate (a trained net's
    gain is ~10x tamer per block — PERF.md chain-parity note)."""
    from neuralstyletransferv1_tpu.engine.stylizer import (
        _I8_FUSED_STATIC, _s2d2_site_filter)
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    stats = s2d.calibrate_in_stats(bparams32, xc)

    # gate inputs: correlated (calibration + noise) and independent
    k1, k2 = jax.random.split(jax.random.key(42))
    xg = jnp.clip(xc.astype(jnp.bfloat16)
                  + 0.03 * jax.random.normal(k1, (4, H, W, 3), jnp.bfloat16),
                  0.0, 1.0)
    xi = jax.random.uniform(k2, (2, H, W, 3), jnp.bfloat16)
    y_dyn = jax.jit(lambda x: jnp.clip(s2d.apply(bparams, x), 0.0, 1.0))

    best = (0.0, 1.0, None)
    # candidates: (extras key, headline config tag, fused-site set or None
    # for bf16). SLIMMED to the adopted winner + the bf16 reference only
    # (VERDICT round-4 Weak #1: the old 4-row sweep burned the driver
    # budget before BASELINE configs #2-#5 ran). The mk32/mk35 xla-only
    # form (QUANT_SITES on plain XLA int8, frozen-norm affines folded) was
    # the last open candidate and is now a MEASURED NEGATIVE on the s2d2
    # geometry: 119.8 fps B48 vs the Pallas s8-carry chain's 145.0
    # (PERF.md round-5 mk35) — the t7_bn insight does not transfer.
    cands = [("bf16_static", "bf16-static-norm", None),
             ("int8_static", "int8-static-norm", _I8_FUSED_STATIC)]
    scales_s = None
    for name, tag, fused in cands:
        try:
            quant = None
            if fused is not None:
                if scales_s is None:
                    scales_s = s2d.calibrate_act_scales(
                        bparams32, xc, sites=s2d.QUANT_SITES_PALLAS,
                        static_stats=stats)
                scales = _s2d2_site_filter(scales_s, xc, sites=fused)
                quant = s2d.quantize_net(bparams32, scales)

            def step(x, q=quant, f=() if fused is None else fused):
                return jnp.clip(s2d.apply(bparams, x, quant=q,
                                          fused_sites=f,
                                          static_stats=stats), 0.0, 1.0)

            st = jax.jit(step)
            mae = float(jnp.mean(jnp.abs(y_dyn(xg).astype(jnp.float32)
                                         - st(xg).astype(jnp.float32))))
            mae_i = float(jnp.mean(jnp.abs(y_dyn(xi).astype(jnp.float32)
                                           - st(xi).astype(jnp.float32))))
            fps = _fps(step, lambda s: _rand_img(s, BATCH, H, W), BATCH,
                       chain=CHAIN, repeats=REPEATS)
            extras[f"{name}_fps_1080"] = fps
            extras[f"{name}_mae_vs_bf16"] = mae
            extras[f"{name}_mae_indep"] = mae_i
            _log(f"{name} {fps:.1f} fps (MAE {mae:.2e}, indep {mae_i:.2e})")
            if mae <= 1e-2 and fps > best[0]:
                best = (fps, mae, tag)
        except Exception as e:  # a candidate must not kill the section
            _log(f"static candidate {name} FAILED: {type(e).__name__}: {e}")
    return best


def _latency_p50(bparams, h, w):
    """B1 p50 incl. dispatch + relay round trip (fresh input each call)."""
    import numpy as np
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    g = jax.jit(lambda x: jnp.sum(jnp.clip(s2d.apply(bparams, x), 0.0, 1.0)
                                  .astype(jnp.float32)))
    float(g(_rand_img(0, 1, h, w)))  # compile
    ts = []
    for r in range(11):
        x = _rand_img(200 + r, 1, h, w)
        float(jnp.sum(x.astype(jnp.float32)))
        t0 = time.perf_counter()
        float(g(x))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts) * 1000.0)
    _log(f"latency p50 @{h}x{w}: {p50:.1f} ms (B1, incl. relay round trip)")
    return p50


def _t7_layers(rng):
    """Full-size eccv16 Johnson .t7 graph shape (32-64-128, 5 res blocks),
    random weights, BN form — rides io/t7_fast (reference nets:
    models/eccv16/*.t7 via cv2.dnn, /root/reference/pipeline.py:758-800)."""
    import numpy as np

    def conv(ci, co, k, s, p):
        return {"op": "conv", "w": rng.normal(0, 0.05, (k, k, ci, co)).astype(np.float32),
                "b": rng.normal(0, 0.02, co).astype(np.float32),
                "stride": (s, s), "pad": (p, p)}

    def bn(c):
        return {"op": "batchnorm",
                "weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
                "bias": rng.normal(0, 0.1, c).astype(np.float32),
                "running_mean": rng.normal(0, 0.2, c).astype(np.float32),
                "running_var": rng.uniform(0.5, 1.5, c).astype(np.float32),
                "eps": 1e-5}

    def convT(ci, co):
        return {"op": "conv_transpose",
                "w": rng.normal(0, 0.05, (3, 3, co, ci)).astype(np.float32),
                "b": rng.normal(0, 0.02, co).astype(np.float32),
                "stride": 2, "pad": 1, "adj": 1}

    def res(c):
        body = [conv(c, c, 3, 1, 1), bn(c), {"op": "relu"},
                conv(c, c, 3, 1, 1), bn(c)]
        return [{"op": "concat_table", "branches": [body, []]},
                {"op": "add_table"}]

    ls = [conv(3, 32, 9, 1, 4), bn(32), {"op": "relu"},
          conv(32, 64, 3, 2, 1), bn(64), {"op": "relu"},
          conv(64, 128, 3, 2, 1), bn(128), {"op": "relu"}]
    for _ in range(5):
        ls += res(128)
    ls += [convT(128, 64), bn(64), {"op": "relu"},
           convT(64, 32), bn(32), {"op": "relu"},
           conv(32, 3, 9, 1, 4), {"op": "tanh"}, {"op": "mul", "c": 150.0}]
    return ls


def _backend_fps():
    """t7 / NST / ReCoNet fast forms @1080p B8, full IO-preset math."""
    import numpy as np
    from neuralstyletransferv1_tpu.engine import stylizer as st
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import io_presets as iop

    out = {}
    B = 8

    p7 = t7_fast.try_fast_johnson(_t7_layers(np.random.default_rng(7)))
    assert p7 is not None
    p7 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if hasattr(a, "astype") else a, p7)

    def t7_step(x01):
        y = t7_fast.t7_fast_apply(p7, iop.preprocess("caffe_bgr", x01))
        return jnp.clip(iop.postprocess("caffe_bgr", y), 0.0, 1.0)

    out["t7_fps_1080"] = _fps(t7_step, lambda s: _rand_img(s, B, H, W), B)
    _log(f"t7 {out['t7_fps_1080']:.1f} fps")

    from neuralstyletransferv1_tpu.models import transformer_net_nst_fast as nstf

    mn = st.make_random_model("nst", seed=1)
    pn = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if hasattr(a, "astype") else a,
                      nstf.from_nst_params(mn.params))

    def nst_step(x01):
        y = nstf.apply(pn, iop.preprocess("raw_01", x01))
        return jnp.clip(iop.postprocess("raw_01", y), 0.0, 1.0)

    out["nst_fps_1080"] = _fps(nst_step, lambda s: _rand_img(s, B, H, W), B)
    _log(f"nst {out['nst_fps_1080']:.1f} fps")

    from neuralstyletransferv1_tpu.models import reconet_fast

    mr = st.make_random_model("reconet", seed=1)
    pr = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "astype") and a.dtype != jnp.bool_ else a,
        reconet_fast.from_reconet_params(mr.params))

    def reco_step(x01):
        y = reconet_fast.apply(pr, iop.preprocess("imagenet_01", x01))
        return jnp.clip(iop.postprocess("imagenet_01", y), 0.0, 1.0)

    out["reconet_fps_1080"] = _fps(reco_step, lambda s: _rand_img(s, B, H, W), B)
    _log(f"reconet {out['reconet_fps_1080']:.1f} fps")
    return out


def _backend_int8_fps():
    """--quantize int8 on the .t7 fast path (the fastest backend; the graph
    here is BN-folded, so the engine set is _I8_FUSED_T7_BN — mk32
    2026-08-19 adopted plain XLA-i8 = () for that form). Separate guarded
    section — any Pallas kernels' first real-TPU compile happens here."""
    import numpy as np
    from neuralstyletransferv1_tpu.engine.stylizer import (
        _I8_FUSED_T7_BN as _I8_FUSED_T7)
    from neuralstyletransferv1_tpu.io import t7_fast
    from neuralstyletransferv1_tpu.models import io_presets as iop

    out = {}
    B = 8
    p32 = t7_fast.try_fast_johnson(_t7_layers(np.random.default_rng(7)))
    p7 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if hasattr(a, "astype") else a, p32)
    xc = jax.random.uniform(jax.random.key(7), (1, H, W, 3), jnp.float32)
    scales = t7_fast.calibrate_t7_scales(p32, np.asarray(
        iop.preprocess("caffe_bgr", xc)))
    quant = t7_fast.quantize_t7(p32, scales)

    def t7_i8_step(x01):
        y = t7_fast.t7_fast_apply(p7, iop.preprocess("caffe_bgr", x01),
                                  quant=quant, fused_sites=_I8_FUSED_T7)
        return jnp.clip(iop.postprocess("caffe_bgr", y), 0.0, 1.0)

    out["t7_int8_fps_1080"] = _fps(t7_i8_step,
                                   lambda s: _rand_img(s, B, H, W), B)
    _log(f"t7 int8 {out['t7_int8_fps_1080']:.1f} fps")

    if "res_s8" not in _I8_FUSED_T7:
        # Pending-adoption candidate (mk32 s8c rows): s8-carry chain for
        # the BN-folded graph — measured here so every round-end bench
        # records it even if no interactive relay window existed.
        # same dec/c2 setting as the row above — only the res chain differs
        s8c_sites = tuple(s for s in _I8_FUSED_T7
                          if s != "res_i8") + ("res_s8",)

        def t7_s8c_step(x01):
            y = t7_fast.t7_fast_apply(
                p7, iop.preprocess("caffe_bgr", x01), quant=quant,
                fused_sites=s8c_sites)
            return jnp.clip(iop.postprocess("caffe_bgr", y), 0.0, 1.0)

        out["t7_int8_s8carry_fps_1080"] = _fps(
            t7_s8c_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"t7 int8 s8-carry {out['t7_int8_s8carry_fps_1080']:.1f} fps")

    if "dec_s8" not in _I8_FUSED_T7:
        # Second pending candidate (mk32 ds8 rows): carry extended through
        # deconv1/deconv2 — res-chain/deconv1 outputs never hit HBM as bf16.
        ds8_sites = tuple(s for s in _I8_FUSED_T7
                          if s not in ("res_i8", "dec_i8")) + ("res_s8",
                                                               "dec_s8")

        def t7_ds8_step(x01):
            y = t7_fast.t7_fast_apply(
                p7, iop.preprocess("caffe_bgr", x01), quant=quant,
                fused_sites=ds8_sites)
            return jnp.clip(iop.postprocess("caffe_bgr", y), 0.0, 1.0)

        out["t7_int8_decs8_fps_1080"] = _fps(
            t7_ds8_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"t7 int8 dec-s8 {out['t7_int8_decs8_fps_1080']:.1f} fps")

    if "tail_s8" not in _I8_FUSED_T7:
        # Third pending candidate (mk32 tail rows): carry extended through
        # the 9x9 output conv — the bf16 d2 raw and the 60-lane K tensor
        # never exist in HBM (fused d3_s8_site dy-sum in VMEM).
        tail_sites = tuple(
            s for s in _I8_FUSED_T7
            if s not in ("res_i8", "dec_i8")) + ("res_s8", "dec_s8",
                                                 "tail_s8")

        def t7_tail_step(x01):
            y = t7_fast.t7_fast_apply(
                p7, iop.preprocess("caffe_bgr", x01), quant=quant,
                fused_sites=tail_sites)
            return jnp.clip(iop.postprocess("caffe_bgr", y), 0.0, 1.0)

        out["t7_int8_tails8_fps_1080"] = _fps(
            t7_tail_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"t7 int8 tail-s8 {out['t7_int8_tails8_fps_1080']:.1f} fps")

    # NST / ReCoNet int8_static s8-carry candidates (mk33/mk34 i8-s8c+ds8
    # rows) — guarded so the round-end bench records them even when no
    # interactive relay window ran the queue.
    from neuralstyletransferv1_tpu.engine import stylizer as st
    s8_sites = ("res_s8", "res_i8", "dec_s8", "dec_i8")
    try:
        from neuralstyletransferv1_tpu.models import (
            transformer_net_nst_fast as nstf)

        mn = st.make_random_model("nst", seed=1)
        pn32 = nstf.from_nst_params(mn.params)
        pnb = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                           if hasattr(a, "astype") else a, pn32)
        xc1 = iop.preprocess("raw_01", jax.random.uniform(
            jax.random.key(7), (1, H, W, 3), jnp.float32))
        stats_n = nstf.calibrate_in_stats(pn32, xc1)
        qn = {k: v for k, v in nstf.quantize_net(
            pn32, nstf.calibrate_act_scales(
                pn32, xc1, static_stats=stats_n)).items()
            if k.startswith("r") or k in ("d1", "d2", "d3")}

        def nst_s8_step(x01):
            y = nstf.apply(pnb, iop.preprocess("raw_01", x01), quant=qn,
                           static_stats=stats_n, fused_sites=s8_sites)
            return jnp.clip(iop.postprocess("raw_01", y), 0.0, 1.0)

        out["nst_int8_static_s8_fps_1080"] = _fps(
            nst_s8_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"nst int8-static s8 "
             f"{out['nst_int8_static_s8_fps_1080']:.1f} fps")

        def nst_tail_step(x01):
            y = nstf.apply(pnb, iop.preprocess("raw_01", x01), quant=qn,
                           static_stats=stats_n,
                           fused_sites=s8_sites + ("tail_s8",))
            return jnp.clip(iop.postprocess("raw_01", y), 0.0, 1.0)

        out["nst_int8_static_tails8_fps_1080"] = _fps(
            nst_tail_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"nst int8-static tail-s8 "
             f"{out['nst_int8_static_tails8_fps_1080']:.1f} fps")
    except Exception as e:
        _log(f"nst int8-static s8 FAILED: {type(e).__name__}: {e}")
    try:
        from neuralstyletransferv1_tpu.models import reconet_fast as recf

        mr = st.make_random_model("reconet", seed=1)
        pr32 = recf.from_reconet_params(mr.params)
        prb = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "astype") and a.dtype != jnp.bool_ else a, pr32)
        xc1 = iop.preprocess("imagenet_01", jax.random.uniform(
            jax.random.key(7), (1, H, W, 3), jnp.float32))
        stats_r = recf.calibrate_in_stats(pr32, xc1)
        qr = recf.quantize_net(pr32, recf.calibrate_act_scales(
            pr32, xc1, static_stats=stats_r))

        def reco_s8_step(x01):
            y = recf.apply(prb, iop.preprocess("imagenet_01", x01),
                           quant=qr, static_stats=stats_r,
                           fused_sites=s8_sites)
            return jnp.clip(iop.postprocess("imagenet_01", y), 0.0, 1.0)

        out["reconet_int8_static_s8_fps_1080"] = _fps(
            reco_s8_step, lambda s: _rand_img(s, B, H, W), B)
        _log(f"reconet int8-static s8 "
             f"{out['reconet_int8_static_s8_fps_1080']:.1f} fps")
    except Exception as e:
        _log(f"reconet int8-static s8 FAILED: {type(e).__name__}: {e}")
    return out


def _ladder(extras):
    """Config #2: vmapped 8-model Johnson bank @1080p (fast s2d2 forms)."""
    from neuralstyletransferv1_tpu.engine import stylizer as st

    M, B = 8, 2  # B=4 exceeded HBM (16.09G/15.75G) with the chain harness
    models = [st.make_random_model("johnson", seed=s) for s in range(M)]
    f = st.jit_ladder_stylizer(models, dtype=jnp.bfloat16)

    def step(x01):
        return f(x01)[0]  # keep shape chainable; full M-bank work each iter

    fps = _fps(step, lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
    passes_per_sec = fps * M / 1.0  # each "frame" is styled by M models
    extras["ladder_passes_per_sec"] = passes_per_sec
    extras["ladder_sec_per_pass"] = 1.0 / passes_per_sec
    _log(f"ladder {passes_per_sec:.1f} style-passes/s "
         f"({1.0/passes_per_sec*1000:.1f} ms/pass; reference claims ~4300 ms)")


def _gram_nst(extras):
    """Config #3: VGG16 Gram NST, 500 steps @512px, one compiled program."""
    from neuralstyletransferv1_tpu.engine import gram_nst
    from neuralstyletransferv1_tpu.models import vgg

    params = vgg.init(jax.random.key(0))
    content = jax.random.uniform(jax.random.key(1), (1, 512, 512, 3))
    style = jax.random.uniform(jax.random.key(2), (1, 512, 512, 3))
    t0 = time.perf_counter()
    out, hist = gram_nst.optimize(params, content, style, steps=500)
    float(jnp.sum(out))
    extras["gram_nst_500steps_512_sec"] = time.perf_counter() - t0
    _log(f"gram-NST 500 steps @512: {extras['gram_nst_500steps_512_sec']:.1f}s "
         f"(incl. compile)")


def _deeplab_masked(extras, bparams):
    """Config #4: DeepLab mask @513 → upsampled composite on stylized 1080p."""
    import numpy as np
    import torch
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    ref = "/root/reference"
    sys.path.insert(0, ref)
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(ref)
    torch.manual_seed(0)
    model = DeepLab(backbone="resnet", output_stride=16, num_classes=21,
                    sync_bn=False)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del model

    from neuralstyletransferv1_tpu.engine.masked_stylize import (
        make_masked_stylize_step)
    from neuralstyletransferv1_tpu.models import deeplab as dl

    dparams, _nc = dl.import_deeplab(sd)

    B = 4
    # bf16 glue end-to-end (mk44: the f32 form was ~90% data movement —
    # copy 69 + fusion 61 of 213 ms/B4; the nets are ~5 ms). Gate: mask
    # disagreement vs the f32 form on a shared batch — argmax flips only
    # boundary pixels; composite error is bounded by the flip fraction.
    step16 = make_masked_stylize_step(dparams, bparams, (H, W),
                                      compute_dtype=jnp.bfloat16)
    step32 = make_masked_stylize_step(dparams, bparams, (H, W),
                                      compute_dtype=jnp.float32)
    xq = _rand_img(77, 2, H, W, jnp.float32)
    d = float(jnp.mean(jnp.abs(jax.jit(step16)(xq) - jax.jit(step32)(xq))))
    extras["deeplab_bf16_vs_f32_mae"] = d
    f16 = _fps(step16, lambda s: _rand_img(s, B, H, W, jnp.float32), B,
               chain=3)
    extras["deeplab_masked_bf16_fps"] = f16
    if d <= 1e-2:
        extras["deeplab_masked_fps"] = f16
        _log(f"deeplab masked stylize {f16:.1f} fps (bf16 glue, "
             f"MAE {d:.2e} vs f32)")
    else:  # gate failed — fall back to the f32 form for the headline key
        extras["deeplab_masked_fps"] = _fps(
            step32, lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
        _log(f"deeplab masked stylize {extras['deeplab_masked_fps']:.1f} fps "
             f"(f32; bf16 FAILED gate, MAE {d:.2e})")


def _magenta(extras):
    """Magenta tiled stylization @1080p, frame-batched tiling (the compact
    arbitrary-style net, random weights — the real SavedModel's shard is
    stripped from the mount). Reference tiling loop:
    /root/reference/pipeline.py:190-265."""
    from neuralstyletransferv1_tpu.models import magenta

    B = 8
    params = magenta.init(jax.random.key(0))
    style = jax.random.uniform(jax.random.key(1), (256, 256, 3))

    def step(x01):
        return magenta.stylize_tiled_batch(params, x01, style)

    extras["magenta_tiled_fps_1080"] = _fps(
        step, lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
    _log(f"magenta tiled {extras['magenta_tiled_fps_1080']:.1f} fps")

    # bf16 tile transform (CIN stats stay f32) — candidate, MAE-gated
    def step16(x01):
        return magenta.stylize_tiled_batch(params, x01, style,
                                           compute_dtype=jnp.bfloat16)

    xq = _rand_img(9_991, 2, H, W, jnp.float32)
    mae = float(jnp.mean(jnp.abs(jax.jit(step16)(xq) - jax.jit(step)(xq))))
    extras["magenta_bf16_mae"] = mae
    extras["magenta_tiled_bf16_fps_1080"] = _fps(
        step16, lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
    _log(f"magenta tiled bf16 {extras['magenta_tiled_bf16_fps_1080']:.1f} fps "
         f"(MAE {mae:.1e} vs f32)")


def _flow_video(extras, bparams):
    """Config #5: stylize + DIS flow + full temporal chain, one graph."""
    from functools import partial

    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d
    from neuralstyletransferv1_tpu.ops.color import rgb_to_gray
    from neuralstyletransferv1_tpu.ops.dis_flow import dis_flow
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear
    from neuralstyletransferv1_tpu.temporal.ema import temporal_postprocess_scan

    # B16 matches the production batched path's --frame_batch and amortizes
    # DIS+stylize over the scan's serialized per-frame warp (round-4: B8
    # 26.3 -> B16 30.7 fps with the split+packed temporal chain)
    B = 16

    def make_step(ds):
        def step(x01):
            x = x01.astype(jnp.float32)
            grays = rgb_to_gray(x * 255.0)
            prevs = jnp.concatenate([grays[:1], grays[:-1]], 0)
            if ds > 1:
                hs, ws = H // ds, W // ds
                f = jax.vmap(dis_flow)(
                    resize_bilinear(prevs[..., None], (hs, ws))[..., 0],
                    resize_bilinear(grays[..., None], (hs, ws))[..., 0])
                flows = resize_bilinear(f, (H, W)) * float(ds)
            else:
                flows = jax.vmap(dis_flow)(prevs, grays)
            styled = jnp.clip(s2d.apply(bparams, x01.astype(jnp.bfloat16)),
                              0.0, 1.0).astype(jnp.float32)
            out, _ = temporal_postprocess_scan(
                styled, x, flows,
                flow_ema=True, flow_alpha=0.6, smooth_lightness=True,
                motion_blend=True, blend=0.9)
            return out

        return step

    # ds2 first: it is the production default candidate and the round-3
    # run was killed before it landed (VERDICT round-3 Weak #3).
    extras["flow_video_fps_1080_ds2"] = _fps(
        make_step(2), lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
    _log(f"flow pipeline ds2 {extras['flow_video_fps_1080_ds2']:.1f} fps")
    extras["flow_video_fps_1080"] = _fps(
        make_step(1), lambda s: _rand_img(s, B, H, W, jnp.float32), B, chain=3)
    _log(f"flow pipeline {extras['flow_video_fps_1080']:.1f} fps")


def _e2e_video(extras):
    """Real pipeline wall-clock: decode → style → encode, 1080p clip."""
    import tempfile
    from pathlib import Path

    import cv2
    import numpy as np

    from neuralstyletransferv1_tpu.engine.pipeline import main as pipe_main

    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    nframes = 96
    vw = cv2.VideoWriter(str(tmp / "in.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 24, (W, H))
    rng = np.random.default_rng(0)
    base = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    for i in range(nframes):
        vw.write(np.roll(base, i * 7, axis=1))
    vw.release()

    ckpt = Path(__file__).resolve().parent / "_testdata" / "test_johnson.pth"

    def run(tag):
        t0 = time.perf_counter()
        rc = pipe_main([
            "--input_video", str(tmp / "in.mp4"),
            "--output_video", str(tmp / f"out_{tag}.mp4"),
            "--model", str(ckpt), "--io_preset", "raw_255",
            "--frame_batch", "16", "--compute_dtype", "bfloat16",
            "--no-smooth_lightness", "--blend", "1.0",
            "--fps", "24", "--work_dir", str(tmp / f"w_{tag}"),
        ])
        wall = time.perf_counter() - t0
        assert rc == 0
        return nframes / wall

    # cold = first invocation (includes XLA compiles — mitigated across
    # PROCESSES by the persistent compile cache, neuralstyletransferv1_tpu/
    # compile_cache.py); warm = repeat invocation, the resident-service
    # number the reference's load-once process model prices
    # (/root/reference/pipeline.py:571-621).
    extras["e2e_video_fps_1080"] = run("cold")
    _log(f"e2e video cold (decode→style→encode, incl. compile) "
         f"{extras['e2e_video_fps_1080']:.1f} fps over {nframes} frames")
    extras["e2e_video_fps_1080_warm"] = run("warm")
    _log(f"e2e video warm {extras['e2e_video_fps_1080_warm']:.1f} fps "
         f"over {nframes} frames")


class _SectionTimeout(Exception):
    pass


def _emit(fps, cfg, extras):
    """Print the driver-contract JSON line (repeatable: the driver takes the
    LAST parseable line, so a provisional emission after the
    headline-deciding sections guarantees the round records a number even
    if the run is killed mid-extras — VERDICT round-3 Missing #1)."""
    print(
        json.dumps(
            {
                "metric": "stylized_1080p_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "config": cfg,
                "extras": {k: round(float(v), 6) for k, v in extras.items()},
            }
        ),
        flush=True,
    )


def main() -> None:
    from neuralstyletransferv1_tpu import config
    from neuralstyletransferv1_tpu.models import transformer_net, transformer_net_s2d2 as s2d

    _log(f"device: {jax.devices()[0]}")
    config.set_conv_precision("default")  # bf16 inputs → native MXU path

    params = transformer_net.init(jax.random.key(0))
    # the preset's pre/post affines are folded into conv1/deconv3 (exact;
    # kills the separate elementwise passes — PERF.md round-2c)
    bparams32 = s2d.bake_io_affine(s2d.from_johnson_params(params),
                                   "imagenet_255")
    bparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bparams32)

    t_start = time.perf_counter()
    fps = _headline(bparams)
    cfg = "bf16"

    extras = {}
    i8_res: dict = {}
    static_res: dict = {}

    def _pick():
        # Headline = best config meeting BASELINE's quality gate (per-frame
        # MAE <= 1e-2): the opt-in int8 fused-site mode is a measured in-net
        # win (PERF.md round-3) and far inside the gate (~3e-5), and the
        # static-norm modes gate on intra-video drift (see _static_norm) —
        # the fastest gated config IS the production operating point.
        bf, bc = fps, cfg
        if i8_res and i8_res.get("mae", 1.0) <= 1e-2 and i8_res["fps"] > bf:
            bf, bc = i8_res["fps"], "int8-fused-sites"
        if static_res.get("cfg") and static_res["fps"] > bf:
            bf, bc = static_res["fps"], static_res["cfg"]
        return bf, bc

    # Wall-clock budget + per-section hard timeout: the driver bounds the
    # whole bench run; round 3 lost its number when ONE long section (flow)
    # blew through the window before the JSON line printed. Three guards:
    # (a) a provisional JSON line is emitted as soon as the
    #     headline-deciding sections are done (and refreshed after each
    #     later section), so the last parseable line always reflects
    #     completed work;
    # (b) each section gets a SIGALRM timeout so a hung relay call can't
    #     absorb the rest of the window;
    # (c) once elapsed time crosses BENCH_BUDGET_S the remaining sections
    #     are skipped. BENCH_BUDGET_S=0 disables guard (c).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    env_to = os.environ.get("BENCH_SECTION_TIMEOUT_S")
    section_to = int(env_to) if env_to else 600
    # deciders pick the headline config — on slow-relay days (compiles
    # 5-10x the usual latency) give them extra room rather than losing the
    # int8/static winner to the alarm. Only raise the floor when the user
    # did NOT explicitly lower the section timeout (ADVICE round-4).
    decider_to = section_to if env_to else max(section_to, 900)
    headline_deciders = {"int8", "static_norm"}
    emitted = False
    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        def _alarm(signum, frame):
            raise _SectionTimeout()

        old = signal.signal(signal.SIGALRM, _alarm)
        # Order (VERDICT round-4 #3): slimmed deciders first, then ONE
        # representative line per BASELINE config (latency=#1, ladder=#2,
        # gram=#3, deeplab=#4, flow=#5, plus magenta+e2e) BEFORE the
        # backends variant sweeps — so BENCH_rN carries every product
        # number even when the driver budget bites.
        for name, fn in [
            ("int8", lambda: i8_res.update(
                zip(("fps", "mae"), _int8(extras, bparams, bparams32)))),
            ("static_norm", lambda: static_res.update(
                zip(("fps", "mae", "cfg"),
                    _static_norm(extras, bparams, bparams32)))),
            ("latency", lambda: extras.update(
                latency_ms_p50_512=_latency_p50(bparams, 512, 512),
                latency_ms_p50_1080=_latency_p50(bparams, H, W))),
            ("ladder", lambda: _ladder(extras)),
            ("gram_nst", lambda: _gram_nst(extras)),
            ("deeplab", lambda: _deeplab_masked(extras, bparams)),
            ("flow", lambda: _flow_video(extras, bparams)),
            ("magenta", lambda: _magenta(extras)),
            ("e2e", lambda: _e2e_video(extras)),
            ("backends", lambda: extras.update(_backend_fps())),
            ("backends_int8", lambda: extras.update(_backend_int8_fps())),
        ]:
            if name not in headline_deciders and not emitted:
                _emit(*_pick(), extras)  # provisional: deciders done
                emitted = True
            if budget_s and time.perf_counter() - t_start > budget_s:
                _log(f"section {name} SKIPPED (over {budget_s:.0f}s budget)")
                continue
            try:
                t0 = time.perf_counter()
                eff_to = (decider_to if name in headline_deciders
                          else section_to)
                if budget_s:  # never let one section outlive the budget
                    eff_to = max(60, min(eff_to, int(
                        budget_s - (time.perf_counter() - t_start)) + 30))
                signal.alarm(eff_to)
                fn()
                _log(f"section {name} took {time.perf_counter() - t0:.0f}s")
            except _SectionTimeout:
                _log(f"section {name} TIMED OUT ({eff_to}s)")
            except Exception as e:  # one section must not kill the bench
                _log(f"section {name} FAILED: {type(e).__name__}: {e}")
            finally:
                signal.alarm(0)
            if emitted:
                _emit(*_pick(), extras)  # refresh: last line = latest state
        signal.signal(signal.SIGALRM, old)

    fps, cfg = _pick()
    _log(f"total bench {time.perf_counter() - t_start:.0f}s")
    _emit(fps, cfg, extras)


if __name__ == "__main__":
    main()
