"""The stylizer bank: weights resident in HBM, one jitted graph per batch.

This replaces the reference's per-frame, per-model ``.to(device)``/``.cpu()``
round-trips (reference: pipeline.py:1444-1486 — each of up to 8 models does a
host↔device hop per frame) with a model bank loaded once and a fused
preprocess→net→postprocess program applied to whole NHWC frame batches.

Speed path: params and activations in bfloat16 (MXU-native), conv
accumulation in f32, instance-norm statistics in f32. Parity path: f32 with
HIGHEST precision.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from .. import adopt_overrides as _adopt
from ..io import checkpoints as ckpt
from ..models import io_presets as iop
from ..models import reconet, transformer_net, transformer_net_nst

ARCH_APPLY = {
    "johnson": transformer_net.apply,
    "nst": transformer_net_nst.apply,
    "reconet": reconet.apply,
}

# The measured-win int8 fused-site sets (defaults in adopt_overrides.py;
# PERF.md round-3: res chain + deconv1/2 = 121.6 fps @B16 vs 110.1 bf16).
# "head_i8" (pair-packed c2/c3), "d3_i8", per-backend "dec_i8"/"c2_i8" and
# the t7 "res_s8"/"dec_s8" carry chains are parity-tested but NOT default:
# d3_i8 measured a regression; the rest await their in-net TPU A/Bs
# (experiments/run_tpu_queue.sh). When the queue runs unattended,
# adopt_from_queue --apply lands wins via i8_adopt.json (adopt_overrides).
_I8_FUSED_SITES = _adopt.sites("sites")
_I8_FUSED_STATIC = _adopt.sites("sites_static")  # int8_static (frozen norms)
_I8_QUANT_KEEP = {"d1", "d2"}  # + every r{i}{a,b}; c2/c3 iff head_i8 lands

_I8_FUSED_T7 = _adopt.sites("t7")        # IN-form .t7 graphs
_I8_FUSED_T7_BN = _adopt.sites("t7_bn")  # BN-folded .t7 graphs (incl. the
#                                          static-norm folded path); () =
#                                          plain XLA int8, no Pallas sites
_I8_FUSED_NST = _adopt.sites("nst")
_I8_FUSED_RECO = _adopt.sites("reco")
# static-norm (frozen IN/FRN) int8 variants of the NST/ReCoNet sets
_I8_FUSED_NST_STATIC = _adopt.sites("nst_static")
_I8_FUSED_RECO_STATIC = _adopt.sites("reco_static")


def _s2d2_site_filter(scales: dict, xc, sites=None) -> dict:
    """Quantize only the s2d2 sites that ride Pallas fused kernels (res
    chain + deconv1/2): XLA-int8 pays a standalone HBM quantize pass per
    site — a measured LOSS (PERF.md int8 section) — so anything without an
    adopted kernel stays bf16 (conv1, c2, c3, d3). ``sites`` is the fused
    set in effect (defaults to the dynamic engine set; the static-norm
    path passes _I8_FUSED_STATIC).

    An EMPTY adopted set means the mk32 BN-form configuration: no Pallas
    sites at all, every XLA-safe site (QUANT_SITES — c2/c3/res/d1/d2, never
    d3/conv1) quantized through plain XLA int8. Only reachable under static
    norms, where the quantize affines are compile-time constants XLA folds
    into conv epilogues (dynamic norms measured this a loss)."""
    if sites is None:
        sites = _I8_FUSED_SITES
    if not sites:
        from ..models import transformer_net_s2d2 as _s2d
        return {k: v for k, v in scales.items() if k in _s2d.QUANT_SITES}
    keep = set(_I8_QUANT_KEEP)
    if "head_i8" in sites:
        from ..models import s2d2_sites_i8 as _si8
        if _si8.head_supported(xc.shape[1] // 2, xc.shape[2] // 2):
            keep |= {"c2", "c3"}
    if "tail_s8" in sites:
        from ..models import s2d2_sites_i8 as _si8
        if _si8.d3s8_supported(xc.shape[1] // 2, xc.shape[2] // 2):
            keep |= {"d3"}
    return {k: v for k, v in scales.items()
            if k.startswith("r") or k in keep}


@dataclass
class StyleModel:
    """One loaded slot of the model bank (reference slots A-H,
    pipeline.py:623-1008)."""

    arch: str  # johnson | nst | reconet
    params: dict
    io_preset: str
    name: str = ""
    model_type: str = "transformer"  # reference backend name

    def cast(self, dtype) -> "StyleModel":
        params = jax.tree.map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            self.params,
        )
        return StyleModel(self.arch, params, self.io_preset, self.name, self.model_type)


def load_model(
    path: str | Path,
    *,
    model_type: str = "transformer",
    io_preset: str = "auto",
    name: str | None = None,
) -> StyleModel:
    """Load a reference-format checkpoint into a StyleModel.

    Arch auto-detection and preset resolution mirror the reference
    (pipeline.py:72-79, 610-614, 2518-2527).
    """
    path = Path(path)
    sd = ckpt.load_state_dict(str(path))
    if model_type == "reconet":
        params = ckpt.import_reconet(sd)
        arch = "reconet"
    else:
        arch = detect_arch = ckpt.detect_transformer_arch(sd)
        if detect_arch == "nst":
            params = ckpt.import_transformer_nst(sd)
        else:
            params = ckpt.import_transformer(sd)
    if io_preset == "auto":
        io_preset = iop.resolve_auto_preset(model_type, arch=arch)
    elif arch == "nst" and io_preset in ("raw_255", "imagenet_255"):
        # NST_Train checkpoints force raw_01 (reference: pipeline.py:610-614).
        io_preset = "raw_01"
    params = jax.tree.map(jnp.asarray, params)
    return StyleModel(arch, params, io_preset, name or path.stem, model_type)


def make_random_model(
    arch: str = "johnson", *, seed: int = 0, io_preset: str | None = None
) -> StyleModel:
    """Random-weight model (tests/bench when no checkpoints are mounted)."""
    rng = jax.random.key(seed)
    inits = {
        "johnson": (transformer_net.init, "imagenet_255"),
        "nst": (transformer_net_nst.init, "raw_01"),
        "reconet": (reconet.init, "imagenet_01"),
    }
    init_fn, preset = inits[arch]
    return StyleModel(arch, init_fn(rng), io_preset or preset, f"random_{arch}", "transformer")


def stylize(model_arch: str, params: dict, io_preset: str, x01: jnp.ndarray) -> jnp.ndarray:
    """Pure fn: [0,1] NHWC batch → stylized [0,1] NHWC batch. Jittable."""
    from ..ops.resize import resize_bilinear

    if model_arch == "t7":
        from ..io.t7 import t7_apply

        apply_fn = lambda p, x: t7_apply(p["layers"], x)  # noqa: E731
    else:
        apply_fn = ARCH_APPLY[model_arch]
    xin = iop.preprocess(io_preset, x01)
    y = apply_fn(params, xin)
    out = iop.postprocess(io_preset, y)
    # Lock stylized output to the content size — the Johnson net grows odd
    # dims to the next multiple of 4 (reference: pipeline.py:1514-1518).
    if out.shape[1:3] != x01.shape[1:3]:
        out = resize_bilinear(out, (x01.shape[1], x01.shape[2]))
    return out


def _jit_batch(fn, mesh):
    """jit ``fn(batch) -> batch`` — data-parallel over ``mesh`` if given.

    The batch dim shards on the ``data`` axis (ICI); everything captured
    (params) replicates. XLA/GSPMD inserts the collectives — no hand-written
    communication (SURVEY §2.8: the reference has no distributed backend;
    this is the TPU-native scaling axis of the workload).
    """
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    bsh = NamedSharding(mesh, P("data"))
    return jax.jit(fn, in_shardings=(bsh,), out_shardings=bsh)


def jit_stylizer(model: StyleModel, *, dtype=jnp.float32, optimize: bool = True,
                 mesh=None, quantize: str = "none"):
    """Compile a stylize fn for one model; returns f(batch01) -> batch01.

    ``dtype=jnp.bfloat16`` selects the MXU speed path (params cast once).
    With ``optimize`` (default), Johnson-arch models additionally use the
    f=2 space-to-depth form (models/transformer_net_s2d2) whenever the input
    H, W are divisible by 4 — identical math, every tensor stays in one s2d
    layout so no phase repacks happen (~14x the naive port's throughput at
    1080p; see memory/nst-tpu-perf-ledger.md).

    ``mesh``: optional 1-D ``data`` mesh — the frame batch shards across
    devices, params replicate (engine flag ``--mesh_devices``). Magenta
    slots run tile-batched on the default device regardless (their batch
    axis is tiles, not frames).
    """
    if model.arch == "magenta":
        return _jit_magenta_stylizer(model, dtype=dtype)

    m = model.cast(dtype) if dtype != jnp.float32 else model

    reco_fast_params = None
    reco_fast_params32 = None
    if optimize and model.arch == "reconet":
        from ..models import reconet_fast

        reco_fast_params = reconet_fast.from_reconet_params(model.params)
        reco_fast_params32 = reco_fast_params
        if dtype != jnp.float32:
            reco_fast_params = jax.tree.map(
                lambda a: a.astype(dtype)
                if hasattr(a, "astype") and a.dtype != jnp.bool_ else a,
                reco_fast_params)

    nst_fast_params = None
    nst_fast_params32 = None
    if optimize and model.arch == "nst":
        from ..models import transformer_net_nst_fast as nstf

        nst_fast_params = nstf.from_nst_params(model.params)
        nst_fast_params32 = nst_fast_params
        if dtype != jnp.float32:
            nst_fast_params = jax.tree.map(
                lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
                nst_fast_params)

    t7_fast_params = None
    t7_fast_params32 = None
    if optimize and model.arch == "t7":
        from ..io import t7_fast

        t7_fast_params = t7_fast.try_fast_johnson(model.params["layers"])
        if t7_fast_params is not None:
            t7_fast_params32 = t7_fast_params
            if dtype != jnp.float32:
                t7_fast_params = jax.tree.map(
                    lambda a: a.astype(dtype)
                    if hasattr(a, "astype") else a, t7_fast_params)
            print(f"[stylizer] t7 fast path active for {model.name}")

    s2d_params = None
    s2d_params32 = None
    if optimize and model.arch == "johnson":
        from ..models import transformer_net_s2d2 as tns2d

        # the IO preset's pre/post affines fold into conv1/deconv3 (exact;
        # kills the separate elementwise passes — PERF.md round-2c), so the
        # s2d2 path consumes/produces [0,1] RGB directly.
        s2d_params32 = tns2d.bake_io_affine(
            tns2d.from_johnson_params(model.params), m.io_preset)
        s2d_params = s2d_params32
        if dtype != jnp.float32:
            s2d_params = jax.tree.map(lambda a: a.astype(dtype), s2d_params32)

    has_fast = any(p is not None for p in
                   (s2d_params, t7_fast_params, nst_fast_params,
                    reco_fast_params))

    t7_is_bn = False
    if t7_fast_params is not None:
        from ..io import t7_fast as _t7f
        # BN-folded graphs have no deferred (runtime) norms — their int8
        # fused-site set is adopted separately (mk32: XLA-i8 wins the BN
        # form while Pallas sites win the IN form's geometry).
        t7_is_bn = not _t7f.has_deferred_norms(t7_fast_params32)

    def fast_apply(x, quant=None, static_stats=None, t7_params=None):
        """Fast f=2 forms; x must have H, W divisible by 4."""
        from ..models import transformer_net_s2d2 as tns2d
        from ..ops.resize import resize_bilinear

        if s2d_params is not None:
            fused = ()
            if quant is not None and jax.default_backend() == "tpu":
                # int8 res + deconv sites run as Pallas fused kernels
                # (quantize in the kernel prologue — the XLA standalone
                # quantize passes were the whole int8 loss; PERF.md int8
                # section). The static-norm mode has its own adopted set
                # ("res_s8" s8-carry chain is its mk35-measured candidate).
                # NOT "d3_i8": measured 133.5 -> 146.3 ms/B16 REGRESSION
                # (the bf16 in5 apply input-fuses into the conv for free;
                # the kernel's 60-lane writes cost more than i8 saves —
                # PERF.md round-3).
                fused = (_I8_FUSED_STATIC if static_stats is not None
                         else _I8_FUSED_SITES)
            out = jnp.clip(tns2d.apply(s2d_params, x, quant=quant,
                                       fused_sites=fused,
                                       static_stats=static_stats), 0.0, 1.0)
            if out.shape[1:3] != x.shape[1:3]:
                out = resize_bilinear(out, (x.shape[1], x.shape[2]))
            return out
        if t7_fast_params is not None:
            from ..io.t7_fast import t7_fast_apply

            fused = ()
            if quant is not None and jax.default_backend() == "tpu":
                # the static path passes a folded (BN-form) graph via
                # t7_params, so it rides the BN set too
                fused = (_I8_FUSED_T7_BN
                         if (t7_is_bn or t7_params is not None)
                         else _I8_FUSED_T7)
            xin = iop.preprocess(m.io_preset, x)
            return iop.postprocess(
                m.io_preset,
                t7_fast_apply(t7_params if t7_params is not None
                              else t7_fast_params, xin, quant=quant,
                              fused_sites=fused))
        if nst_fast_params is not None:
            from ..models import transformer_net_nst_fast as nstf

            fused = ()
            if quant is not None and jax.default_backend() == "tpu":
                fused = (_I8_FUSED_NST_STATIC if static_stats is not None
                         else _I8_FUSED_NST)
            xin = iop.preprocess(m.io_preset, x)
            return iop.postprocess(
                m.io_preset,
                nstf.apply(nst_fast_params, xin, quant=quant,
                           fused_sites=fused, static_stats=static_stats))
        from ..models import reconet_fast

        fused = ()
        if quant is not None and jax.default_backend() == "tpu":
            fused = (_I8_FUSED_RECO_STATIC if static_stats is not None
                     else _I8_FUSED_RECO)
        xin = iop.preprocess(m.io_preset, x)
        return iop.postprocess(
            m.io_preset,
            reconet_fast.apply(reco_fast_params, xin, quant=quant,
                               fused_sites=fused, static_stats=static_stats))

    def make_fn(quant=None, static_stats=None, t7_params=None):
        def fn(x01):
            x = x01.astype(dtype)
            H, W = x.shape[1], x.shape[2]
            mh, mw = 4, 4
            if quant is not None and H >= 32 and W >= 64:
                # int8 fused sites gate on w4 % 8 (and an even h4): pad to
                # %32/%8 so odd resolutions keep the fused path instead of
                # silently falling back to bf16. Same pad-and-crop
                # tradeoff as the %4 case — the interior is lossless, the
                # crop discards the synthetic border band.
                mh, mw = 8, 32
            ph, pw = (-H) % mh, (-W) % mw
            if not has_fast or H < 8 or W < 8:
                out = stylize(m.arch, m.params, m.io_preset, x)
            elif ph or pw:
                # Arbitrary resolutions ride the fast forms: reflect-pad H/W
                # to the next multiple of 4 and crop back. The reference's
                # own net grows odd dims to %4 before the pipeline resizes
                # down (reference: pipeline.py:1514-1518) — pad-and-crop
                # keeps the interior lossless instead of blurring the whole
                # frame.
                xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                             mode="reflect")
                out = fast_apply(xp, quant, static_stats,
                                 t7_params)[:, :H, :W]
            else:
                out = fast_apply(x, quant, static_stats, t7_params)
            return out.astype(jnp.float32)

        return fn

    t7_static_ok = False
    if (quantize in ("bf16_static", "int8_static") and s2d_params is None
            and nst_fast_params is None and reco_fast_params is None):
        if t7_fast_params is not None:
            from ..io import t7_fast as t7f
            t7_static_ok = t7f.has_deferred_norms(t7_fast_params32)
        if not t7_static_ok:
            # Static-norm needs runtime norms to freeze. BN-folded .t7
            # graphs have none (already the static structure), so
            # int8_static degenerates to the regular int8 path; anything
            # without a supported fast form keeps its exact path.
            print(f"[stylizer][WARN] --quantize {quantize}: {model.name} "
                  f"({model.arch}) has no freezable runtime norms; falls "
                  f"back to "
                  f"{'int8' if quantize == 'int8_static' else 'the exact path'}.")
            quantize = "int8" if quantize == "int8_static" else None

    if t7_static_ok:
        # STATIC-NORM on an instance-norm .t7 graph: freeze the deferred
        # norms to first-batch stats and FOLD them into the conv weights
        # (io/t7_fast.fold_static_in) — the result is BN-folded-form and
        # rides that path's whole machinery, including the s8-carry int8
        # chains IN graphs cannot use dynamically.
        from ..io import t7_fast as t7f

        want_i8 = quantize == "int8_static"
        state_t: dict = {}

        def call_static_t7(x01):
            if "fn" not in state_t:
                xc = x01[:1].astype(jnp.float32)
                H, W = xc.shape[1], xc.shape[2]
                ph, pw = (-H) % 4, (-W) % 4
                if ph or pw:
                    xc = jnp.pad(xc, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                xin = iop.preprocess(m.io_preset, xc)
                stats = t7f.calibrate_t7_in_stats(t7_fast_params32, xin)
                folded32 = t7f.fold_static_in(t7_fast_params32, stats)
                quant = None
                if want_i8:
                    scales = t7f.calibrate_t7_scales(folded32, xin)
                    quant = t7f.quantize_t7(folded32, scales)
                folded = folded32
                if dtype != jnp.float32:
                    folded = jax.tree.map(
                        lambda a: a.astype(dtype)
                        if hasattr(a, "astype") else a, folded32)
                state_t["fn"] = _jit_batch(
                    make_fn(quant, t7_params=folded), mesh)
                print(f"[stylizer] static-norm "
                      f"{'int8' if want_i8 else 'bf16'} .t7 path folded "
                      f"for {model.name} ({len(stats)} frozen norms)")
            return state_t["fn"](x01)

        return call_static_t7

    if (quantize in ("bf16_static", "int8_static")
            and (nst_fast_params is not None or reco_fast_params is not None)):
        # STATIC-NORM on the NST / ReCoNet fast forms: freeze every IN (or,
        # for FRN ReCoNets, every nu2) to the job's first-batch statistics
        # — same trade and same quality gate as the Johnson branch below.
        # int8_static additionally quantizes the static graph and rides the
        # backend's fused sites with static affines.
        if nst_fast_params is not None:
            from ..models import transformer_net_nst_fast as _smod
            _sp32 = nst_fast_params32
        else:
            from ..models import reconet_fast as _smod
            _sp32 = reco_fast_params32
        want_i8 = quantize == "int8_static"
        state_g: dict = {}

        def call_static_gen(x01):
            if "fn" not in state_g:
                xc = x01[:1].astype(jnp.float32)
                H, W = xc.shape[1], xc.shape[2]
                ph, pw = (-H) % 4, (-W) % 4
                if ph or pw:
                    xc = jnp.pad(xc, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                xin = iop.preprocess(m.io_preset, xc)
                stats = _smod.calibrate_in_stats(_sp32, xin)
                quant = None
                if want_i8:
                    scales = _smod.calibrate_act_scales(_sp32, xin,
                                                        static_stats=stats)
                    quant = _smod.quantize_net(_sp32, scales)
                state_g["fn"] = _jit_batch(
                    make_fn(quant, static_stats=stats), mesh)
                print(f"[stylizer] static-norm "
                      f"{'int8' if want_i8 else 'bf16'} {model.arch} path "
                      f"calibrated for {model.name} "
                      f"({len(stats)} frozen norms)")
            return state_g["fn"](x01)

        return call_static_gen

    if quantize in ("bf16_static", "int8_static"):
        # STATIC-NORM modes (opt-in quality trade): freeze every instance
        # norm to the job's own first-batch statistics
        # (transformer_net_s2d2.calibrate_in_stats). The per-image stats
        # reductions disappear and every IN affine becomes a compile-time
        # constant XLA folds into conv epilogues — the structure that
        # makes BN-folded .t7 the fastest backend (163 vs 115 fps bf16).
        # int8_static additionally rides the fused int8 sites with static
        # quantize affines. NOT exact vs the reference; bench.py gates
        # these configs on output MAE before they can take the headline.
        from ..models import transformer_net_s2d2 as tns2d

        want_i8 = quantize == "int8_static"
        state_s: dict = {}

        def call_static(x01):
            if "fn" not in state_s:
                xc = x01[:1].astype(jnp.float32)
                H, W = xc.shape[1], xc.shape[2]
                ph, pw = (-H) % 4, (-W) % 4
                if ph or pw:
                    xc = jnp.pad(xc, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                stats = tns2d.calibrate_in_stats(s2d_params32, xc)
                quant = None
                if want_i8:
                    scales = tns2d.calibrate_act_scales(
                        s2d_params32, xc, sites=tns2d.QUANT_SITES_PALLAS,
                        static_stats=stats)
                    scales = _s2d2_site_filter(scales, xc,
                                               sites=_I8_FUSED_STATIC)
                    quant = tns2d.quantize_net(s2d_params32, scales)
                state_s["fn"] = _jit_batch(
                    make_fn(quant, static_stats=stats), mesh)
                print(f"[stylizer] static-norm {'int8' if want_i8 else 'bf16'}"
                      f" path calibrated for {model.name} "
                      f"({len(stats)} frozen norms)")
            return state_s["fn"](x01)

        return call_static

    if quantize == "int8":
        # One lazy-first-batch PTQ wrapper for every fast backend: a jitted
        # f32 forward taps the per-site activation maxima on the first
        # batch, then the int8 graph (Pallas fused sites on TPU, XLA int8
        # on CPU) compiles with static scales. Each entry is
        # (params32, needs_preprocess, calibrate_fn, quantize_fn,
        #  site_filter).
        fastq = None
        if s2d_params is not None:
            from ..models import transformer_net_s2d2 as tns2d

            fastq = (s2d_params32, False,
                     partial(tns2d.calibrate_act_scales,
                             sites=tns2d.QUANT_SITES_PALLAS),
                     tns2d.quantize_net, _s2d2_site_filter)
        elif t7_fast_params is not None:
            from ..io import t7_fast as t7f

            fastq = (t7_fast_params32, True, t7f.calibrate_t7_scales,
                     t7f.quantize_t7, None)
        elif nst_fast_params is not None:
            from ..models import transformer_net_nst_fast as nstf

            fastq = (nst_fast_params32, True, nstf.calibrate_act_scales,
                     nstf.quantize_net, None)
        elif reco_fast_params is not None:
            from ..models import reconet_fast as recf

            fastq = (reco_fast_params32, True, recf.calibrate_act_scales,
                     recf.quantize_net, None)
        if fastq is None:
            print(f"[stylizer][WARN] --quantize int8 needs a supported "
                  f"fast path (Johnson s2d2 / .t7 / NST / ReCoNet); "
                  f"{model.name} ({model.arch}) stays "
                  f"{'bf16' if dtype != jnp.float32 else 'f32'}.")
        else:
            p32, pre, calibrate_fn, quantize_fn, site_filter = fastq
            state: dict = {}

            def call_quant(x01):
                if "fn" not in state:
                    xc = x01[:1].astype(jnp.float32)
                    H, W = xc.shape[1], xc.shape[2]
                    ph, pw = (-H) % 4, (-W) % 4
                    if ph or pw:
                        xc = jnp.pad(xc, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                     mode="reflect")
                    xin = iop.preprocess(m.io_preset, xc) if pre else xc
                    scales = calibrate_fn(p32, xin)
                    if site_filter is not None:
                        scales = site_filter(scales, xc)
                    quant = quantize_fn(p32, scales)
                    state["fn"] = _jit_batch(make_fn(quant), mesh)
                    print(f"[stylizer] int8 {model.arch} path calibrated "
                          f"for {model.name} ({len(quant)} sites)")
                return state["fn"](x01)

            return call_quant

    return _jit_batch(make_fn(), mesh)


def _jit_magenta_stylizer(model: StyleModel, *, dtype=jnp.float32):
    """Magenta slot: optional downscale → tiled transform → feather stitch →
    upscale back (reference flow: pipeline.py:190-265). One compile per
    content shape; tiles from the WHOLE frame batch run as one device batch
    (models/magenta.stylize_tiled_batch)."""
    from ..models import magenta
    from ..ops.resize import resize_bilinear

    p = model.params
    params, style01 = p.get("magenta"), p["style01"]
    transfer_fn = p.get("transfer_fn")  # real-weights SavedModel executor
    tile, overlap, target_res = p["tile"], p["overlap"], p["target_res"]

    @jax.jit
    def fn(x01):
        H, W = x01.shape[1], x01.shape[2]
        work = x01
        if target_res and max(H, W) > target_res:
            r = target_res / max(H, W)
            work = resize_bilinear(x01, (int(H * r), int(W * r)))
        y = magenta.stylize_tiled_batch(params, work, style01, tile_size=tile,
                                        overlap=overlap, transfer_fn=transfer_fn)
        if y.shape[1:3] != (H, W):
            y = resize_bilinear(y, (H, W))
        return y.astype(jnp.float32)

    return fn


def stack_models(models: list[StyleModel]) -> StyleModel:
    """Stack same-arch, same-preset models into one bank with a leading model
    axis on every leaf. Used by the vmapped ladder stylizer."""
    archs = {m.arch for m in models}
    presets = {m.io_preset for m in models}
    if len(archs) != 1 or len(presets) != 1:
        raise ValueError(f"stack_models needs uniform arch/preset, got {archs}/{presets}")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *[m.params for m in models])
    return StyleModel(models[0].arch, stacked, models[0].io_preset,
                      f"bank[{len(models)}]", models[0].model_type)


def jit_ladder_stylizer(models: list[StyleModel], *, dtype=jnp.float32,
                        optimize: bool = True):
    """One jitted call styling a batch with EVERY model of a same-arch bank
    (the style_all_weights / weight-ladder workload, BASELINE config #2).

    Returns f(batch01[N,H,W,C]) -> [M,N,H,W,C]: the vmap over stacked params
    multiplies MXU work per dispatch instead of re-dispatching per checkpoint.

    With ``optimize`` (default), Johnson banks vmap the f=2 s2d2 fast form
    with each model's IO-preset affines baked in (exact — same path as
    jit_stylizer); inputs with H/W not divisible by 4 reflect-pad and crop
    like the single-model path.
    """
    bank = stack_models(models)
    arch, preset = bank.arch, bank.io_preset

    s2d_stack = None
    if optimize and arch == "johnson":
        from ..models import transformer_net_s2d2 as tns2d

        per_model = [
            tns2d.bake_io_affine(tns2d.from_johnson_params(m.params), preset)
            for m in models
        ]
        s2d_stack = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *per_model)
        if dtype != jnp.float32:
            s2d_stack = jax.tree.map(lambda a: a.astype(dtype), s2d_stack)

    if dtype != jnp.float32:
        bank = bank.cast(dtype)

    @jax.jit
    def fn(x01):
        x = x01.astype(dtype)
        if s2d_stack is not None and x.shape[1] >= 8 and x.shape[2] >= 8:
            from ..models import transformer_net_s2d2 as tns2d

            H, W = x.shape[1], x.shape[2]
            ph, pw = (-H) % 4, (-W) % 4
            xp = (jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
                  if (ph or pw) else x)
            out = jax.vmap(lambda p: jnp.clip(tns2d.apply(p, xp), 0.0, 1.0))(
                s2d_stack)
            return out[:, :, :H, :W].astype(jnp.float32)

        def one(params):
            return stylize(arch, params, preset, x)

        return jax.vmap(one)(bank.params).astype(jnp.float32)

    return fn


def blend_outputs(outputs: list[jnp.ndarray], weights: list[float]) -> jnp.ndarray:
    """RGB weighted blend of stylized batches (reference: pipeline.py:1872-1879;
    weights validated to sum to 1 at pipeline.py:502-521)."""
    total = sum(weights)
    acc = outputs[0] * (weights[0] / total)
    for o, w in zip(outputs[1:], weights[1:]):
        acc = acc + o * (w / total)
    return jnp.clip(acc, 0.0, 1.0)
