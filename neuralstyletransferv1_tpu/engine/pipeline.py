"""The pipeline engine: extract → style → post-process → assemble.

CLI/flag parity with the reference engine (reference: pipeline.py:2156-2674;
modes at 2446-2456; staging at 2552-2604; hot loop at 1080-2122) on a
TPU-native execution model:

- All model weights load once into device memory (slot bank A-H).
- Per-frame compute — preset-fused stylize, multi-model blend, region
  composite, flow EMA, LAB EMA, mask composite, motion blend — runs as jitted
  XLA programs with static shapes; temporal state stays on device between
  frames. No per-frame host↔device weight traffic.
- ffmpeg is replaced by OpenCV video IO when the binary is absent
  (io.frames).

The crop-based --region_optimize path styles only each region's padded crop
(the flag's goal — "2-4x faster with multiple regions", reference
pipeline.py:2355-2357): crops pad to a static bucket ladder and batch per
model so every jitted shape is compiled once (_region_blend_optimized).
"""

from __future__ import annotations

import gc
import re
import sys
import time
import uuid
from functools import partial
from pathlib import Path

import numpy as np

from ..io import frames as fio
from .config import build_arg_parser

_LETTERS = "abcdefgh"


def effective_flow_downscale(flow_downscale: int, h: int, w: int) -> int:
    """Resolve --flow_downscale 0 (auto) for a frame size.

    Auto picks 2 when the half-res frame still supports the full DIS
    pyramid depth (min dim >= 512 → 256 at ds2 → finest level 64, four
    levels) and 1 otherwise, so tiny clips never silently lose their flow
    (the pyramid builder returns zero flow when no level fits). ds2 flow
    passes the full-res cv2 oracle at 0.26-0.36 px mean (bound 0.5) and
    costs ~1/6 of full-res DIS @1080p — PERF.md round-4. Explicit values
    pass through unchanged (reference: pipeline.py:2232 default 1).
    """
    if flow_downscale <= 0:
        return 2 if min(h, w) >= 512 else 1
    return flow_downscale


def _rss_mb() -> float:
    """Resident set size in MB (reference: pipeline.py:481-496)."""
    try:
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    except Exception:
        return -1.0


# ---------------------------------------------------------------------------
# Mask loading (reference: pipeline.py:284-353)
# ---------------------------------------------------------------------------


def load_mask_fit(
    mask_path: str,
    target_hw: tuple[int, int],
    invert: bool,
    feather_px: int,
    autofix: bool = True,
    force_transpose: bool = False,
) -> np.ndarray:
    """float32 HxWx1 alpha in [0,1]; transpose autofix by aspect-ratio
    closeness in log space (reference: pipeline.py:284-353)."""
    from PIL import Image

    H_tgt, W_tgt = target_hw
    m_img = Image.open(mask_path).convert("L")
    if force_transpose:
        m_img = m_img.transpose(Image.TRANSPOSE)
    mw, mh = m_img.size
    if autofix and not force_transpose and W_tgt != H_tgt:
        transpose = (mw, mh) == (H_tgt, W_tgt)
        if not transpose:
            def _dist(a, b):
                return abs(np.log(max(a, 1e-6)) - np.log(max(b, 1e-6)))

            ar_tgt = W_tgt / H_tgt
            ar_mask = mw / mh
            ar_swapped = H_tgt / W_tgt
            transpose = _dist(ar_mask, ar_swapped) + 1e-6 < _dist(ar_mask, ar_tgt)
        if transpose:
            print(f"[mask][autofix] {Path(mask_path).name}: applying transpose")
            m_img = m_img.transpose(Image.TRANSPOSE)
    m_img = m_img.resize((W_tgt, H_tgt), Image.Resampling.NEAREST)
    m = np.array(m_img, dtype=np.uint8)
    if invert:
        m = 255 - m
    if feather_px and feather_px > 0:
        try:
            import cv2

            m = cv2.GaussianBlur(m, (0, 0), sigmaX=feather_px * 0.5, sigmaY=feather_px * 0.5)
        except ImportError:
            import jax.numpy as jnp

            from ..ops.blur import gaussian_blur

            m = np.asarray(gaussian_blur(jnp.asarray(m.astype(np.float32)), feather_px * 0.5)).astype(np.uint8)
    return (m.astype(np.float32) / 255.0)[..., None]


# ---------------------------------------------------------------------------
# Weight parsing (reference: pipeline.py:502-521)
# ---------------------------------------------------------------------------


def parse_blend_weights(weights_str: str | None, num_models: int) -> list[float]:
    if not weights_str:
        return [1.0 / num_models] * num_models
    weights = [float(w) for w in weights_str.split(",")]
    if len(weights) != num_models:
        raise ValueError(f"Expected {num_models} weights, got {len(weights)}")
    if abs(sum(weights) - 1.0) > 1e-6:
        raise ValueError(f"Weights must sum to 1.0, got {sum(weights):.6f}")
    return weights


def parse_lab_weights(weights_str: str | None) -> tuple[float, float]:
    if not weights_str:
        return 0.5, 0.5
    wL, wab = [float(w) for w in weights_str.split(",")]
    if abs(wL + wab - 1.0) > 1e-6:
        raise ValueError(f"LAB weights must sum to 1.0, got {wL + wab:.6f}")
    return wL, wab


def preflight_mask_dir(args, frame_files) -> None:
    """Validate --mask_dir before styling: all-missing is a hard error,
    some-missing a warning (reference: pipeline.py:1042-1062)."""
    if not getattr(args, "mask_dir", None) or getattr(args, "mask", None):
        return
    try:
        md = Path(args.mask_dir)
        missing = []
        for p in frame_files:
            stem_num = p.stem.split("_")[-1]
            if not (md / f"mask_{stem_num}.png").exists():
                missing.append(p.name)
        total = len(frame_files)
        if total > 0 and len(missing) == total:
            print(f"[mask][ERROR] --mask_dir set to {md} but no masks like mask_0001.png were found.")
            print("               Refusing to run unmasked; generate masks or remove --mask_dir.")
            sys.exit(2)
        elif missing:
            print(f"[mask][WARN] {len(missing)}/{total} mask(s) missing under {md}.")
            print("            Missing-mask frames will be fully stylized unless a global --mask is provided.")
    except SystemExit:
        raise
    except Exception as e:
        print(f"[mask][WARN] could not validate --mask_dir: {e}")


def list_frame_files(args, frames_dir: Path):
    """Frame discovery + stride/max_frames selection (reference:
    pipeline.py:1019-1025)."""
    frame_files = sorted(
        list(frames_dir.glob("frame_*.png"))
        + list(frames_dir.glob("frame_*.jpg"))
        + list(frames_dir.glob("frame_*.jpeg"))
    )
    frame_files = frame_files[:: max(1, args.stride)]
    if args.max_frames:
        frame_files = frame_files[: args.max_frames]
    if not frame_files:
        print(f"[error] no frames found in {frames_dir}")
        sys.exit(2)
    return frame_files


def _mask_debug_dump(args, frames_dir, idx: int, alpha: np.ndarray, base_u8: np.ndarray):
    """Fitted-alpha PNG + red overlay JPEG debug artifacts
    (reference: pipeline.py:2017-2025, 2055-2070)."""
    from PIL import Image as _Image

    debug_dir = frames_dir.parent / "debug"
    debug_dir.mkdir(parents=True, exist_ok=True)
    if args.mask_debug_alpha:
        _Image.fromarray((alpha[..., 0] * 255).astype(np.uint8)).save(
            debug_dir / f"alpha_{idx:04d}.png"
        )
    if args.mask_debug_overlay:
        tint = np.zeros_like(base_u8)
        tint[..., 0] = 255
        a3 = np.repeat(alpha, 3, axis=2)
        overlay = (base_u8 * (1.0 - 0.35 * a3) + tint * (0.35 * a3)).clip(0, 255).astype(np.uint8)
        _Image.fromarray(overlay).save(debug_dir / f"overlay_{idx:04d}.jpg", quality=92)


# ---------------------------------------------------------------------------
# Slot bank
# ---------------------------------------------------------------------------


def _load_slot(path: str | None, model_type: str, io_preset: str, magenta_style: str | None, args):
    """Load one model slot; returns StyleModel or None."""
    from . import stylizer as st

    if not path and model_type != "magenta":
        return None
    if model_type == "magenta":
        if not magenta_style:
            return None
        from ..models.magenta_stub import load_magenta_slot

        return load_magenta_slot(magenta_style, args)
    p = Path(path)
    if p.suffix.lower() == ".t7" or model_type == "torch7":
        from ..io.t7 import load_torch7_model

        return load_torch7_model(str(p), io_preset)
    return st.load_model(p, model_type=model_type, io_preset=io_preset)


def load_slot_bank(args) -> list:
    """Slots A..H (reference: pipeline.py:571-1008). Slot A is required."""
    slots = []
    a_path = args.model
    a_type = args.model_type
    if a_path and Path(a_path).suffix.lower() == ".t7" and a_type != "magenta":
        a_type = "torch7"  # auto-switch (reference: pipeline.py:2513-2516)
    slots.append(_load_slot(a_path, a_type, args.io_preset, args.magenta_style, args))
    for letter in _LETTERS[1:]:
        slots.append(
            _load_slot(
                getattr(args, f"model_{letter}"),
                getattr(args, f"model_{letter}_type"),
                getattr(args, f"io_preset_{letter}"),
                getattr(args, f"magenta_style_{letter}"),
                args,
            )
        )
    return [s for s in slots if s is not None]


# ---------------------------------------------------------------------------
# Batched video path
# ---------------------------------------------------------------------------


def _make_batched_core(args, frames_dir: Path):
    """The jitted per-batch compute pipeline shared by the file-driven
    batched path and the streaming video path: slot-bank stylize →
    region/mask composite → temporal chain, with uint8 device transfers.

    Returns (B, process_batch) where
    ``process_batch(imgs: list[np.uint8 HWC], names: list[Path], b0) ->
    device uint8 [B,H,W,3]`` (temporal state carries across calls).
    """
    import jax
    import jax.numpy as jnp

    from .. import config as nconfig
    from ..ops.color import rgb_to_gray
    from ..ops.flow import farneback_flow
    from ..ops.resize import resize_bilinear
    from ..temporal.ema import TemporalState, temporal_postprocess_scan
    from . import stylizer as st

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if dtype == jnp.bfloat16:
        nconfig.set_conv_precision("default")

    models = load_slot_bank(args)
    num_models = len(models)
    print(f"[bank] {num_models} slot(s): " + ", ".join(f"{m.name}({m.arch}/{m.io_preset})" for m in models))

    mesh = None
    n_mesh = int(getattr(args, "mesh_devices", 0) or 0)
    if n_mesh > 1:
        avail = len(jax.devices())
        if n_mesh > avail:
            print(f"[mesh] only {avail} device(s) visible; clamping --mesh_devices {n_mesh} -> {avail}")
            n_mesh = avail
        if n_mesh > 1:
            from ..parallel.mesh import make_mesh

            if int(args.frame_batch) % n_mesh != 0:
                new_b = ((int(args.frame_batch) + n_mesh - 1) // n_mesh) * n_mesh
                print(f"[mesh] rounding --frame_batch {args.frame_batch} -> {new_b} (multiple of {n_mesh})")
                args.frame_batch = new_b
            mesh = make_mesh(n_mesh)
            print(f"[mesh] data-parallel stylize over {n_mesh} device(s)")
    stylize_fns = [st.jit_stylizer(m, dtype=dtype, mesh=mesh,
                                   quantize=args.quantize) for m in models]
    use_lab_blend = args.blend_models_lab and num_models > 1
    weights = (
        parse_blend_weights(args.blend_models_weights, num_models)
        if (num_models > 1 and not use_lab_blend)
        else [1.0]
    )

    # Region config, parsed once like the per-frame path.
    region_active = bool(args.region_mode)
    morph_anim = blend_anims = scale_anims = region_sizes = region_seed = None
    if region_active:
        from ..region import (
            parse_morph_animation,
            parse_region_blend_animations,
            parse_region_scale_animations,
            parse_region_sizes,
        )

        morph_anim = parse_morph_animation(args.region_morph) if args.region_morph else None
        blend_anims = (
            parse_region_blend_animations(args.blend_animate_regions or args.blend_animate,
                                          args.region_count or num_models)
            if (args.blend_animate or args.blend_animate_regions)
            else None
        )
        scale_anims = (
            parse_region_scale_animations(args.scale_animate_regions or args.scale_animate,
                                          args.region_count or num_models)
            if (args.scale_animate or args.scale_animate_regions)
            else None
        )
        region_sizes = (
            parse_region_sizes(args.region_sizes, args.region_count or num_models)
            if args.region_sizes
            else None
        )
        region_seed = _parse_region_seed(args, morph_anim)

    mask_active = bool(args.mask or args.mask_dir)
    composite_keep = args.composite_mode == "keep"
    _mask_alpha_cache: dict = {}  # constant --mask reloads once per shape

    def _frame_alpha(frame_path, H0, W0):
        """(alpha HxWx1 f32, has) for one frame — same loader/fallbacks as the
        per-frame path (reference: pipeline.py:1982-2048)."""
        mask_file = args.mask
        if not mask_file and args.mask_dir:
            stem_num = frame_path.stem.split("_")[-1]
            cand = Path(args.mask_dir) / f"mask_{stem_num}.png"
            mask_file = str(cand) if cand.exists() else None
        if not mask_file:
            return np.zeros((H0, W0, 1), np.float32), False
        feather_px = args.mask_feather
        if args.mask_feather_pct > 0:
            feather_px = max(feather_px, int(H0 * args.mask_feather_pct / 100.0))
        key = (mask_file, H0, W0)
        if key in _mask_alpha_cache:
            return _mask_alpha_cache[key], True
        alpha = load_mask_fit(
            mask_file, (H0, W0), args.mask_invert, feather_px,
            autofix=args.mask_autofix,
            force_transpose=args.mask_force_transpose,
        )
        if mask_file == args.mask:  # constant mask: load once per shape
            _mask_alpha_cache[key] = alpha
        return alpha, True

    B = max(1, int(args.frame_batch))
    if args.flow_method == "dis":
        from ..ops.dis_flow import dis_flow as _flow_fn
    else:
        _flow_fn = farneback_flow
    flow_pairs = jax.jit(jax.vmap(partial(_flow_fn)))
    flow_ds_arg = int(args.flow_downscale)

    @jax.jit
    def blend_batch(outs_stacked):
        """RGB weighted or LAB blend across slots ([M,B,H,W,C] → [B,H,W,C])."""
        if use_lab_blend:
            from ..ops.color import lab_u8_to_rgb, rgb_to_lab_u8

            wL, wab = parse_lab_weights(args.blend_models_lab_weights)
            try:
                w_rest = parse_blend_weights(args.blend_models_weights, num_models - 1)
            except Exception:
                w_rest = [1.0 / (num_models - 1)] * (num_models - 1)
            lab_a = rgb_to_lab_u8(outs_stacked[0])
            lab_rest = rgb_to_lab_u8(outs_stacked[1:])
            wr = jnp.asarray(w_rest, jnp.float32)[:, None, None, None]
            a_mix = jnp.sum(wr * lab_rest[..., 1], axis=0)
            b_mix = jnp.sum(wr * lab_rest[..., 2], axis=0)
            lab_mix = jnp.stack(
                [
                    lab_a[..., 0],
                    jnp.clip(wL * lab_a[..., 1] + wab * a_mix, 0, 255),
                    jnp.clip(wL * lab_a[..., 2] + wab * b_mix, 0, 255),
                ],
                axis=-1,
            )
            return lab_u8_to_rgb(lab_mix)
        w = jnp.asarray(weights, jnp.float32)[:, None, None, None, None]
        return jnp.clip(jnp.sum(w * outs_stacked, axis=0), 0.0, 1.0)

    scan_kwargs = dict(
        flow_ema=args.flow_ema, flow_alpha=args.flow_alpha,
        smooth_lightness=args.smooth_lightness, smooth_chroma=args.smooth_chroma,
        smooth_alpha=args.smooth_alpha, chroma_alpha=args.chroma_alpha,
        motion_blend=args.motion_blend, blend=args.blend,
        composite_keep=composite_keep,
        fast_warp=not getattr(args, "exact_warp", False),
    )

    @partial(jax.jit, static_argnames=("first",))
    def batch_post(styled, orig, grays, prev_gray, state: TemporalState, first: bool,
                   mask_alphas=None, mask_has=None):
        flows = None
        if args.flow_ema:
            # Computed globally (frame t-1 → t for every t, previous batch's
            # boundary included) so the sharded chunk seams warp with the
            # true cross-boundary flow.
            prevs = jnp.concatenate([prev_gray[None], grays[:-1]], 0)
            H, W = grays.shape[1], grays.shape[2]
            flow_ds = effective_flow_downscale(flow_ds_arg, H, W)
            if flow_ds > 1:
                hs, ws = H // flow_ds, W // flow_ds
                f_small = flow_pairs(
                    resize_bilinear(prevs[..., None], (hs, ws))[..., 0],
                    resize_bilinear(grays[..., None], (hs, ws))[..., 0],
                )
                flows = resize_bilinear(f_small, (H, W)) * float(flow_ds)
            else:
                flows = flow_pairs(prevs, grays)
        if mesh is not None:
            # Chunked temporal stage over the ICI ring: each shard scans its
            # local chunk, boundary frames travel via ppermute
            # (parallel.mesh.temporal_postprocess_sharded).
            from ..parallel.mesh import temporal_postprocess_sharded

            if flows is None:
                flows = jnp.zeros(styled.shape[:3] + (2,), jnp.float32)
            out, new_state = temporal_postprocess_sharded(
                mesh, styled, orig, flows, state=state, first=first,
                mask_alphas=mask_alphas, mask_has=mask_has, **scan_kwargs,
            )
        else:
            out, new_state = temporal_postprocess_scan(
                styled, orig, flows,
                init=None if first else state,
                mask_alphas=mask_alphas, mask_has=mask_has,
                **scan_kwargs,
            )
        return out, new_state, grays[-1]

    # uint8 host<->device transfers: frames cross the PCIe/relay link as u8
    # (4x less than f32) and convert on device; the output clip*255 truncation
    # happens on device too — identical math to the previous host-side
    # conversion, but the transfer and the host cast shrink 4x.
    _to01 = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)
    _tou8 = jax.jit(lambda o: (jnp.clip(o, 0.0, 1.0) * 255.0)
                    .astype(jnp.uint8))
    _jgray = jax.jit(lambda x: rgb_to_gray(x * 255.0))

    carry = {"state": None, "prev_gray": None, "infer_hw": None}

    def process_batch(imgs: list, names: list, b0: int):
        n_real = len(imgs)
        imgs = list(imgs)
        while len(imgs) < B:  # pad final batch, outputs ignored
            imgs.append(imgs[-1])
        orig = _to01(jnp.asarray(np.stack(imgs, 0)))
        H0, W0 = int(orig.shape[1]), int(orig.shape[2])
        grays = _jgray(orig)

        src = orig
        if args.inference_res and max(H0, W0) > args.inference_res:
            if carry["infer_hw"] is None:
                s = args.inference_res / max(H0, W0)
                carry["infer_hw"] = (int(round(H0 * s)), int(round(W0 * s)))
            src = resize_bilinear(orig, carry["infer_hw"])

        outs = [fn(src) for fn in stylize_fns]
        # lock to content size (reference: pipeline.py:1514-1518)
        outs = [
            o if o.shape[1:3] == (H0, W0) else resize_bilinear(o, (H0, W0)) for o in outs
        ]
        if region_active:
            # Region composite per frame against the batched slot outputs —
            # the identical host mask generation/animation as the per-frame
            # path (same caches, same RNG call order), einsum composite
            # in-graph. Padded tail frames reuse the last real frame so the
            # mask RNG stream matches the per-frame path exactly.
            from ..region import blend_by_regions, blend_by_regions_advanced

            styled_frames = []
            for i in range(B):
                if i >= n_real:
                    styled_frames.append(styled_frames[-1])
                    continue
                styled_frames.append(_region_blend(
                    args, [o[i] for o in outs], orig[i], H0, W0, b0 + i + 1,
                    num_models, region_seed, morph_anim, blend_anims,
                    blend_by_regions, blend_by_regions_advanced,
                    scale_anims=scale_anims, region_sizes=region_sizes,
                ))
            styled = jnp.stack(styled_frames, 0)
        else:
            styled = blend_batch(jnp.stack(outs, 0))

        m_alphas = m_has = None
        if mask_active:
            alphas_np = np.zeros((B, H0, W0, 1), np.float32)
            has_np = np.zeros((B,), bool)
            for i in range(n_real):
                alphas_np[i], has_np[i] = _frame_alpha(names[i], H0, W0)
                if has_np[i] and (args.mask_debug_alpha or args.mask_debug_overlay):
                    _mask_debug_dump(args, frames_dir, b0 + i + 1,
                                     alphas_np[i], imgs[i])
            m_alphas = jnp.asarray(alphas_np)
            m_has = jnp.asarray(has_np)

        first = carry["state"] is None
        if first:
            carry["state"] = TemporalState(
                jnp.zeros((H0, W0, 3), jnp.float32), jnp.zeros((H0, W0, 3), jnp.float32)
            )
            carry["prev_gray"] = grays[0]
        out, carry["state"], carry["prev_gray"] = batch_post(
            styled, orig, grays, carry["prev_gray"], carry["state"], first,
            m_alphas, m_has)
        return _tou8(out)

    return B, process_batch


def style_frames_batched(args, frames_dir: Path, image_mode: bool, save_map: dict[int, str]):
    """Process frames in device batches: one jitted stylize per batch and the
    whole temporal chain (flow EMA / LAB EMA / mask composite / motion blend)
    as an in-graph scan (temporal.temporal_postprocess_scan). State carries
    across batches.

    Region blending (--region_mode) and mask compositing (--mask/--mask_dir)
    ride this path too: region masks are host-generated per frame exactly as
    on the per-frame path (same caches/animations) and composited in-graph
    against the batched slot outputs; mask alphas stack per batch and
    composite inside the temporal scan at the reference's position in the
    chain (pipeline.py:1982-2048). Only the crop-based --region_optimize
    stays per-frame (it deliberately avoids full-frame stylization).
    """
    from PIL import Image

    B, process_batch = _make_batched_core(args, frames_dir)
    frame_files = list_frame_files(args, frames_dir)
    preflight_mask_dir(args, frame_files)

    # C++ threaded decode prefetcher: staged frames carry no EXIF (the
    # engine strips it when staging / extraction writes clean files), so the
    # native path is exact; any unavailable/failed decode falls back to PIL.
    native_iter = None
    try:
        from ..io.native_loader import NativeFrameLoader

        native_iter = NativeFrameLoader(frame_files, threads=4,
                                        capacity=max(8, 2 * B))
        print(f"[batch] native frame loader active ({len(frame_files)} frames)")
    except Exception as e:
        print(f"[batch] native frame loader unavailable ({e}); using PIL")

    written = 0
    pending = None  # previous batch's (device u8, chunk, n, b0) — see _flush
    t_start = time.perf_counter()

    # One-batch pipelining: the u8 result stays a device array (jax dispatch
    # is async); the PREVIOUS batch's outputs are materialized and
    # JPEG-encoded while the device crunches this batch, so host IO rides
    # under device compute.
    def _flush(ent):
        out_dev, f_chunk, f_n, f_b0 = ent
        nonlocal written
        out_np = np.asarray(out_dev)
        for i in range(f_n):
            idx = f_b0 + i + 1
            frame_path = f_chunk[i]
            idx_str = frame_path.stem.split("_")[-1]
            save_as_jpg = args.image_ext.lower() == "jpg"
            if image_mode and idx in save_map:
                out_path = Path(save_map[idx])
                out_path.parent.mkdir(parents=True, exist_ok=True)
                save_as_jpg = out_path.suffix.lower() in (".jpg", ".jpeg")
            else:
                out_path = (
                    frames_dir / f"{args.output_prefix}_{idx_str}"
                ).with_suffix(".jpg" if save_as_jpg else ".png")
            img = Image.fromarray(out_np[i])
            if save_as_jpg:
                img.save(out_path, format="JPEG",
                         quality=int(args.jpeg_quality))
            else:
                img.save(out_path)
            written += 1
        done = min(f_b0 + B, len(frame_files))
        fps_now = done / max(1e-9, time.perf_counter() - t_start)
        print(f"[batch][{done}/{len(frame_files)}] {fps_now:.1f} "
              f"frames/s cumulative")

    for b0 in range(0, len(frame_files), B):
        chunk = frame_files[b0 : b0 + B]
        if native_iter is not None:
            imgs = [next(native_iter) for _ in chunk]
        else:
            imgs = [np.asarray(fio.load_image_exif_rgb(str(p)), np.uint8)
                    for p in chunk]
        out_dev = process_batch(imgs, chunk, b0)
        if pending is not None:
            _flush(pending)
        pending = (out_dev, chunk, len(chunk), b0)
    if pending is not None:
        _flush(pending)
    if native_iter is not None:
        native_iter.close()
    return written, len(frame_files)


def style_video_stream(args, frames_dir: Path):
    """Streaming video path: decode → device batches → encode, NO frame
    files. Decode and encode ride background threads (io/frames
    VideoFrameStream / VideoStreamWriter) so host video IO overlaps device
    compute; the result is identical to extract → batched style → assemble
    with the OpenCV toolchain (same fps-filter select, same scale math, same
    output-clock resample), minus the per-frame image round trips — which
    measured 0.6 fps e2e at 1080p against 115 fps device-side (BENCH r3).
    Reference flow being replaced: pipeline.py:384-419 → 1444-1486 →
    2128-2150.

    Returns (written_frames, streamed_frames, src_fps).
    """
    B, process_batch = _make_batched_core(args, frames_dir)

    extract_fps = args.pre_fps or args.fps
    canvas_wh = None
    if args.canvas:
        cw, ch = args.canvas.lower().split("x")
        canvas_wh = (int(cw), int(ch))
    stream = fio.VideoFrameStream(
        Path(args.input_video).resolve(), fps=extract_fps, scale=args.scale,
        canvas_wh=canvas_wh, max_frames=args.max_frames,
    )
    framerate_in = float(args.pre_fps or args.fps or stream.src_fps or 24)
    fps_out = float(args.fps) if (args.pre_fps and args.fps) else None
    writer = fio.VideoStreamWriter(
        Path(args.output_video).resolve(), framerate_in, fps_out,
    )
    est = stream.estimated_frames
    if args.mask_dir:
        # Index-based preflight (no frame files exist on this path).
        md = Path(args.mask_dir)
        if est and not any(
            (md / f"mask_{i:04d}.png").exists() for i in range(1, est + 1)
        ):
            print(f"[mask][WARN] no mask_NNNN.png files in {md} match frames "
                  f"1..{est}; frames without masks pass through fully styled.")

    t_start = time.perf_counter()
    streamed = 0
    pending = None  # (device u8, n_real)

    def _flush(ent):
        out_dev, f_n = ent
        out_np = np.asarray(out_dev)
        for i in range(f_n):
            writer.write(out_np[i])
        fps_now = streamed / max(1e-9, time.perf_counter() - t_start)
        total = f"/{est}" if est else ""
        print(f"[stream][{streamed}{total}] {fps_now:.1f} frames/s cumulative")

    batch_imgs: list = []
    it = iter(stream)
    while True:
        frame = next(it, None)
        if frame is not None:
            batch_imgs.append(frame)
            if len(batch_imgs) < B:
                continue
        if not batch_imgs:
            break
        b0 = streamed
        names = [Path(f"frame_{b0 + i + 1:04d}.png")
                 for i in range(len(batch_imgs))]
        out_dev = process_batch(batch_imgs, names, b0)
        streamed += len(batch_imgs)
        if pending is not None:
            _flush(pending)
        pending = (out_dev, len(batch_imgs))
        batch_imgs = []
        if frame is None:
            break
    if pending is not None:
        _flush(pending)
    written = writer.close()
    return written, streamed, stream.src_fps


# ---------------------------------------------------------------------------
# The styling loop
# ---------------------------------------------------------------------------


def style_frames(args, frames_dir: Path, image_mode: bool, save_map: dict[int, str]):
    import jax
    import jax.numpy as jnp

    from .. import config as nconfig
    from ..ops.color import lab_u8_to_rgb, rgb_to_gray, rgb_to_lab_u8
    from ..ops.flow import farneback_flow
    from ..ops.resize import resize_bilinear
    from ..region import (
        blend_by_regions,
        blend_by_regions_advanced,
        parse_blend_animation,
        parse_morph_animation,
        parse_region_blend_animations,
        parse_region_scale_animations,
        parse_region_sizes,
    )
    from ..temporal.ema import flow_ema_fuse, motion_adaptive_blend, uniform_blend
    from . import stylizer as st

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if dtype == jnp.bfloat16:
        nconfig.set_conv_precision("default")

    models = load_slot_bank(args)
    if not models:
        print("[error] no models loaded")
        sys.exit(2)
    num_models = len(models)
    print(f"[bank] {num_models} slot(s): " + ", ".join(f"{m.name}({m.arch}/{m.io_preset})" for m in models))

    stylize_fns = [st.jit_stylizer(m, dtype=dtype,
                                   quantize=args.quantize) for m in models]

    ext = args.image_ext
    frame_files = list_frame_files(args, frames_dir)
    preflight_mask_dir(args, frame_files)

    # Region/morph config (parsed once)
    morph_anim = parse_morph_animation(args.region_morph) if args.region_morph else None
    blend_anims = (
        parse_region_blend_animations(args.blend_animate_regions or args.blend_animate,
                                      args.region_count or num_models)
        if (args.blend_animate or args.blend_animate_regions)
        else None
    )
    # --scale_animate(_regions) animates per-region render scale
    # (reference: pipeline.py:1228-1240, applied at 1313-1315).
    scale_anims = (
        parse_region_scale_animations(args.scale_animate_regions or args.scale_animate,
                                      args.region_count or num_models)
        if (args.scale_animate or args.scale_animate_regions)
        else None
    )
    # --region_sizes weights the voronoi cells (reference: pipeline.py:1167-1170).
    region_sizes = (
        parse_region_sizes(args.region_sizes, args.region_count or num_models)
        if args.region_sizes
        else None
    )
    region_seed = _parse_region_seed(args, morph_anim)

    # Jitted post-processing pieces (closed over static config).
    smooth_lightness, smooth_chroma = args.smooth_lightness, args.smooth_chroma
    use_lab = smooth_lightness or smooth_chroma

    @jax.jit
    def lab_ema(out01, prev_lab, have_prev):
        lab = rgb_to_lab_u8(out01)
        prev = jnp.where(have_prev, prev_lab, lab)
        a_l = args.smooth_alpha if smooth_lightness else 1.0
        a_c = args.chroma_alpha if smooth_chroma else 1.0
        alphas = jnp.array([a_l, a_c, a_c], jnp.float32)
        sm = alphas * lab + (1.0 - alphas) * prev
        return lab_u8_to_rgb(jnp.clip(sm, 0.0, 255.0)), sm

    @jax.jit
    def mask_composite(out01, orig01, alpha):
        # keep = stylize masked region; replace = stylize unmasked
        # (reference: pipeline.py:2040-2043)
        if args.composite_mode == "keep":
            return out01 * alpha + orig01 * (1.0 - alpha)
        return orig01 * alpha + out01 * (1.0 - alpha)

    if args.flow_method == "dis":
        from ..ops.dis_flow import dis_flow

        jit_flow = jax.jit(partial(dis_flow))
    else:
        jit_flow = jax.jit(partial(farneback_flow))
    jit_flow_fuse = jax.jit(partial(flow_ema_fuse, alpha=args.flow_alpha))
    jit_motion = jax.jit(partial(motion_adaptive_blend, blend=args.blend))
    jit_uniform = jax.jit(partial(uniform_blend, blend=args.blend))
    jit_gray = jax.jit(lambda x: rgb_to_gray(x * 255.0))

    # Temporal caches (reference: pipeline.py:1064-1071)
    prev_gray = None
    prev_styled01 = None
    prev_lab = None
    have_prev_lab = False
    last_flow = None
    prev_frame_size = None

    written = 0
    for idx, frame_path in enumerate(frame_files, start=1):
        t0 = time.perf_counter()
        pil = fio.load_image_exif_rgb(str(frame_path))
        x_orig = np.asarray(pil, np.float32) / 255.0
        H0, W0 = x_orig.shape[:2]

        # optional inference downscale (reference: pipeline.py:1089-1097)
        x_src = x_orig
        if args.inference_res and max(H0, W0) > args.inference_res:
            s = args.inference_res / max(H0, W0)
            nh, nw = int(round(H0 * s)), int(round(W0 * s))
            x_src = np.asarray(resize_bilinear(jnp.asarray(x_orig), (nh, nw)))

        # size change resets temporal caches (reference: pipeline.py:1104-1113)
        if prev_frame_size != (H0, W0):
            prev_gray = prev_styled01 = prev_lab = last_flow = None
            have_prev_lab = False
            prev_frame_size = (H0, W0)

        x01 = jnp.asarray(x_src)[None]
        x_orig_j = jnp.asarray(x_orig)

        # --- stylize all slots; a failed slot retries at half resolution,
        # then falls back to the original frame (reference: half-res retry at
        # pipeline.py:1429-1442, original-frame fallback at 1618-1621).
        # The crop-optimized region path skips full-frame forwards entirely
        # and styles per-region crops instead (reference: pipeline.py:1124). ---
        crop_optimized = bool(args.region_mode and args.region_optimize)
        outputs = []
        for si, fn in enumerate(stylize_fns if not crop_optimized else []):
            try:
                outputs.append(fn(x01)[0])
            except Exception as e:
                print(f"[slot][{chr(65 + si)}][ERROR] forward failed "
                      f"({type(e).__name__}: {e}) — retrying at half-size")
                try:
                    h2, w2 = max(1, x01.shape[1] // 2), max(1, x01.shape[2] // 2)
                    y_small = fn(resize_bilinear(x01, (h2, w2)))[0]
                    outputs.append(resize_bilinear(y_small, (x01.shape[1], x01.shape[2])))
                    print(f"[slot][{chr(65 + si)}] retry succeeded at half-size")
                except Exception as e2:
                    print(f"[slot][{chr(65 + si)}][FALLBACK] second attempt failed "
                          f"({type(e2).__name__}: {e2}); using original frame")
                    outputs.append(jnp.asarray(x_src))
        # lock to content size (reference: pipeline.py:1514-1518)
        outputs = [
            o if o.shape[:2] == (H0, W0) else resize_bilinear(o, (H0, W0)) for o in outputs
        ]

        # First-2-frame debug dumps of slot A + input (reference:
        # pipeline.py:1499-1510).
        if idx <= 2 and not image_mode and outputs:
            try:
                from PIL import Image as _Image

                debug_dir = frames_dir.parent / "debug"
                debug_dir.mkdir(parents=True, exist_ok=True)
                a_u8 = (np.clip(np.asarray(outputs[0]), 0, 1) * 255).astype(np.uint8)
                _Image.fromarray(a_u8).save(debug_dir / f"A_out_{idx:04d}.jpg", quality=92)
                in_u8 = (np.clip(x_orig, 0, 1) * 255).astype(np.uint8)
                _Image.fromarray(in_u8).save(debug_dir / f"IN_{idx:04d}.jpg", quality=92)
                print(f"[debug] wrote {debug_dir}/A_out_{idx:04d}.jpg and IN_{idx:04d}.jpg")
            except Exception as e:
                print(f"[debug][WARN] could not save A debug frames: {e}")

        # --- blend across models ---
        if crop_optimized:
            out01 = jnp.asarray(_region_blend_optimized(
                args, stylize_fns, x_orig, H0, W0, idx, num_models,
                region_seed, morph_anim, blend_anims, scale_anims, region_sizes,
            ))
        elif num_models == 1 and not args.region_mode:
            out01 = outputs[0]
        elif args.region_mode:
            out01 = _region_blend(
                args, outputs, x_orig_j, H0, W0, idx, num_models, region_seed, morph_anim,
                blend_anims, blend_by_regions, blend_by_regions_advanced,
                scale_anims=scale_anims, region_sizes=region_sizes,
            )
        elif args.blend_models_lab:
            out01 = _lab_blend(args, outputs, num_models, rgb_to_lab_u8, lab_u8_to_rgb, jnp)
        else:
            weights = parse_blend_weights(args.blend_models_weights, num_models)
            acc = outputs[0] * weights[0]
            for o, w in zip(outputs[1:], weights[1:]):
                acc = acc + o * w
            out01 = jnp.clip(acc, 0.0, 1.0)

        # --- flow-guided EMA (reference: pipeline.py:1884-1940) ---
        gray = jit_gray(x_orig_j)
        flow = None
        if args.flow_ema and prev_gray is not None and prev_styled01 is not None:
            ds = effective_flow_downscale(int(args.flow_downscale), H0, W0)
            if ds > 1:
                g_small = resize_bilinear(gray[..., None], (H0 // ds, W0 // ds))[..., 0]
                pg_small = resize_bilinear(prev_gray[..., None], (H0 // ds, W0 // ds))[..., 0]
            else:
                g_small, pg_small = gray, prev_gray
            flow_small = jit_flow(pg_small, g_small)
            if ds > 1:
                flow = resize_bilinear(flow_small, (H0, W0)) * float(ds)
            else:
                flow = flow_small
            out01 = jit_flow_fuse(out01, prev_styled01, flow)
            last_flow = flow
        else:
            last_flow = None
        prev_gray = gray
        prev_styled01 = out01

        # --- LAB EMA (reference: pipeline.py:1942-1978) ---
        if use_lab:
            if prev_lab is None:
                prev_lab = jnp.zeros((H0, W0, 3), jnp.float32)
                have_prev_lab = False
            out01, prev_lab = lab_ema(out01, prev_lab, jnp.asarray(have_prev_lab))
            have_prev_lab = True

        # --- mask composite (reference: pipeline.py:1982-2048) ---
        mask_used = False
        mask_file = args.mask
        if not mask_file and args.mask_dir:
            stem_num = frame_path.stem.split("_")[-1]
            cand = Path(args.mask_dir) / f"mask_{stem_num}.png"
            if cand.exists():
                mask_file = str(cand)
        if mask_file:
            # --fit_mask_to output aligns the mask to the stylized frame's
            # dims instead of the input's (reference: pipeline.py:1997-2005;
            # identical here unless a slot changed the output size).
            if args.fit_mask_to == "output":
                ref_H, ref_W = int(out01.shape[0]), int(out01.shape[1])
            else:
                ref_H, ref_W = H0, W0
            feather_px = args.mask_feather
            if args.mask_feather_pct > 0:
                feather_px = max(feather_px, int(ref_H * args.mask_feather_pct / 100.0))
            alpha = load_mask_fit(
                mask_file, (ref_H, ref_W), args.mask_invert, feather_px,
                autofix=args.mask_autofix, force_transpose=args.mask_force_transpose,
            )
            out01 = mask_composite(out01, x_orig_j, jnp.asarray(alpha))
            mask_used = True
            if args.mask_debug_alpha or args.mask_debug_overlay:
                base_u8 = (np.asarray(x_orig_j) * 255).clip(0, 255).astype(np.uint8)
                _mask_debug_dump(args, frames_dir, idx, alpha, base_u8)

        # --- motion-adaptive / uniform blend (reference: pipeline.py:2072-2092) ---
        if args.motion_blend and last_flow is not None and not mask_used:
            out01 = jit_motion(out01, x_orig_j, last_flow)
        else:
            out01 = jit_uniform(out01, x_orig_j)

        # --- save ---
        out_np = np.asarray(out01)
        from PIL import Image

        out_img = Image.fromarray((np.clip(out_np, 0, 1) * 255).astype(np.uint8))
        save_as_jpg = ext.lower() == "jpg"
        if image_mode and idx in save_map:
            out_path = Path(save_map[idx])
            out_path.parent.mkdir(parents=True, exist_ok=True)
            save_as_jpg = out_path.suffix.lower() in (".jpg", ".jpeg")
        else:
            idx_str = frame_path.stem.split("_")[-1]
            out_path = (frames_dir / f"{args.output_prefix}_{idx_str}").with_suffix(
                ".jpg" if save_as_jpg else ".png"
            )
        if save_as_jpg:
            out_img.save(out_path, format="JPEG", quality=int(args.jpeg_quality))
        else:
            out_img.save(out_path)
        written += 1
        if idx == 1 or idx % 10 == 0:
            print(f"[frame][{idx}/{len(frame_files)}] dt={time.perf_counter() - t0:.3f}s "
                  f"rss={_rss_mb():.1f} MB -> {out_path.name}")
        gc.collect() if idx % 50 == 0 else None

    return written, len(frame_files)


def _parse_region_seed(args, morph_anim):
    """(reference: pipeline.py:1740-1754)"""
    seed_str = args.region_seed
    animating = args.region_rotate != 0 or (morph_anim and morph_anim.enabled)
    if seed_str is None:
        return 42 if animating else None
    if seed_str.lower() == "random":
        return None
    if seed_str.lower() == "fixed":
        return 42
    try:
        return int(seed_str)
    except ValueError:
        return None


# Static ladder the animated per-region scale snaps to (keeps every jitted
# shape fixed; the reference restyles each crop at the exact animated scale,
# pipeline.py:1313-1337, which would recompile per frame under XLA).
_SCALE_LADDER = (0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0)

# Cached (masks, configs) per video for the crop path, like the reference's
# args._region_cache (pipeline.py:1172-1190).
_crop_cache: dict = {}


def _region_blend_optimized(
    args, stylize_fns, x_orig, H0, W0, idx, num_models, region_seed,
    morph_anim, blend_anims, scale_anims, region_sizes,
):
    """Crop-optimized region styling: style only each region's padded crop
    (reference: pipeline.py:1124-1407 + region_blend.py:1954-2295). Crops
    pad to a static bucket ladder and batch per model so jitted shapes are
    reused; returns the composited HWC float01 numpy frame."""
    from ..ops.resize import resize_bilinear
    from ..region import (
        compute_animated_scale,
        feather_mask,
        generate_region_masks,
        parse_region_configs,
        rotate_all_masks,
        warp_all_masks_organic,
    )
    from ..region.crops import (
        composite_from_crops,
        compute_crop_coverage,
        models_needed_for_regions,
        prepare_region_crops,
        style_crop_batched,
    )

    region_count = args.region_count or num_models
    # crop mode defaults to a fixed seed for stable regions
    # (reference: pipeline.py:1149-1161)
    seed = 42 if region_seed is None and args.region_seed is None else region_seed
    sizes_key = tuple(region_sizes) if region_sizes else None
    cache_key = (H0, W0, args.region_mode, region_count, seed,
                 args.region_feather, sizes_key, args.region_blend_spec,
                 args.region_scales)
    if cache_key in _crop_cache:
        base_masks, configs = _crop_cache[cache_key]
    else:
        base_masks = generate_region_masks(
            H0, W0, args.region_mode, region_count, seed, args.region_feather,
            region_sizes=region_sizes,
        )
        configs = parse_region_configs(
            int(base_masks.shape[0]), num_models, args.region_assignment,
            args.region_blend_spec, args.region_scales, seed, args.region_original,
        )
        _crop_cache[cache_key] = (base_masks, configs)

    masks = base_masks
    if args.region_rotate != 0:
        masks = rotate_all_masks(masks, idx * args.region_rotate)
        masks = feather_mask(masks[..., None], args.region_feather // 2)[..., 0]
    if morph_anim and morph_anim.enabled:
        masks = warp_all_masks_organic(masks, morph_anim, idx)
        masks = feather_mask(masks[..., None], max(5, args.region_feather // 4))[..., 0]
    masks_np = np.asarray(masks)

    crops = prepare_region_crops(masks_np, configs, H0, W0, args.region_padding)
    needed = models_needed_for_regions(crops)
    if idx <= 2:
        cov = compute_crop_coverage(crops, H0, W0)
        print(f"[region-opt][{idx}] mode={args.region_mode} regions={len(crops)} "
              f"models_needed={needed} coverage={cov:.1%} "
              f"padding={args.region_padding}px")

    import jax.numpy as jnp

    styled: dict = {}
    for model_idx in needed:
        if model_idx >= len(stylize_fns):
            print(f"[region-opt][WARN] Model {model_idx} requested but not loaded, skipping")
            continue
        fn = stylize_fns[model_idx]
        regions = [c for c in crops if model_idx in c.config.model_indices]
        crop_px = []
        for c in regions:
            x1, y1, x2, y2 = c.padded_bbox
            px = x_orig[y1:y2, x1:x2]
            base_scale = c.config.scale
            if scale_anims:
                anim = scale_anims[c.region_idx % len(scale_anims)]
                s = compute_animated_scale(base_scale, idx, anim)
                base_scale = min(_SCALE_LADDER, key=lambda v: abs(v - s))
            if base_scale < 1.0:
                sh = max(1, int(px.shape[0] * base_scale))
                sw = max(1, int(px.shape[1] * base_scale))
                px = np.asarray(resize_bilinear(jnp.asarray(px), (sh, sw)))
            crop_px.append(px)
        outs = style_crop_batched(crop_px, fn)
        styled[model_idx] = {}
        for c, out in zip(regions, outs):
            x1, y1, x2, y2 = c.padded_bbox
            if out.shape[:2] != (y2 - y1, x2 - x1):
                out = np.asarray(resize_bilinear(jnp.asarray(out), (y2 - y1, x2 - x1)))
            styled[model_idx][c.region_idx] = out

    use_orig = (
        args.region_original > 0
        or (args.region_blend_spec and "O" in args.region_blend_spec.upper())
    )
    return composite_from_crops(
        styled, crops, x_orig if use_orig else None, H0, W0, masks_np,
        frame_idx=idx, blend_animations=blend_anims,
    )


def _region_blend(
    args, outputs, x_orig_j, H0, W0, idx, num_models, region_seed, morph_anim,
    blend_anims, blend_by_regions, blend_by_regions_advanced,
    scale_anims=None, region_sizes=None,
):
    """(reference: pipeline.py:1720-1838 full-frame, 1124-1407 crop path for
    region_sizes / scale animations)"""
    import jax.numpy as jnp

    from ..ops.resize import resize_bilinear
    from ..region import get_required_scales

    region_count = args.region_count or num_models
    weights = None
    if args.region_assignment == "weighted":
        try:
            weights = parse_blend_weights(args.blend_models_weights, num_models)
        except Exception:
            weights = None
    has_scale_anim = bool(scale_anims) and any(a.enabled for a in scale_anims)
    use_advanced = args.region_blend_spec or args.region_scales or has_scale_anim
    if use_advanced:
        required = get_required_scales(
            region_count, num_models, args.region_assignment,
            args.region_blend_spec, args.region_scales, region_seed, args.region_original,
        )
        if has_scale_anim:
            # Pre-render every ladder scale an animation can reach.
            for anim in scale_anims:
                if anim.enabled:
                    required.extend(
                        s for s in _SCALE_LADDER
                        if anim.min_scale - 1e-6 <= s <= anim.max_scale + 1e-6
                    )
            required = sorted(set(required))
        by_scale = {}
        for scale in required:
            if scale == 1.0:
                by_scale[1.0] = outputs
            else:
                sh, sw = int(H0 * scale), int(W0 * scale)
                by_scale[scale] = [resize_bilinear(o, (sh, sw)) for o in outputs]
        orig = (
            x_orig_j
            if args.region_original > 0
            or (args.region_blend_spec and "O" in args.region_blend_spec.upper())
            else None
        )
        return blend_by_regions_advanced(
            by_scale, H0, W0, mode=args.region_mode, region_count=region_count,
            assignment=args.region_assignment, blend_spec=args.region_blend_spec,
            scale_spec=args.region_scales, weights=weights, feather=args.region_feather,
            seed=region_seed, original=orig, original_chance=args.region_original,
            frame_idx=idx, rotation_rate=args.region_rotate, morph=morph_anim,
            blend_animations=blend_anims, scale_animations=scale_anims,
            region_sizes=region_sizes,
        )
    return blend_by_regions(
        outputs, H0, W0, mode=args.region_mode, region_count=region_count,
        assignment=args.region_assignment, weights=weights, feather=args.region_feather,
        seed=region_seed, original=x_orig_j if args.region_original > 0 else None,
        original_chance=args.region_original, frame_idx=idx,
        rotation_rate=args.region_rotate, morph=morph_anim,
        region_sizes=region_sizes,
    )


def _lab_blend(args, outputs, num_models, rgb_to_lab_u8, lab_u8_to_rgb, jnp):
    """L from A, a/b weighted from B.. (reference: pipeline.py:1841-1870)."""
    wL, wab = parse_lab_weights(args.blend_models_lab_weights)
    try:
        weights_rest = parse_blend_weights(args.blend_models_weights, max(num_models - 1, 1))
    except Exception:
        weights_rest = [1.0 / max(num_models - 1, 1)] * max(num_models - 1, 1)
    lab_a = rgb_to_lab_u8(outputs[0])
    a_mix = jnp.zeros_like(lab_a[..., 1])
    b_mix = jnp.zeros_like(lab_a[..., 2])
    for out, w in zip(outputs[1:], weights_rest):
        lab_o = rgb_to_lab_u8(out)
        a_mix = a_mix + w * lab_o[..., 1]
        b_mix = b_mix + w * lab_o[..., 2]
    lab_mix = jnp.stack(
        [
            lab_a[..., 0],
            jnp.clip(wL * lab_a[..., 1] + wab * a_mix, 0, 255),
            jnp.clip(wL * lab_a[..., 2] + wab * b_mix, 0, 255),
        ],
        axis=-1,
    )
    return lab_u8_to_rgb(lab_mix)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    from ..compile_cache import enable as _cc_enable
    _cc_enable()  # persistent XLA cache: repeat invocations compile warm
    args = build_arg_parser().parse_args(argv)
    if args.pattern is None:
        args.pattern = f"*.{args.image_ext}"

    image_mode_single = bool(args.input_image) and bool(args.output_image)
    image_mode_batch = bool(args.input_dir) and bool(args.output_dir)
    video_mode = bool(args.input_video) and bool(args.output_video)
    if (image_mode_single or image_mode_batch) and video_mode:
        print("Provide exactly one of: (input_video & output_video) OR (input_image & output_image) OR (input_dir & output_dir).")
        return 2
    if not (image_mode_single or image_mode_batch or video_mode):
        print("Specify (input_video & output_video) OR (input_image & output_image) OR (input_dir & output_dir).")
        return 2
    if args.model_type != "magenta" and not args.model:
        print("[error] --model is required unless --model_type magenta")
        return 2
    if args.model_type == "magenta" and not args.magenta_style:
        print("[magenta][ERROR] --magenta_style is required when --model_type magenta")
        return 2
    if image_mode_single or image_mode_batch:
        if args.motion_blend:
            print("[warn] --motion_blend ignored in image mode.")
            args.motion_blend = False
        if args.flow_ema:
            print("[warn] --flow_ema ignored in image mode.")
            args.flow_ema = False
    if args.region_optimize:
        print("[region-opt][note] --region_optimize: per-region crops are padded "
              "to a static bucket ladder and batched per model so jitted shapes "
              "are reused (the reference styles each crop at its exact size, "
              "pipeline.py:1293-1390, which would recompile per frame on TPU).")

    canvas_wh = None
    if args.canvas:
        cw, ch = args.canvas.lower().split("x")
        canvas_wh = (int(cw), int(ch))

    # Work-dir isolation (reference: pipeline.py:2476-2506)
    base_work_dir = Path(args.work_dir).resolve()
    if image_mode_single or image_mode_batch:
        work_dir = base_work_dir / f"job_{uuid.uuid4().hex[:8]}"
        print(f"[work_dir] Using isolated work directory: {work_dir}")
    else:
        work_dir = base_work_dir
    frames_dir = work_dir / "frames"
    frames_dir.mkdir(parents=True, exist_ok=True)

    def _purge(patterns):
        for pat in patterns:
            for p in frames_dir.glob(pat):
                p.unlink(missing_ok=True)

    if video_mode or image_mode_single:
        _purge(["frame_*.png", "frame_*.jpg", "frame_*.jpeg",
                "styled_frame_*.png", "styled_frame_*.jpg", "styled_frame_*.jpeg"])
    else:
        input_dir_path = Path(args.input_dir).resolve() if args.input_dir else None
        if input_dir_path and input_dir_path != frames_dir.resolve():
            _purge(["frame_*.png", "frame_*.jpg", "frame_*.jpeg"])
        _purge(["styled_frame_*.png", "styled_frame_*.jpg", "styled_frame_*.jpeg"])

    # Region-blended and mask-composited jobs ride the batched path too
    # (reference semantics: pipeline.py:1124-1407, 1982-2048). Only the
    # crop-based --region_optimize stays per-frame: it styles per-region
    # crops instead of full frames, which is its own batching scheme.
    use_batched = args.frame_batch > 1 and not (args.region_mode and args.region_optimize)
    # Streaming: plain video jobs skip the frame-file round trip entirely
    # (decode → device → encode; --stream off restores extract/assemble,
    # e.g. to keep the intermediate frames in the work dir).
    use_stream = (video_mode and use_batched
                  and args.stream != "off")

    save_map: dict[int, str] = {}
    src_fps = None
    if video_mode and use_stream:
        if args.pre_fps and args.fps:
            print(f"[note] --pre_fps set; frames streamed at pre_fps={args.pre_fps}, encoded at fps={args.fps}.")
    elif video_mode:
        input_video = Path(args.input_video).resolve()
        if args.pre_fps and args.fps:
            print(f"[note] --pre_fps set; frames extracted at pre_fps={args.pre_fps}, assembled at fps={args.fps}.")
        extract_fps = args.pre_fps or args.fps
        src_fps = fio.extract_frames(
            input_video, frames_dir, extract_fps, args.scale, args.image_ext,
            args.jpeg_quality, canvas_wh, args.max_frames,
        )
    elif image_mode_single:
        src = Path(args.input_image).resolve()
        dst = frames_dir / f"frame_0001{src.suffix.lower()}"
        pil = fio.load_image_exif_rgb(str(src))
        if src.suffix.lower() in (".jpg", ".jpeg"):
            pil.save(dst, format="JPEG", quality=max(1, min(95, args.jpeg_quality)))
        else:
            pil.save(dst)
        save_map[1] = str(Path(args.output_image).resolve())
    else:
        import glob as globmod
        import os

        in_files = sorted(globmod.glob(os.path.join(args.input_dir, args.pattern)))
        if not in_files:
            print(f"No files matched: {args.input_dir}/{args.pattern}")
            return 2
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
        for i, f in enumerate(in_files, start=1):
            src = Path(f).resolve()
            dst = frames_dir / f"frame_{i:04d}{src.suffix.lower()}"
            pil = fio.load_image_exif_rgb(str(src))
            if src.suffix.lower() in (".jpg", ".jpeg"):
                pil.save(dst, format="JPEG", quality=max(1, min(95, args.jpeg_quality)))
            else:
                pil.save(dst)
            base = src.stem
            out_ext = src.suffix.lower() if args.keep_ext else (".jpg" if args.image_ext == "jpg" else ".png")
            m = re.match(r"^frame_(\d+)$", base)
            out_stem = f"{args.output_prefix}_{m.group(1)}" if m else f"{base}{args.output_suffix or ''}"
            save_map[i] = str((Path(args.output_dir) / f"{out_stem}{out_ext}").resolve())

    if args.frame_batch > 1 and not use_batched:
        print("[note] --region_optimize styles per-region crop batches; the "
              "full-frame batched path does not apply.")
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
    try:
        if use_stream:
            written, planned, _sfps = style_video_stream(args, frames_dir)
        else:
            runner = style_frames_batched if use_batched else style_frames
            written, planned = runner(args, frames_dir, image_mode_single or image_mode_batch, save_map)
    finally:
        if args.profile_dir:
            import jax

            jax.profiler.stop_trace()
            print(f"[profile] trace written to {args.profile_dir}")
    print(f"[done] wrote {written}/{planned} styled frames")

    if video_mode and not use_stream:
        framerate_in = float(args.pre_fps or args.fps or src_fps or 24)
        fps_out = float(args.fps) if (args.pre_fps and args.fps) else None
        n = fio.assemble_video(frames_dir, Path(args.output_video).resolve(), framerate_in, fps_out)
        print(f"[assemble] {n} frames -> {args.output_video}")
    elif video_mode:
        print(f"[stream] encoded {written} frames -> {args.output_video}")

    # --clean_frames: drop extracted/styled frames after assembly
    # (reference: pipeline.py:2657-2661).
    if args.clean_frames:
        for pat in ("frame_*.png", "frame_*.jpg", "frame_*.jpeg",
                    "styled_frame_*.png", "styled_frame_*.jpg"):
            for p in frames_dir.glob(pat):
                p.unlink(missing_ok=True)
        print(f"[clean] removed frame files under {frames_dir}")

    if args.clean_work_dir and (image_mode_single or image_mode_batch):
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)
        print(f"[clean] removed {work_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
