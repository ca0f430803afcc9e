"""Fused masked stylization: segmentation mask + stylize + composite in ONE
XLA program (BASELINE config #4; reference flow: sky_swap.py:185-219 infers
the mask at inference resolution, run_sky_swap.sh:364-494 composites the
stylized frame through it).

The reference runs this as three host round trips (DeepLab forward, PIL
resize, numpy composite). On TPU the whole step is one jitted program — and
the mk44 trace showed the naive f32 form spends ~90% of its device time on
data movement (copy 69 ms + elementwise fusion 61 ms of 213 ms/B4 vs ~2 ms
of convolution): f32 resize matmuls at 1080p and layout copies at the
f32<->bf16 boundaries. ``compute_dtype=bfloat16`` (default) runs the
resizes, the DeepLab backbone, and the composite in bf16 — halves the HBM
traffic and keeps the MXU on its native path. Quality contract: the mask is
an argmax (only boundary pixels can flip — mk43 measures the disagreement
fraction) and the bf16 composite is exact to 2^-8 on [0,1] pixels, inside
BASELINE's 1e-2 budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_BN_KEYS = {"scale", "bias", "mean", "var"}


def cast_params(params, dtype):
    """Cast conv weights to ``dtype``; keep BN running stats f32.

    models/deeplab._bn folds its stats into a per-channel affine in f32
    and applies it in the activation dtype — feeding it bf16 stats would
    compute rsqrt(var) at bf16 precision for no speed gain (the [C]
    vectors are tiny)."""
    def walk(node):
        if isinstance(node, dict):
            return {
                k: (v if k in _BN_KEYS and not isinstance(v, (dict, list,
                                                              tuple))
                    else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        if hasattr(node, "astype") and jnp.issubdtype(node.dtype,
                                                      jnp.floating):
            return node.astype(dtype)
        return node

    return walk(params)


def make_masked_stylize_step(dl_params, style_params, out_hw,
                             *, infer_res: int = 513,
                             compute_dtype=jnp.bfloat16,
                             keep_fg: bool = True):
    """Return ``step(x01) -> composited01`` for NHWC f32/bf16 input at
    ``out_hw``: DeepLab mask at ``infer_res`` (non-background = alpha 1),
    bilinear alpha upsample, Johnson s2d2 stylize at full res, composite.

    ``keep_fg``: stylize where alpha=1 (mask keep mode,
    reference pipeline.py:2040-2043).
    """
    from ..models import deeplab as dl
    from ..models import transformer_net_s2d2 as s2d
    from ..ops.resize import resize_bilinear

    H, W = out_hw
    dt = compute_dtype
    dlp = cast_params(dl_params, dt)

    def step(x01):
        x = x01.astype(dt)
        small = resize_bilinear(x, (infer_res, infer_res))
        logits = dl.apply(dlp, small * 2.0 - 1.0)
        alpha = (jnp.argmax(logits, -1) != 0).astype(dt)[..., None]
        alpha = resize_bilinear(alpha, (H, W))
        styled = jnp.clip(s2d.apply(style_params, x.astype(jnp.bfloat16)),
                          0.0, 1.0).astype(dt)
        if not keep_fg:
            alpha = 1.0 - alpha
        return (styled * alpha + x * (1.0 - alpha)).astype(jnp.float32)

    return step
