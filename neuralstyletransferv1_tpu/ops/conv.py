"""Convolution wrappers (NHWC / HWIO), tuned for the MXU.

Design notes:
- NHWC activations + HWIO kernels is the layout XLA:TPU lowers onto the MXU
  with the fewest transposes.
- ``preferred_element_type=float32`` keeps MXU accumulation in f32 even when
  activations/weights are bf16 — required to stay inside the parity budget.
- Torch-style transposed convolution is expressed as an input-dilated regular
  convolution so XLA can fuse it like any other conv (no scatter).
"""

import jax.numpy as jnp
from jax import lax

from .. import config

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# When True, bf16-input convs emit bf16 directly (the MXU still accumulates
# in f32 internally; only the final rounding point moves, and the bias add
# happens post-rounding). Keeps the f32 conv intermediate out of HBM — the
# round-2c trace showed five res convs materializing f32 outputs plus a
# 2 ms convert+reduce pass each. A/B flag; f32 inputs are unaffected.
_NATIVE_BF16_OUT = False


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | str = 0,
) -> jnp.ndarray:
    """2-D convolution. x: [N,H,W,Cin], w: [kh,kw,Cin,Cout], b: [Cout]."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding[0], (tuple, list)):
        # asymmetric per-side form ((top, bottom), (left, right))
        pad = [tuple(padding[0]), tuple(padding[1])]
    else:
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    pet = (x.dtype if (_NATIVE_BF16_OUT and x.dtype == jnp.bfloat16)
           else jnp.float32)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=_DIMNUMS,
        precision=config.conv_precision,
        preferred_element_type=pet,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv_transpose2d_torch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 2,
    padding: int = 1,
    output_padding: int = 1,
) -> jnp.ndarray:
    """Transposed conv matching ``torch.nn.ConvTranspose2d`` exactly.

    Used by the NST_Train TransformerNet variant (reference:
    transformer_net_nst.py:46-59, k=3 s=2 p=1 op=1 ⇒ exact 2x upsample).

    ``w`` is [kh,kw,Cout,Cin] (the torch IOHW weight transposed to HWOI then
    flipped by this function). Implemented as lhs-dilated conv: output size
    (in-1)*s - 2p + k + output_padding, matching torch.
    """
    kh, kw = w.shape[0], w.shape[1]
    # Torch transposed conv == conv with input dilated by `stride`, kernel
    # spatially flipped, in/out channels swapped, padding (k-1-p) plus
    # output_padding appended at the bottom/right edge.
    w_flip = jnp.flip(w, axis=(0, 1))  # [kh,kw,Cout,Cin] -> flipped
    w_hwio = jnp.transpose(w_flip, (0, 1, 3, 2))  # -> [kh,kw,Cin,Cout]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    y = lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding=[pad_h, pad_w],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        precision=config.conv_precision,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv2d_i8(
    x_q: jnp.ndarray,
    w_q: jnp.ndarray,
    *,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] | str = 0,
) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution (the v5e MXU's 394-TOPS path).

    x_q: [N,H,W,Cin] int8, w_q: [kh,kw,Cin,Cout] int8. Dequantization is the
    caller's job (a per-channel f32 scale folds into the conv's output
    fusion). Measured on the deferred-IN res unit: 1.45 vs 2.75 ms/unit
    against bf16 (experiments/mk22_int8_xla_unit.py) — the round-2 PTQ
    failure was structural (f32 requant passes), not the MXU.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding[0], (tuple, list)):
        pad = [tuple(padding[0]), tuple(padding[1])]
    else:
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    return lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=stride,
        padding=pad,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32,
    )
