"""Global compute configuration.

``conv_precision`` controls the XLA dot/conv precision for f32 activations:
- ``HIGHEST``: exact f32 (6-pass bf16 on the MXU). Default — parity with the
  torch reference is a hard product requirement (≤1e-2 MAE per frame).
- ``DEFAULT``: 1-pass bf16 on TPU. ~3-6x faster conv throughput; use via
  :func:`fast_mode` for throughput benchmarking or quality-insensitive runs.

The dedicated speed path instead casts activations/weights to bf16 explicitly
(see engine.stylizer), which is both faster and more predictable than relying
on precision flags.
"""

from contextlib import contextmanager

from jax import lax

conv_precision = lax.Precision.HIGHEST


def set_conv_precision(p) -> None:
    global conv_precision
    if isinstance(p, str):
        p = {"default": lax.Precision.DEFAULT, "highest": lax.Precision.HIGHEST}[p.lower()]
    conv_precision = p


@contextmanager
def fast_mode():
    """Temporarily run convs at DEFAULT (bf16) precision."""
    global conv_precision
    prev = conv_precision
    conv_precision = lax.Precision.DEFAULT
    try:
        yield
    finally:
        conv_precision = prev
