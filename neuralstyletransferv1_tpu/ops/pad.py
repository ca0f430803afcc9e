"""Spatial padding ops (NHWC).

Reflection padding matches ``torch.nn.ReflectionPad2d`` semantics (mirror
without repeating the edge pixel), which is what both TransformerNet variants
in the reference use (reference: transformer_net.py:44-54,
transformer_net_nst.py:74).
"""

import jax.numpy as jnp


def reflect_pad_2d(x: jnp.ndarray, pad: int | tuple[int, int]) -> jnp.ndarray:
    """Reflect-pad the H and W axes of an NHWC (or HWC) tensor.

    ``pad`` is either a single int applied to both spatial axes or
    ``(pad_h, pad_w)``. Mirror mode excludes the border pixel, matching
    torch's ReflectionPad2d (np.pad mode="reflect").
    """
    if isinstance(pad, int):
        ph = pw = pad
    else:
        ph, pw = pad
    if ph == 0 and pw == 0:
        return x
    nd = x.ndim
    cfg = [(0, 0)] * nd
    # Spatial axes are the two before the channel axis (NHWC / HWC).
    cfg[nd - 3] = (ph, ph)
    cfg[nd - 2] = (pw, pw)
    return jnp.pad(x, cfg, mode="reflect")
