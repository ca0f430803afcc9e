"""Fused masked-stylize step (BASELINE config #4 form, engine/masked_stylize).

The bf16-glue form (mk44: the f32 form is ~90% data movement) must stay
inside BASELINE's 1e-2 composite budget vs the f32 form, and the step's
composite math must equal the reference's alpha blend
(sky_swap.py:185-219 / pipeline.py:2040-2043) given the same mask.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def dl_params(reference_path):
    torch = pytest.importorskip("torch")
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    sys.path.insert(0, str(reference_path))
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(str(reference_path))
    torch.manual_seed(0)
    model = DeepLab(backbone="resnet", output_stride=16, num_classes=21,
                    sync_bn=False)
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    from neuralstyletransferv1_tpu.models import deeplab as dl

    params, nc = dl.import_deeplab(sd)
    assert nc == 21
    return params


def _style_params():
    from neuralstyletransferv1_tpu.models import transformer_net
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d

    p = transformer_net.init(jax.random.key(0))
    b32 = s2d.bake_io_affine(s2d.from_johnson_params(p), "imagenet_255")
    return jax.tree.map(lambda a: a.astype(jnp.bfloat16), b32)


def test_masked_stylize_bf16_close_to_f32(dl_params):
    from neuralstyletransferv1_tpu.engine.masked_stylize import (
        make_masked_stylize_step)

    bp = _style_params()
    H, W = 96, 128
    s16 = make_masked_stylize_step(dl_params, bp, (H, W), infer_res=65,
                                   compute_dtype=jnp.bfloat16)
    s32 = make_masked_stylize_step(dl_params, bp, (H, W), infer_res=65,
                                   compute_dtype=jnp.float32)
    # smooth content (not pure noise): argmax margins behave like images
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    x = np.stack([np.sin(xx / 9) * np.cos(yy / 7),
                  np.cos(xx / 13), np.sin((xx + yy) / 11)], -1)
    x = jnp.asarray((x * 0.4 + 0.5)[None].repeat(2, 0), jnp.float32)
    y16 = np.asarray(jax.jit(s16)(x))
    y32 = np.asarray(jax.jit(s32)(x))
    assert y16.shape == (2, H, W, 3)
    assert np.abs(y16 - y32).mean() < 1e-2


def test_masked_stylize_composite_math(dl_params):
    """Given the step's own mask, the output equals alpha*styled +
    (1-alpha)*orig exactly (keep mode), and the replace mode flips it."""
    from neuralstyletransferv1_tpu.engine.masked_stylize import (
        make_masked_stylize_step)
    from neuralstyletransferv1_tpu.models import deeplab as dl
    from neuralstyletransferv1_tpu.models import transformer_net_s2d2 as s2d
    from neuralstyletransferv1_tpu.ops.resize import resize_bilinear
    from neuralstyletransferv1_tpu.engine.masked_stylize import cast_params

    bp = _style_params()
    H, W = 64, 96
    step = make_masked_stylize_step(dl_params, bp, (H, W), infer_res=65,
                                    compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.key(3), (1, H, W, 3), jnp.float32)
    got = np.asarray(jax.jit(step)(x))

    small = resize_bilinear(x, (65, 65))
    logits = dl.apply(cast_params(dl_params, jnp.float32),
                      small * 2.0 - 1.0)
    alpha = (jnp.argmax(logits, -1) != 0).astype(jnp.float32)[..., None]
    alpha = resize_bilinear(alpha, (H, W))
    styled = jnp.clip(s2d.apply(bp, x.astype(jnp.bfloat16)),
                      0.0, 1.0).astype(jnp.float32)
    want = np.asarray(styled * alpha + x * (1.0 - alpha))
    np.testing.assert_allclose(got, want, atol=5e-4)  # XLA fusion-order FMA flips on the bf16 styled path

    step_r = make_masked_stylize_step(dl_params, bp, (H, W), infer_res=65,
                                      compute_dtype=jnp.float32,
                                      keep_fg=False)
    got_r = np.asarray(jax.jit(step_r)(x))
    want_r = np.asarray(styled * (1.0 - alpha) + x * alpha)
    np.testing.assert_allclose(got_r, want_r, atol=5e-4)
