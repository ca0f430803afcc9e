"""End-to-end model parity: our JAX stylizers vs the reference torch modules.

The reference repo (read-only oracle) is imported on its own sys.path; random
weights are generated in torch, exported as a state-dict, imported through our
checkpoint importers, and outputs compared. The shipped checkpoints were
stripped from the mount, so random-weight parity is the strongest available
end-to-end check.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp


def _ref_module(reference_path, name):
    sys.path.insert(0, str(reference_path))
    try:
        import importlib

        mod = importlib.import_module(name)
    finally:
        sys.path.remove(str(reference_path))
    return mod


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_transformer_johnson_parity(reference_path, torch):
    ref_tn = _ref_module(reference_path, "transformer_net")
    from neuralstyletransferv1_tpu.io import checkpoints as ckpt
    from neuralstyletransferv1_tpu.models import transformer_net

    torch.manual_seed(0)
    model = ref_tn.TransformerNet().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = ckpt.import_transformer(
        {k: np.asarray(v, np.float32) for k, v in sd.items() if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))}
    )

    x = np.random.default_rng(1).random((1, 64, 80, 3)).astype(np.float32) * 255.0
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(transformer_net.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    assert mae < 1e-2, f"MAE {mae}"


def test_transformer_nst_parity(reference_path, torch):
    ref_tn = _ref_module(reference_path, "transformer_net_nst")
    from neuralstyletransferv1_tpu.io import checkpoints as ckpt
    from neuralstyletransferv1_tpu.models import transformer_net_nst

    torch.manual_seed(0)
    model = ref_tn.TransformerNet().eval()
    sd = {k: np.asarray(v.detach().numpy(), np.float32) for k, v in model.state_dict().items()}
    assert ckpt.detect_transformer_arch(sd) == "nst"
    params = ckpt.import_transformer_nst(sd)

    x = np.random.default_rng(2).random((1, 48, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(transformer_net_nst.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    assert mae < 1e-3, f"MAE {mae}"


@pytest.mark.parametrize("use_frn", [False, True])
def test_reconet_parity(reference_path, torch, use_frn):
    ref_model = _ref_module(reference_path, "model")
    from neuralstyletransferv1_tpu.io import checkpoints as ckpt
    from neuralstyletransferv1_tpu.models import reconet

    torch.manual_seed(0)
    model = ref_model.ReCoNet(frn=use_frn).eval()
    # Torch default-inits FRN/TLU params to uninitialized memory via
    # reset_parameters (ones/zeros) — randomize them so the test is non-trivial.
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    sd = {k: np.asarray(v.detach().numpy(), np.float32) for k, v in model.state_dict().items()}
    params = ckpt.import_reconet(sd)
    assert params["frn"] == use_frn

    x = np.random.default_rng(3).random((1, 40, 48, 3)).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(reconet.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    assert mae < 1e-3, f"MAE {mae}"


def test_io_presets_roundtrip():
    from neuralstyletransferv1_tpu.models import io_presets as iop

    x = np.random.default_rng(4).random((1, 8, 8, 3)).astype(np.float32)
    # True inverses (reference: pipeline.py:1444-1486).
    for preset in ("raw_255", "raw_01", "imagenet_01", "tanh"):
        xin = iop.preprocess(preset, jnp.asarray(x))
        out = np.asarray(iop.postprocess(preset, xin))
        np.testing.assert_allclose(out, x, rtol=1e-4, atol=1e-4)
    # imagenet_255: pre normalizes by 255-scaled ImageNet stats; post is y/255
    # (models trained under this preset emit 0..255 directly).
    xin = np.asarray(iop.preprocess("imagenet_255", jnp.asarray(x)))
    want = (x * 255.0 - np.array([0.485, 0.456, 0.406]) * 255.0) / (
        np.array([0.229, 0.224, 0.225]) * 255.0
    )
    np.testing.assert_allclose(xin, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(iop.postprocess("imagenet_255", jnp.asarray(x * 255.0))), x, rtol=1e-4, atol=1e-4
    )
    # caffe_bgr: BGR255 minus Caffe mean in; BGR255 (no mean) out.
    xin = np.asarray(iop.preprocess("caffe_bgr", jnp.asarray(x)))
    want = x[..., ::-1] * 255.0 - np.array([103.939, 116.779, 123.68])
    np.testing.assert_allclose(xin, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(iop.postprocess("caffe_bgr", jnp.asarray(x[..., ::-1] * 255.0))),
        x,
        rtol=1e-4,
        atol=1e-4,
    )
    assert iop.resolve_auto_preset("transformer") == "imagenet_255"
    assert iop.resolve_auto_preset("transformer", arch="nst") == "raw_01"
    assert iop.resolve_auto_preset("torch7") == "caffe_bgr"


def test_ladder_stylizer_vmapped_bank():
    """Vmapped model bank matches per-model stylization exactly."""
    import jax

    from neuralstyletransferv1_tpu.engine import stylizer as st

    models = [st.make_random_model("johnson", seed=s) for s in (0, 1, 2)]
    x = jnp.asarray(np.random.default_rng(5).random((1, 32, 40, 3)).astype(np.float32))
    bank_fn = st.jit_ladder_stylizer(models)
    got = np.asarray(bank_fn(x))
    assert got.shape == (3, 1, 32, 40, 3)
    for i, m in enumerate(models):
        want = np.asarray(st.jit_stylizer(m, optimize=False)(x))
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)
