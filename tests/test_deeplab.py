"""DeepLabV3+ parity vs the reference torch model (random weights)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_deeplab(reference_path):
    torch = pytest.importorskip("torch")
    # Offline-weights shim, like the reference does (sky_swap.py:42-72):
    # pretrained-backbone downloads must not hit the network.
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    sys.path.insert(0, str(reference_path))
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(str(reference_path))
    torch.manual_seed(0)
    model = DeepLab(backbone="resnet", output_stride=16, num_classes=21, sync_bn=False)
    model.eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    return model


def test_deeplab_parity(ref_deeplab):
    import torch

    from neuralstyletransferv1_tpu.models import deeplab as dl

    sd = {k: v.detach().numpy() for k, v in ref_deeplab.state_dict().items()}
    params, nc = dl.import_deeplab(sd)
    assert nc == 21

    x = np.random.default_rng(0).standard_normal((1, 65, 97, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_deeplab(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(dl.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    mae = np.abs(got - want).mean()
    rel = mae / (np.abs(want).mean() + 1e-9)
    assert rel < 1e-3, (mae, rel)
    # argmax agreement (the product-level output)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.999, agree


def test_detect_num_classes():
    from neuralstyletransferv1_tpu.models.deeplab import detect_num_classes

    sd = {"decoder.last_conv.8.weight": np.zeros((19, 256, 1, 1), np.float32)}
    assert detect_num_classes(sd) == 19
    sd = {"decoder.last_conv.8.weight": np.zeros((21, 256, 1, 1), np.float32)}
    assert detect_num_classes(sd) == 21


def test_sky_swap_mask_postprocess_matches_cv2():
    cv2 = pytest.importorskip("cv2")

    from neuralstyletransferv1_tpu.apps.sky_swap import _mask_postprocess_np

    rng = np.random.default_rng(3)
    sky = ((rng.random((64, 80)) > 0.6) * 255).astype(np.uint8)
    got = _mask_postprocess_np(sky, expand_px=2, contract_px=1, feather_px=3)
    want = cv2.morphologyEx(sky, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
    want = cv2.dilate(want, np.ones((5, 5), np.uint8), iterations=1)
    want = cv2.erode(want, np.ones((3, 3), np.uint8), iterations=1)
    want = cv2.GaussianBlur(want, (0, 0), sigmaX=1.5, sigmaY=1.5)
    assert np.abs(got.astype(np.float32) - want.astype(np.float32)).mean() < 2.0


@pytest.fixture(scope="module")
def ref_deeplab_factory(reference_path):
    torch = pytest.importorskip("torch")
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    sys.path.insert(0, str(reference_path))
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(str(reference_path))

    def build(backbone, output_stride=16, num_classes=21, seed=0):
        torch.manual_seed(seed)
        m = DeepLab(backbone=backbone, output_stride=output_stride,
                    num_classes=num_classes, sync_bn=False).eval()
        with torch.no_grad():
            for mod in m.modules():
                if hasattr(mod, "running_mean") and mod.running_mean is not None:
                    mod.running_mean.add_(torch.randn_like(mod.running_mean) * 0.1)
                    mod.running_var.mul_(torch.rand_like(mod.running_var) * 0.5 + 0.75)
        return m

    return build


@pytest.mark.parametrize("backbone", ["mobilenet", "xception", "drn"])
def test_deeplab_extra_backbone_parity(ref_deeplab_factory, backbone):
    """VERDICT round-1 item 10: all four --backbone values load and segment."""
    import torch

    from neuralstyletransferv1_tpu.models import deeplab as dl

    model = ref_deeplab_factory(backbone)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, nc = dl.import_deeplab(sd, backbone=backbone)
    assert nc == 21

    x = np.random.default_rng(1).standard_normal((1, 65, 97, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(dl.apply(params, jnp.asarray(x), backbone=backbone))
    assert got.shape == want.shape, (backbone, got.shape, want.shape)
    mae = np.abs(got - want).mean()
    rel = mae / (np.abs(want).mean() + 1e-9)
    assert rel < 1e-3, (backbone, mae, rel)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.995, (backbone, agree)
