"""Unit tests for low-level ops against independent oracles (torch/cv2/PIL/numpy)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralstyletransferv1_tpu import ops

rng = np.random.default_rng(42)


def test_reflect_pad_matches_numpy():
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    got = np.asarray(ops.reflect_pad_2d(jnp.asarray(x), 2))
    want = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_conv2d_matches_torch():
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2, padding=1))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    want = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), stride=2, padding=1)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


def test_conv_transpose_matches_torch():
    torch = pytest.importorskip("torch")
    cin, cout = 6, 4
    x = rng.standard_normal((1, 9, 11, cin)).astype(np.float32)
    w_torch = rng.standard_normal((cin, cout, 3, 3)).astype(np.float32)  # IOHW
    b = rng.standard_normal(cout).astype(np.float32)
    w_ours = np.transpose(w_torch, (2, 3, 1, 0))  # HW, Cout, Cin
    got = np.asarray(
        ops.conv_transpose2d_torch(
            jnp.asarray(x), jnp.asarray(w_ours), jnp.asarray(b), stride=2, padding=1, output_padding=1
        )
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.functional.conv_transpose2d(
        xt, torch.from_numpy(w_torch), torch.from_numpy(b), stride=2, padding=1, output_padding=1
    )
    assert got.shape == tuple(want.permute(0, 2, 3, 1).shape)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((2, 16, 14, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(ops.instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    m = torch.nn.InstanceNorm2d(8, affine=True)
    m.weight.data = torch.from_numpy(scale)
    m.bias.data = torch.from_numpy(bias)
    want = m(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_frn_tlu_match_torch_reference_math():
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal(4).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    tau = rng.standard_normal(4).astype(np.float32)
    nu2 = np.mean(x**2, axis=(1, 2), keepdims=True)
    want = w * (x / np.sqrt(nu2 + 1e-6)) + b
    got = np.asarray(ops.frn(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_tlu = np.asarray(ops.tlu(jnp.asarray(x), jnp.asarray(tau)))
    np.testing.assert_allclose(got_tlu, np.maximum(x, tau), rtol=0, atol=0)


def test_upsample_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    x = rng.standard_normal((1, 5, 6, 3)).astype(np.float32)
    got = np.asarray(ops.upsample_nearest(jnp.asarray(x), 2))
    want = (
        torch.nn.functional.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    x = rng.random((33, 47)).astype(np.float32)
    sigma = 3.0
    got = np.asarray(ops.gaussian_blur(jnp.asarray(x), sigma))
    k = int(np.ceil(sigma * 3)) * 2 + 1
    want = cv2.GaussianBlur(x, (k, k), sigma)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_warp_flow_matches_cv2_remap():
    cv2 = pytest.importorskip("cv2")
    img = rng.random((20, 30, 3)).astype(np.float32)
    flow = (rng.random((20, 30, 2)).astype(np.float32) - 0.5) * 6
    got = np.asarray(ops.warp_flow(jnp.asarray(img), jnp.asarray(flow)))
    gx, gy = np.meshgrid(np.arange(30, dtype=np.float32), np.arange(20, dtype=np.float32))
    want = cv2.remap(
        img,
        (gx + flow[..., 0]).astype(np.float32),
        (gy + flow[..., 1]).astype(np.float32),
        interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REPLICATE,
    )
    # cv2.remap uses fixed-point interpolation (5-bit fractions) — loose atol.
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05)


def test_morphology_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    x = (rng.random((25, 31)) > 0.7).astype(np.float32)
    kernel = np.ones((5, 5), np.uint8)
    np.testing.assert_allclose(
        np.asarray(ops.grey_dilate(jnp.asarray(x), 5)), cv2.dilate(x, kernel), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ops.grey_erode(jnp.asarray(x), 5)), cv2.erode(x, kernel), atol=0
    )


def test_lab_roundtrip_and_pil_parity():
    from PIL import Image

    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    x01 = img.astype(np.float32) / 255.0
    lab = np.asarray(ops.rgb_to_lab_u8(jnp.asarray(x01)))
    pil_lab = np.array(Image.fromarray(img).convert("LAB"), dtype=np.float32)
    # a/b are wrapped signed bytes — compare with circular distance; PIL's
    # integer LUT pipeline quantizes, so allow ~2 byte steps on average.
    d = np.abs(lab - pil_lab)
    d = np.minimum(d, 256.0 - d)
    assert d.mean() < 2.0, f"mean circular byte diff {d.mean()}"
    back = np.asarray(ops.lab_u8_to_rgb(jnp.asarray(lab)))
    assert np.abs(back - x01).mean() < 0.02


def test_rotate_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = rng.random((32, 40)).astype(np.float32)
    angle = 17.5
    got = np.asarray(ops.rotate_image(jnp.asarray(img), angle))
    m = cv2.getRotationMatrix2D(((40 - 1) / 2.0, (32 - 1) / 2.0), angle, 1.0)
    want = cv2.warpAffine(img, m, (40, 32), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT)
    # Interior only (border handling differs by a pixel's worth of definition);
    # cv2 uses 5-bit fixed-point interpolation so a few samples landing on
    # texel boundaries legitimately round to the other side — bound the
    # mismatch fraction instead of every element.
    diff = np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert (diff > 0.05).mean() < 0.01, f"{(diff > 0.05).mean()} of pixels off"
    assert diff.mean() < 0.01
