"""Farneback optical flow vs cv2 oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from neuralstyletransferv1_tpu.ops.flow import farneback_flow
from neuralstyletransferv1_tpu.ops.warp import warp_flow


def _load_pair():
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/input/frame.jpeg").convert("L").resize((240, 136)),
        np.float32,
    )
    M = np.float32([[1, 0, 3], [0, 1, 2]])
    curr = cv2.warpAffine(img, M, (240, 136), borderMode=cv2.BORDER_REFLECT)
    return img, curr


def test_flow_recovers_translation(reference_path):
    prev, curr = _load_pair()
    flow = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr)))
    inner = flow[20:-20, 20:-20]
    assert abs(inner[..., 0].mean() - 3.0) < 0.3
    assert abs(inner[..., 1].mean() - 2.0) < 0.3


def test_flow_close_to_cv2(reference_path):
    cv2 = pytest.importorskip("cv2")
    prev, curr = _load_pair()
    ours = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr)))
    ref = cv2.calcOpticalFlowFarneback(
        prev.astype(np.uint8), curr.astype(np.uint8), None, 0.5, 3, 15, 3, 5, 1.1, 0
    )
    d = np.abs(ours - ref)[20:-20, 20:-20]
    assert d.mean() < 0.3, d.mean()


def test_flow_warp_closes_the_loop(reference_path):
    """Validate flow+warp jointly: cv2's convention is
    remap(curr, grid+flow) ≈ prev (verified empirically against cv2).

    Note the reference's EMA warps *prev* with grid+flow
    (pipeline.py:1925-1929) — the opposite direction, benign for small
    inter-frame motion. We reproduce that behavior verbatim in
    temporal.flow_ema_fuse; this test checks the mathematically closed
    direction so flow-field errors are actually observable.
    """
    prev, curr = _load_pair()
    flow = farneback_flow(jnp.asarray(prev), jnp.asarray(curr))
    warped = np.asarray(warp_flow(jnp.asarray(curr), flow))
    base_err = np.abs(prev - curr)[20:-20, 20:-20].mean()
    warp_err = np.abs(warped - prev)[20:-20, 20:-20].mean()
    assert warp_err < base_err * 0.15, (warp_err, base_err)
