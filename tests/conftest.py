"""Test harness config.

Tests run on CPU jax with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). The container's sitecustomize pre-imports jax with the axon TPU
backend selected, so env vars alone are too late — override the live config
before any backend is initialized.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
if not jax.config.jax_num_cpu_devices or jax.config.jax_num_cpu_devices < 8:
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except RuntimeError:
        # Backends already initialized (axon sitecustomize); reset them.
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_num_cpu_devices", 8)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")

import pytest


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference checkout (oracle for parity tests)."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def ref_mobilenet_ckpt(reference_path, tmp_path_factory):
    """Random-weight mobilenet DeepLab checkpoint in the reference's
    .pth.tar format (the shipped weights are stripped)."""
    torch = pytest.importorskip("torch")
    import torch.utils.model_zoo as model_zoo

    model_zoo.load_url = lambda *a, **k: {}
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    sys.path.insert(0, str(reference_path))
    try:
        from modeling.deeplab import DeepLab
    finally:
        sys.path.remove(str(reference_path))
    torch.manual_seed(3)
    m = DeepLab(backbone="mobilenet", output_stride=16, num_classes=21,
                sync_bn=False).eval()
    p = tmp_path_factory.mktemp("dl") / "deeplab-mobilenet.pth.tar"
    torch.save({"state_dict": m.state_dict()}, p)
    return p
