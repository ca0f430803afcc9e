"""Magenta SavedModel converter + executor parity vs the real TF runtime.

The pretrained weight shard is stripped (.MISSING_LARGE_BLOBS:8), so the
test synthesizes a FULL checkpoint with random values in the artifact's
exact variable layout (names/shapes from the real variables.index +
object_graph_def), drops it into a copy of the real SavedModel, then
compares tf.saved_model.load's serving_default (the oracle — the actual
graph the reference ran through tensorflow_hub, pipeline.py:153-168)
against our JAX GraphDef executor. This is the VERDICT round-1 'done'
criterion for the magenta rebuild.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

REAL = Path("/root/reference/models/magenta/f843094219bf78a99e8ea6c8d71f1bc74f07101a")


@pytest.fixture(scope="module")
def synthetic_savedmodel(tmp_path_factory):
    if not (REAL / "saved_model.pb").exists():
        pytest.skip("reference magenta SavedModel unavailable")
    tf = pytest.importorskip("tensorflow")
    from neuralstyletransferv1_tpu.io import tf_saved_model as tsm

    d = tmp_path_factory.mktemp("magenta_sm")
    shutil.copy(REAL / "saved_model.pb", d / "saved_model.pb")
    (d / "variables").mkdir()

    mg = tsm.load_saved_model_proto(REAL)
    name_map = tsm.checkpoint_name_map(mg)
    # shapes from the real index; object-graph bytes from the surviving shard
    listing = dict(tf.train.list_variables(str(REAL / "variables" / "variables")))
    rdr = tf.train.load_checkpoint(str(REAL / "variables" / "variables"))

    rng = np.random.default_rng(0)
    names, slices, tensors = [], [], []
    for key, shape in listing.items():
        if key == "_CHECKPOINTABLE_OBJECT_GRAPH":
            val = tf.constant(rdr.get_tensor(key))
        elif key.startswith("save_counter"):
            val = tf.constant(np.int64(1))
        else:
            semantic = name_map.get(key, "")
            if "moving_variance" in semantic:
                arr = rng.uniform(0.5, 1.5, shape).astype(np.float32)
            elif "weights" in semantic:
                fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
                arr = rng.normal(0, 1.0 / np.sqrt(fan_in), shape).astype(np.float32)
            else:
                arr = rng.normal(0, 0.2, shape).astype(np.float32)
            val = tf.constant(arr)
        names.append(key)
        slices.append("")
        tensors.append(val)
    tf.raw_ops.SaveV2(
        prefix=str(d / "variables" / "variables"),
        tensor_names=names, shape_and_slices=slices, tensors=tensors,
    )
    return d


def test_variable_name_map_covers_graph(synthetic_savedmodel):
    from neuralstyletransferv1_tpu.io import tf_saved_model as tsm

    variables = tsm.load_variables(synthetic_savedmodel)
    assert len(variables) == 508  # 507 graph vars + save_counter
    assert "transformer/contract/conv1/weights" in variables
    assert variables["transformer/contract/conv1/weights"].shape == (9, 9, 3, 32)
    assert "InceptionV3/Mixed_6e/Branch_0/Conv2d_0a_1x1/weights" in variables


@pytest.mark.slow  # TF-oracle SavedModel round-trip (~1 min)
def test_executor_matches_tf_oracle(synthetic_savedmodel):
    tf = pytest.importorskip("tensorflow")
    from neuralstyletransferv1_tpu.io.tf_saved_model import TFGraphExecutor

    rng = np.random.default_rng(1)
    content = rng.random((1, 128, 160, 3)).astype(np.float32)
    style = rng.random((1, 96, 96, 3)).astype(np.float32)

    loaded = tf.saved_model.load(str(synthetic_savedmodel))
    f = loaded.signatures["serving_default"]
    want = f(placeholder=tf.constant(content),
             placeholder_1=tf.constant(style))["output_0"].numpy()

    ex = TFGraphExecutor(synthetic_savedmodel)
    got = np.asarray(ex.forward(content, style))

    assert got.shape == want.shape, (got.shape, want.shape)
    mae = np.abs(got - want).mean()
    assert mae < 1e-2, mae
    # should be far tighter than the 1e-2 budget in practice
    assert np.abs(got - want).max() < 0.05


@pytest.mark.slow  # TF-oracle SavedModel round-trip (~1 min)
def test_engine_magenta_slot_uses_savedmodel(synthetic_savedmodel, tmp_path):
    """The A-H slot loader must pick up a complete SavedModel under
    --magenta_model_root and stylize through the real graph."""
    from types import SimpleNamespace

    from PIL import Image

    from neuralstyletransferv1_tpu.engine import stylizer as st
    from neuralstyletransferv1_tpu.models.magenta_stub import load_magenta_slot

    rng = np.random.default_rng(2)
    style_p = tmp_path / "style.png"
    Image.fromarray((rng.random((80, 80, 3)) * 255).astype(np.uint8)).save(style_p)

    args = SimpleNamespace(magenta_model_root=str(synthetic_savedmodel.parent),
                           magenta_tile=96, magenta_overlap=16,
                           magenta_target_res=None)
    slot = load_magenta_slot(str(style_p), args)
    assert "transfer_fn" in slot.params, "real weights not detected"
    fn = st.jit_stylizer(slot)
    x = rng.random((1, 120, 140, 3)).astype(np.float32)
    y = np.asarray(fn(x))
    assert y.shape == (1, 120, 140, 3)
    assert 0.0 <= y.min() and y.max() <= 1.0
    assert y.std() > 1e-4  # not a constant image


def test_fallback_without_weights_moment_matches(tmp_path):
    """No weights → Reinhard color-transfer fallback: tile stats match the
    style image's LAB moments."""
    from types import SimpleNamespace

    from PIL import Image

    import jax.numpy as jnp

    from neuralstyletransferv1_tpu.models.magenta_stub import load_magenta_slot
    from neuralstyletransferv1_tpu.ops.color import rgb_to_lab_u8

    rng = np.random.default_rng(3)
    style = (rng.random((64, 64, 3)) * 128 + 64).astype(np.uint8)
    style_p = tmp_path / "style.png"
    Image.fromarray(style).save(style_p)
    args = SimpleNamespace(magenta_model_root=str(tmp_path / "nothing"),
                           magenta_tile=64, magenta_overlap=8,
                           magenta_target_res=None)
    slot = load_magenta_slot(str(style_p), args)
    assert "transfer_fn" in slot.params and "magenta" not in slot.params
    content = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    out = np.asarray(slot.params["transfer_fn"](content))
    out_lab = np.asarray(rgb_to_lab_u8(jnp.asarray(out[0])))
    sty_lab = np.asarray(rgb_to_lab_u8(jnp.asarray(style.astype(np.float32) / 255.0)))
    # L-channel moments transfer (a/b wrap-encoding makes them loose)
    assert abs(out_lab[..., 0].mean() - sty_lab[..., 0].mean()) < 12
