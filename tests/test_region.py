"""Region engine parity vs the reference region_blend module (oracle)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_rb(reference_path):
    pytest.importorskip("torch")
    sys.path.insert(0, str(reference_path))
    try:
        import importlib

        mod = importlib.import_module("region_blend")
    finally:
        sys.path.remove(str(reference_path))
    return mod


H, W = 72, 96
SEED = 42


@pytest.mark.parametrize(
    "mode", ["grid", "diagonal", "voronoi", "fractal", "radial", "waves", "spiral", "concentric", "random"]
)
def test_generators_parity(ref_rb, mode):
    from neuralstyletransferv1_tpu.region import generate_region_masks

    count = 4
    ours = np.asarray(generate_region_masks(H, W, mode, count, seed=SEED, feather=6))
    ref = ref_rb.generate_region_masks(H, W, mode, count, seed=SEED, feather=6)
    ref = np.stack([m.squeeze().numpy() for m in ref], 0)
    assert ours.shape == ref.shape
    mae = np.abs(ours - ref).mean()
    assert mae < 5e-3, f"{mode}: MAE {mae}"


def test_voronoi_weighted_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import generate_region_masks

    sizes = [1.0, 1.0, 0.3, 2.0]
    ours = np.asarray(
        generate_region_masks(H, W, "voronoi", 4, seed=7, feather=0, region_sizes=sizes)
    )
    ref = ref_rb.generate_region_masks(H, W, "voronoi", 4, seed=7, feather=0, region_sizes=sizes)
    ref = np.stack([m.squeeze().numpy() for m in ref], 0)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_assignments_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import assign_models_to_regions

    for mode in ("sequential", "random", "weighted"):
        for oc in (0.0, 0.3):
            ours = assign_models_to_regions(8, 4, mode, [0.4, 0.3, 0.2, 0.1], seed=5, original_chance=oc)
            ref = ref_rb.assign_models_to_regions(8, 4, mode, [0.4, 0.3, 0.2, 0.1], seed=5, original_chance=oc)
            assert ours == ref, (mode, oc)


def test_blend_spec_dsl_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import parse_region_configs

    spec = "A:0.7+B:0.3|C|O|2+B"
    ours = parse_region_configs(6, 4, blend_spec=spec, scale_spec="1.0,0.5", seed=3)
    ref = ref_rb.parse_region_configs(6, 4, blend_spec=spec, scale_spec="1.0,0.5", seed=3)
    for o, r in zip(ours, ref):
        assert o.model_indices == r.model_indices
        np.testing.assert_allclose(o.model_weights, r.model_weights)
        assert o.scale == r.scale


def test_harmonic_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import compute_harmonic_value

    for wf in ("sine", "triangle", "sawtooth", "sawtooth_down", "square"):
        for f in (0, 13, 59, 120):
            ours = compute_harmonic_value(f, 60.0, 0.2, 0.9, 45.0, wf)
            ref = ref_rb.compute_harmonic_value(f, 60.0, 0.2, 0.9, 45.0, wf)
            assert abs(ours - ref) < 1e-9


def test_animated_weights_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import BlendAnimation, compute_animated_weights

    anim = BlendAnimation(enabled=True, period=90, min_opacity=0.1, max_opacity=1.0, waveform="sine")
    ref_anim = ref_rb.BlendAnimation(enabled=True, period=90, min_opacity=0.1, max_opacity=1.0, waveform="sine")
    for f in (0, 7, 45):
        ours = compute_animated_weights([0.5, 0.3, 0.2], f, anim)
        ref = ref_rb.compute_animated_weights([0.5, 0.3, 0.2], f, ref_anim)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_composite_parity(ref_rb):
    import torch

    from neuralstyletransferv1_tpu.region import composite_regions, generate_region_masks

    rng = np.random.default_rng(0)
    outs = [rng.random((H, W, 3)).astype(np.float32) for _ in range(3)]
    orig = rng.random((H, W, 3)).astype(np.float32)
    masks = generate_region_masks(H, W, "voronoi", 4, seed=SEED, feather=8)
    assignments = [0, 1, 2, -1]

    got = np.asarray(composite_regions([jnp.asarray(o) for o in outs], masks, assignments, jnp.asarray(orig)))

    ref_masks = [torch.from_numpy(np.asarray(masks)[i]).view(1, 1, H, W) for i in range(4)]
    ref_outs = [torch.from_numpy(o).permute(2, 0, 1) for o in outs]
    want = (
        ref_rb.composite_regions(ref_outs, ref_masks, assignments, torch.from_numpy(orig).permute(2, 0, 1))
        .permute(1, 2, 0)
        .numpy()
    )
    assert np.abs(got - want).mean() < 1e-5


def test_rotation_parity(ref_rb):
    import torch

    from neuralstyletransferv1_tpu.region import generate_region_masks, rotate_all_masks

    masks = generate_region_masks(H, W, "grid", 4, seed=SEED, feather=6)
    got = np.asarray(rotate_all_masks(masks, 33.0))
    ref_masks = [torch.from_numpy(np.asarray(masks)[i]).view(1, 1, H, W) for i in range(4)]
    want = np.stack([m.squeeze().numpy() for m in ref_rb.rotate_all_masks(ref_masks, 33.0)], 0)
    assert np.abs(got - want).mean() < 5e-3


def test_organic_morph_parity(ref_rb):
    import torch

    from neuralstyletransferv1_tpu.region import (
        MorphAnimation,
        generate_region_masks,
        warp_all_masks_organic,
    )

    masks = generate_region_masks(H, W, "voronoi", 3, seed=SEED, feather=6)
    morph = MorphAnimation(enabled=True, speed=1.0, amplitude=0.1, frequency=3.0, mode="blob", seed=42)
    got = np.asarray(warp_all_masks_organic(masks, morph, frame_idx=5))

    ref_masks = [torch.from_numpy(np.asarray(masks)[i]).view(1, 1, H, W) for i in range(3)]
    ref_morph = ref_rb.MorphAnimation(
        enabled=True, speed=1.0, amplitude=0.1, frequency=3.0, mode="blob", seed=42
    )
    want = np.stack(
        [m.squeeze().numpy() for m in ref_rb.warp_all_masks_organic(ref_masks, ref_morph, 5)], 0
    )
    assert np.abs(got - want).mean() < 0.02


def test_morph_spec_parser_parity(ref_rb):
    from neuralstyletransferv1_tpu.region import parse_morph_animation

    for spec in (None, "off", "blob", "tentacle", "1.5,0.2,4.0,blob", "2.0,0.1", "1.2"):
        ours = parse_morph_animation(spec)
        ref = ref_rb.parse_morph_animation(spec)
        assert ours.enabled == ref.enabled, spec
        if ours.enabled:
            assert (ours.speed, ours.amplitude, ours.frequency, ours.mode) == (
                ref.speed,
                ref.amplitude,
                ref.frequency,
                ref.mode,
            ), spec
