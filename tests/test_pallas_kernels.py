"""Differential tests for the Pallas TPU kernels (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from imagetransformations_tpu.oracle import fast_warp as ofw
from imagetransformations_tpu.oracle import stencil as ost
from imagetransformations_tpu.ops.pallas.blur import blur_separable
from imagetransformations_tpu.ops.pallas.shear import rotate_3shear, shear_rows


@pytest.fixture
def batch(rng):
    return rng.integers(0, 256, (2, 48, 40, 3), dtype=np.uint8)


def test_shear_rows_exact_vs_oracle(batch, rng):
    shifts = (rng.random(48).astype(np.float32) - 0.5) * 20.0
    out = np.asarray(shear_rows(jnp.asarray(batch), shifts))
    ref = ofw.shear_rows(batch, shifts)
    np.testing.assert_array_equal(out, ref)


def test_shear_zero_shift_identity(batch):
    out = np.asarray(shear_rows(jnp.asarray(batch), np.zeros(48, np.float32)))
    np.testing.assert_array_equal(out, batch)


@pytest.mark.parametrize("angle", [0.0, 5.0, -15.0, 22.5, -22.5, 44.0])
def test_rotate_3shear_exact_vs_oracle(batch, angle):
    out = np.asarray(rotate_3shear(jnp.asarray(batch), angle))
    ref = ofw.rotate_3shear(batch, angle)
    np.testing.assert_array_equal(out, ref)


def test_rotate_3shear_aligns_with_direct_rotation(rng):
    """3-shear result should land within ~1px of the direct PIL rotation
    (different interpolation, same geometry)."""
    from imagetransformations_tpu.oracle import warp as ow

    # smooth gradient image: geometric misalignment would show up as large diffs
    y, x = np.mgrid[0:64, 0:64]
    img = np.stack([x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256], -1).astype(np.uint8)
    out = np.asarray(rotate_3shear(jnp.asarray(img[None]), 10.0))[0]
    ref = ow.apply_rotation(img, 10.0)
    interior = (slice(16, 48), slice(16, 48))
    diff = np.abs(out[interior].astype(int) - ref[interior].astype(int)).mean()
    assert diff < 8.0, f"geometric misalignment: mean interior diff {diff}"


@pytest.mark.parametrize("radius", [0.5, 1.5, 3.0, 5.0])
def test_blur_separable_vs_oracle(batch, radius):
    out = np.asarray(blur_separable(jnp.asarray(batch), radius))
    ref = np.stack([ost.gaussian_blur(batch[i], radius) for i in range(2)])
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_blur_zero_radius_identity(batch):
    out = np.asarray(blur_separable(jnp.asarray(batch), 0.0))
    np.testing.assert_array_equal(out, batch)


def test_fast_chain_parity_gate(rng):
    """The bench pipeline (pallas blur -> 3-shear -> grayscale) matches its
    CPU oracle to <=1 LSB (the BASELINE.json gate)."""
    from imagetransformations_tpu.oracle import elementwise as oe
    from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    fn = build_chain_fn(
        [OpSpec("blur", {"radius": 1.5}), OpSpec("rotation", {"angle": 15.0}), OpSpec("grayscale")]
    )
    out = np.asarray(fn(jnp.asarray(imgs)))
    blurred = np.stack([ost.gaussian_blur(im, 1.5) for im in imgs])
    rotated = ofw.rotate_3shear(blurred, 15.0)
    ref = np.stack([oe.grayscale_rgb(im) for im in rotated])
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_blur_rotate_fused_matches_oracle(rng):
    """The fully fused pipeline kernel == blur oracle -> 3-shear oracle -> luma."""
    from imagetransformations_tpu.oracle import elementwise as oe
    from imagetransformations_tpu.ops.pallas.shear import blur_rotate_fused

    img = rng.integers(0, 256, (2, 256, 128, 3), dtype=np.uint8)
    out = np.asarray(blur_rotate_fused(jnp.asarray(img), 1.5, 15.0, grayscale_out=True))
    blurred = np.stack([ost.gaussian_blur(im, 1.5) for im in img])
    ref = np.stack([oe.grayscale_rgb(im) for im in ofw.rotate_3shear(blurred, 15.0)])
    # <=1 LSB: the blur kernel is f32 vs the f64 oracle (the BASELINE gate)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # radius 0 skips the blur
    out2 = np.asarray(blur_rotate_fused(jnp.asarray(img), 0.0, -10.0))
    np.testing.assert_array_equal(out2, ofw.rotate_3shear(img, -10.0))


def test_rotate_3shear_batched_per_image_angles(rng):
    """Per-image angle vector == per-angle shared kernel, bit-exact."""
    from imagetransformations_tpu.ops.pallas.shear import rotate_3shear_batched

    img = rng.integers(0, 256, (4, 48, 40, 3), dtype=np.uint8)
    angles = np.array([5.0, -15.0, 22.5, 0.0], np.float32)
    out = np.asarray(rotate_3shear_batched(jnp.asarray(img), jnp.asarray(angles)))
    for i, a in enumerate(angles):
        ref = ofw.rotate_3shear(img[i : i + 1], float(a))
        np.testing.assert_array_equal(out[i : i + 1], ref)


def test_chain_routes_traced_angles_to_batched_kernel(rng):
    from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

    img = rng.integers(0, 256, (4, 48, 40, 3), dtype=np.uint8)
    angles = jnp.asarray([10.0, -5.0, 0.0, 20.0])
    fn = build_chain_fn([OpSpec("rotation", {"angle": angles})])
    out = np.asarray(fn(jnp.asarray(img)))
    for i, a in enumerate(np.asarray(angles)):
        ref = ofw.rotate_3shear(img[i : i + 1], float(a))
        np.testing.assert_array_equal(out[i : i + 1], ref)
