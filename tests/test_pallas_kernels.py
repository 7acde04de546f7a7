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
    """The bench pipeline (pallas blur -> 3-shear -> grayscale, f32
    streaming) matches its CPU oracle to <=1 LSB (the BASELINE.json gate;
    oracle = fast_warp.fused_stream_chain since the chain's fast mode
    streams f32 with one final quantization)."""
    from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    fn = build_chain_fn(
        [OpSpec("blur", {"radius": 1.5}), OpSpec("rotation", {"angle": 15.0}), OpSpec("grayscale")]
    )
    out = np.asarray(fn(jnp.asarray(imgs)))
    ref = ofw.fused_stream_chain(imgs, 1.5, 15.0, grayscale_out=True)
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
    """Concrete bounded per-image angle vectors route to the traced fused
    megakernel (stream semantics, one final quantization)."""
    from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

    img = rng.integers(0, 256, (4, 48, 40, 3), dtype=np.uint8)
    angles = jnp.asarray([10.0, -5.0, 0.0, 20.0])
    fn = build_chain_fn([OpSpec("rotation", {"angle": angles})])
    out = np.asarray(fn(jnp.asarray(img)))
    for i, a in enumerate(np.asarray(angles)):
        ref = ofw.fused_stream_chain(img[i : i + 1], 0.0, float(a))
        err = np.abs(out[i : i + 1].astype(int) - ref.astype(int))
        assert err.max() <= 1, (a, err.max())


def test_shear_rows_logrouted_matches_oracle(rng):
    """Log-routed per-image shear (traced shifts, no shift-sized padding)
    must be bit-exact vs the fast-path oracle, including the border
    fill-lerps reproduced by the cyclic wrap."""
    from imagetransformations_tpu.oracle import fast_warp as ofw
    from imagetransformations_tpu.ops.pallas.shear import shear_rows_logrouted

    imgs = rng.integers(0, 256, (3, 64, 48, 3), dtype=np.uint8)
    shifts = rng.uniform(-20, 20, (3, 64)).astype(np.float32)
    out = np.asarray(
        shear_rows_logrouted(
            jnp.asarray(imgs), jnp.asarray(shifts), fill=255, max_shift_px=22
        )
    )
    ref = np.concatenate(
        [ofw.shear_rows(imgs[i : i + 1], shifts[i], fill=255) for i in range(3)]
    )
    np.testing.assert_array_equal(out, ref)


def test_shear_rows_logrouted_beyond_canvas_is_fill(rng):
    from imagetransformations_tpu.ops.pallas.shear import shear_rows_logrouted

    imgs = rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    shifts = np.full((1, 16), 100.0, np.float32)
    out = np.asarray(
        shear_rows_logrouted(
            jnp.asarray(imgs), jnp.asarray(shifts), fill=255, max_shift_px=101
        )
    )
    assert (out == 255).all()


def test_shear_rows_logrouted_beyond_budget_saturates(rng):
    """Shifts beyond the DECLARED max_shift_px bound saturate at the
    routing budget (b_px = bound+1) instead of routing two's-complement
    garbage bits: a contract violation degrades to a clamped shear. Rows
    within the bound are untouched."""
    from imagetransformations_tpu.oracle import fast_warp as ofw
    from imagetransformations_tpu.ops.pallas.shear import shear_rows_logrouted

    imgs = rng.integers(0, 256, (1, 16, 24, 3), dtype=np.uint8)
    shifts = np.zeros((1, 16), np.float32)
    shifts[0, :8] = 3.0    # in budget
    shifts[0, 8:] = -12.0  # violates max_shift_px=4 (b_px = 5)
    out = np.asarray(
        shear_rows_logrouted(
            jnp.asarray(imgs), jnp.asarray(shifts), fill=255, max_shift_px=4
        )
    )
    sat = shifts.copy()
    sat[0, 8:] = -5.0  # the saturated shift
    ref = ofw.shear_rows(imgs, sat[0], fill=255)
    np.testing.assert_array_equal(out, ref)


def test_rotate_3shear_batched_budget_edges(rng):
    """Concrete angle vectors beyond max_angle_deg raise ValueError;
    tracer angles from an enclosing jit clamp to the budget instead of
    wrapping rolled content into the kept region."""
    import jax

    from imagetransformations_tpu.ops.pallas.shear import rotate_3shear_batched

    img = rng.integers(0, 256, (1, 32, 24, 3), dtype=np.uint8)
    x = jnp.asarray(img)
    with pytest.raises(ValueError, match="padding budget"):
        rotate_3shear_batched(x, jnp.asarray([50.0]), max_angle_deg=45.0)

    ref = ofw.rotate_3shear(img, 45.0)
    clamped = np.asarray(
        jax.jit(lambda v, a: rotate_3shear_batched(v, a))(
            x, jnp.asarray([50.0], jnp.float32)
        )
    )
    np.testing.assert_array_equal(clamped, ref)


def test_zoom_bilinear_batched_matches_random_zoom(rng):
    """Gather-free separable zoom with traced per-image factors vs the
    affine bilinear warp (<=1 LSB: XLA-CPU FMA contraction on boundaries)."""
    from imagetransformations_tpu.ops import warp as wp
    from imagetransformations_tpu.ops.pallas.resample import zoom_bilinear_batched

    imgs = rng.integers(0, 256, (3, 64, 48, 3), dtype=np.uint8)
    fs = np.asarray([0.9, 1.17, 1.4], np.float32)
    out = np.asarray(zoom_bilinear_batched(jnp.asarray(imgs), jnp.asarray(fs)))
    ref = np.concatenate(
        [np.asarray(wp.random_zoom(imgs[i : i + 1], float(fs[i]))) for i in range(3)]
    )
    err = np.abs(out.astype(int) - ref.astype(int))
    # <=1 LSB at <=1% of pixels: the XLA-CPU FMA contraction flips
    # 0.5-boundary pixels (grid-value factors hit many; see CLAUDE.md)
    assert err.max() <= 1 and (err > 0).mean() <= 0.01


def test_translate_dynamic_matches_apply_translation(rng):
    from imagetransformations_tpu.ops import warp as wp
    from imagetransformations_tpu.pipeline.batch import _translate_dynamic

    imgs = rng.integers(0, 256, (4, 40, 40, 3), dtype=np.uint8)
    vals = np.asarray([-35.0, 0.0, 12.0, 50.0], np.float32)
    out = np.asarray(_translate_dynamic(jnp.asarray(imgs), jnp.asarray(vals), 50))
    ref = np.concatenate(
        [
            np.asarray(wp.apply_translation(imgs[i : i + 1], float(v), float(v)))
            for i, v in enumerate(vals)
        ]
    )
    np.testing.assert_array_equal(out, ref)


def test_shear_bicubic_batched_matches_apply_shear(rng):
    """Traced-factor BICUBIC shear vs the exact PIL-semantics op (widened
    canvas cropped back): bit-exact — the vertical cubic collapses and the
    horizontal pass reproduces affine_warp's f32 tap/Horner ops."""
    from imagetransformations_tpu.ops import warp as wp
    from imagetransformations_tpu.ops.pallas.resample import shear_bicubic_batched

    imgs = rng.integers(0, 256, (3, 48, 40, 3), dtype=np.uint8)
    facs = [0.0, 0.4, 1.0]
    out = np.asarray(
        shear_bicubic_batched(jnp.asarray(imgs), jnp.asarray(facs, np.float32))
    )
    ref = np.concatenate(
        [
            np.asarray(wp.apply_shear(imgs[i : i + 1], float(v)))[:, :, :40]
            for i, v in enumerate(facs)
        ]
    )
    np.testing.assert_array_equal(out, ref)
