"""Differential tests: stencil ops vs cv2 / PIL / scipy (<=1 LSB gate)."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

import cv2
import jax.numpy as jnp
from scipy import ndimage

from imagetransformations_tpu import ops
from imagetransformations_tpu.oracle import stencil as ost
from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize


@pytest.mark.parametrize("radius", [0.5, 1.0, 2.5, 5.0])
def test_gaussian_blur_vs_cv2_1lsb(rgb_image, radius):
    k = cv2_gaussian_ksize(radius)
    ref = cv2.GaussianBlur(rgb_image, (k, k), radius)
    out = np.asarray(ops.gaussian_blur(jnp.asarray(rgb_image), radius))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1
    # oracle itself also within 1 LSB of cv2's fixed-point 8U path
    assert np.abs(ost.gaussian_blur(rgb_image, radius).astype(int) - ref.astype(int)).max() <= 1


def test_gaussian_blur_zero_radius_identity(rgb_image):
    out = np.asarray(ops.gaussian_blur(jnp.asarray(rgb_image), 0.0))
    np.testing.assert_array_equal(out, rgb_image)


def test_blur_batched_matches_static(rgb_batch):
    """Padded-tap batched blur == per-radius specialized blur."""
    radii = np.array([0.0, 0.5, 2.0, 5.0], np.float32)
    out = np.asarray(ops.apply_blur(jnp.asarray(rgb_batch), jnp.asarray(radii)))
    for i, r in enumerate(radii):
        ref = np.asarray(ops.gaussian_blur(jnp.asarray(rgb_batch[i : i + 1]), float(r)))[0]
        assert np.abs(out[i].astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("k", [3, 5, 9])
def test_motion_blur_vs_cv2(rgb_image, k):
    kern = np.zeros((1, k))
    kern[0, :] = 1.0 / k
    ref = cv2.filter2D(rgb_image, -1, kern)
    out = np.asarray(ops.motion_blur(jnp.asarray(rgb_image), k))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@pytest.mark.parametrize("factor", [0.2, 0.8, 1.5, 2.0])
def test_sharpen_exact_vs_pil(rgb_image, factor):
    ref = np.asarray(ImageEnhance.Sharpness(Image.fromarray(rgb_image)).enhance(factor))
    out = np.asarray(ops.sharpen(jnp.asarray(rgb_image), factor))
    # CPU-backend FMA contraction flips rare 0.5-boundary pixels by 1 LSB;
    # exact on the TPU VPU (separate product rounding, like PIL)
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1 and (d > 0).mean() <= 0.01
    np.testing.assert_array_equal(ost.sharpness(rgb_image, factor), ref)


def test_sobel_exact_vs_scipy(rgb_image):
    gray = np.asarray(Image.fromarray(rgb_image).convert("L"))
    ref = ndimage.sobel(gray)  # uint8 in, uint8 wraparound out
    out = np.asarray(ops.sobel_edges(jnp.asarray(gray)))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(ost.sobel_u8_wrap(gray), ref)


class TestPILGaussianBlur:
    """PIL GaussianBlur/BoxBlur bit-exactness (the TransformationPool
    defocus primitive): oracle vs real PIL, TPU op vs real PIL."""

    def test_oracle_box_blur_exact_vs_pil(self, rng):
        from PIL import Image, ImageFilter

        from imagetransformations_tpu.oracle.stencil import pil_box_blur

        img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        for r in (0.0, 0.5, 1.0, 2.3, 4.75):
            ref = np.asarray(Image.fromarray(img).filter(ImageFilter.BoxBlur(r)))
            assert np.array_equal(pil_box_blur(img, r), ref), r

    def test_oracle_gaussian_exact_vs_pil(self, rng):
        from PIL import Image, ImageFilter

        from imagetransformations_tpu.oracle.stencil import pil_gaussian_blur

        for hw in ((16, 17), (32, 32), (37, 53)):
            img = rng.integers(0, 256, hw + (3,), dtype=np.uint8)
            for r in (0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 10.0):
                ref = np.asarray(
                    Image.fromarray(img).filter(ImageFilter.GaussianBlur(r))
                )
                assert np.array_equal(pil_gaussian_blur(img, r), ref), (hw, r)

    def test_op_gaussian_exact_vs_pil_batched(self, rng):
        from PIL import Image, ImageFilter

        from imagetransformations_tpu.ops.stencil import pil_gaussian_blur

        imgs = rng.integers(0, 256, (3, 32, 32, 3), dtype=np.uint8)
        for r in (1.0, 3.0, 6.0, 10.0):
            out = np.asarray(pil_gaussian_blur(jnp.asarray(imgs), r))
            for i in range(3):
                ref = np.asarray(
                    Image.fromarray(imgs[i]).filter(ImageFilter.GaussianBlur(r))
                )
                assert np.array_equal(out[i], ref), (i, r)

    def test_op_box_blur_exact_vs_pil(self, rng):
        from PIL import Image, ImageFilter

        from imagetransformations_tpu.ops.stencil import pil_box_blur

        imgs = rng.integers(0, 256, (2, 24, 31, 3), dtype=np.uint8)
        for r in (0.5, 2.3):
            out = np.asarray(pil_box_blur(jnp.asarray(imgs), r))
            for i in range(2):
                ref = np.asarray(Image.fromarray(imgs[i]).filter(ImageFilter.BoxBlur(r)))
                assert np.array_equal(out[i], ref), (i, r)
