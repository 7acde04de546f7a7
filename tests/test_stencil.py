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
