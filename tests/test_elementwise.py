"""Differential tests: elementwise TPU ops vs PIL/cv2 ground truth (bit-exact)."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import cv2
import jax.numpy as jnp

from imagetransformations_tpu import ops
from imagetransformations_tpu.oracle import elementwise as oe


@pytest.mark.parametrize("factor", [-0.05, -0.01, 0.0, 0.03, 0.05, 0.3])
def test_brightness_exact_vs_pil(rgb_image, factor):
    ref = np.asarray(ImageEnhance.Brightness(Image.fromarray(rgb_image)).enhance(1.0 + factor))
    out = np.asarray(ops.apply_brightness(jnp.asarray(rgb_image), factor))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(oe.brightness(rgb_image, factor), ref)


@pytest.mark.parametrize("alpha", [0.0, 0.1, 0.4, 0.7, 1.0])
def test_contrast_exact_vs_cv2(rgb_image, alpha):
    ref = cv2.convertScaleAbs(rgb_image, alpha=alpha, beta=0)
    out = np.asarray(ops.apply_contrast(jnp.asarray(rgb_image), alpha))
    np.testing.assert_array_equal(out, ref)
    np.testing.assert_array_equal(oe.contrast_cv2(rgb_image, alpha), ref)


def test_grayscale_exact_vs_pil(rgb_image):
    ref = np.asarray(Image.fromarray(rgb_image).convert("L"))
    out = np.asarray(ops.grayscale(jnp.asarray(rgb_image), keep_rgb=False))[..., 0]
    np.testing.assert_array_equal(out, ref)


def test_invert_exact(rgb_image):
    ref = np.asarray(ImageOps.invert(Image.fromarray(rgb_image)))
    out = np.asarray(ops.invert(jnp.asarray(rgb_image)))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("factor", [0.3, 0.8, 1.0, 1.4])
def test_enhance_contrast_exact_vs_pil(rgb_image, factor):
    ref = np.asarray(ImageEnhance.Contrast(Image.fromarray(rgb_image)).enhance(factor))
    out = np.asarray(ops.enhance_contrast(jnp.asarray(rgb_image), factor))
    # XLA's CPU backend FMA-contracts the blend (flips rare 0.5-boundary
    # pixels by 1 LSB); the TPU VPU rounds the product like PIL -> exact there
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1 and (d > 0).mean() <= 0.01
    np.testing.assert_array_equal(oe.enhance_contrast(rgb_image, factor), ref)


@pytest.mark.parametrize("factor", [0.2, 0.9, 1.5])
def test_enhance_color_exact_vs_pil(rgb_image, factor):
    ref = np.asarray(ImageEnhance.Color(Image.fromarray(rgb_image)).enhance(factor))
    out = np.asarray(ops.enhance_color(jnp.asarray(rgb_image), factor))
    d = np.abs(out.astype(int) - ref.astype(int))
    assert d.max() <= 1 and (d > 0).mean() <= 0.01  # CPU FMA boundary flips


def test_batched_per_image_params(rgb_batch):
    """One compiled op handles mixed per-image factors == per-image PIL calls."""
    factors = np.array([-0.05, 0.0, 0.02, 0.05], np.float32)
    out = np.asarray(ops.apply_brightness(jnp.asarray(rgb_batch), jnp.asarray(factors)))
    for i, f in enumerate(factors):
        ref = np.asarray(
            ImageEnhance.Brightness(Image.fromarray(rgb_batch[i])).enhance(1.0 + float(f))
        )
        np.testing.assert_array_equal(out[i], ref)


def test_float_passthrough_dtype(rgb_batch):
    x = jnp.asarray(rgb_batch, jnp.float32)
    out = ops.apply_brightness(x, 0.05)
    assert out.dtype == jnp.float32
