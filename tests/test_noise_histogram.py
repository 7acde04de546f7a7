"""Differential tests: noise ops (shared randomness vs oracle) and histograms."""

import numpy as np
import pytest

import cv2
import jax
import jax.numpy as jnp

from imagetransformations_tpu import ops
from imagetransformations_tpu.oracle import elementwise as oe
from imagetransformations_tpu.ops.histogram import equalize_channel, image_entropy, pixel_histogram


def test_gaussian_noise_matches_oracle(rgb_batch, rng):
    noise = rng.standard_normal(rgb_batch.shape).astype(np.float32)
    stds = np.array([0.0, 0.03, 0.07, 0.1], np.float32)
    out = np.asarray(
        ops.apply_gaussian_noise(jnp.asarray(rgb_batch), jnp.asarray(stds), noise=jnp.asarray(noise))
    )
    for i, s in enumerate(stds):
        ref = oe.gaussian_noise(rgb_batch[i], float(s), noise[i])
        np.testing.assert_array_equal(out[i], ref)


def test_gaussian_noise_zero_std_identity(rgb_batch):
    key = jax.random.key(0)
    out = np.asarray(ops.apply_gaussian_noise(jnp.asarray(rgb_batch), 0.0, key=key))
    np.testing.assert_array_equal(out, rgb_batch)


def test_impulse_noise_matches_oracle(rgb_batch, rng):
    u = rng.random(rgb_batch.shape[:-1]).astype(np.float32)
    out = np.asarray(ops.impulse_noise(jnp.asarray(rgb_batch), 0.1, u=jnp.asarray(u)))
    for i in range(rgb_batch.shape[0]):
        ref = oe.impulse_noise(rgb_batch[i], 0.1, u[i])
        np.testing.assert_array_equal(out[i], ref)


def test_impulse_noise_rate(rgb_batch):
    key = jax.random.key(1)
    out = np.asarray(ops.impulse_noise(jnp.asarray(rgb_batch), 0.27, key=key))
    frac_extreme = ((out == 0) | (out == 255)).mean()
    assert 0.15 < frac_extreme  # ~27% of pixels forced (plus natural extremes)


def test_shot_noise_statistics(rgb_batch):
    key = jax.random.key(2)
    out = np.asarray(ops.shot_noise(jnp.asarray(rgb_batch), 60.0, key=key))
    assert out.dtype == np.uint8
    # mean roughly preserved by Poisson(x*lam)/lam
    assert abs(out.mean() - rgb_batch.mean()) < 12.0


def test_pixel_histogram_counts(rgb_batch):
    hist = np.asarray(pixel_histogram(jnp.asarray(rgb_batch)))
    assert hist.shape == (4, 256)
    assert (hist.sum(1) == 32 * 32 * 3).all()
    ref = np.bincount(rgb_batch[0].ravel(), minlength=256)
    np.testing.assert_array_equal(hist[0], ref)


def test_equalize_channel_exact_vs_cv2(rng):
    chan = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    ref = cv2.equalizeHist(chan)
    out = np.asarray(equalize_channel(jnp.asarray(chan)))
    np.testing.assert_array_equal(out, ref)


def test_histogram_equalization_close_to_cv2(rgb_image):
    yuv = cv2.cvtColor(rgb_image, cv2.COLOR_RGB2YUV)
    yuv[..., 0] = cv2.equalizeHist(yuv[..., 0])
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB)
    out = np.asarray(ops.histogram_equalization(jnp.asarray(rgb_image)))
    # cv2's integer YUV round-trip vs our f32 path: small tolerance
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 3.0


def test_image_entropy_matches_numpy(rgb_batch):
    ent = np.asarray(image_entropy(jnp.asarray(rgb_batch)))
    from PIL import Image

    for i in range(rgb_batch.shape[0]):
        gray = np.asarray(Image.fromarray(rgb_batch[i]).convert("L"))
        hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
        p = hist / hist.sum()
        ref = -(p[p > 0] * np.log2(p[p > 0])).sum()
        assert abs(ent[i] - ref) < 1e-3
