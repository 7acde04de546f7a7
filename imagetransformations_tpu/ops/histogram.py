"""Per-image histogram ops: equalization and pixel-entropy.

Histogram computation is a per-image 256-bin scatter-add (vmapped
``.at[].add``); the Pallas variant lives in ops.pallas. Semantics:

- ``equalize_channel``: cv2.equalizeHist LUT — cdf excluding empty bins,
  lut = round((cdf - cdf_min) / (N - cdf_min) * 255).
- ``histogram_equalization``: the reference's YUV-space equalization
  (pipenline/cifar_image_transformations.py:122-129).
- ``image_entropy``: 256-bin grayscale Shannon entropy used by
  conditional TENT (fall_2025/TENT_Pipelines.py:99-121).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit

F32 = jnp.float32


@op_jit(static=("bins",))
def pixel_histogram(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Per-image histogram of uint8-valued pixels -> [N, bins] (int32)."""
    x, _ = as_batch(img)
    flat = jnp.clip(x.astype(jnp.int32), 0, bins - 1).reshape(x.shape[0], -1)

    def one(v):
        return jnp.zeros((bins,), jnp.int32).at[v].add(1)

    return jax.vmap(one)(flat)


@op_jit
def equalize_channel(chan: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist on [N,H,W] uint8-valued channel."""
    x = chan[None] if chan.ndim == 2 else chan
    n = x.shape[0]
    hist = pixel_histogram(x[..., None])
    cdf = jnp.cumsum(hist, axis=1)
    # first nonzero cdf value per image
    has = hist > 0
    big = jnp.where(has, cdf, jnp.iinfo(jnp.int32).max)
    cdf_min = jnp.min(big, axis=1, keepdims=True)
    total = x.shape[1] * x.shape[2]
    denom = jnp.maximum(total - cdf_min, 1).astype(F32)
    lut = jnp.clip(jnp.rint((cdf - cdf_min).astype(F32) * 255.0 / denom), 0, 255)
    out = jnp.take_along_axis(
        lut, jnp.clip(x.astype(jnp.int32), 0, 255).reshape(n, -1), axis=1
    ).reshape(x.shape)
    out = out.astype(chan.dtype if chan.dtype == jnp.uint8 else F32)
    return out[0] if chan.ndim == 2 else out


# cv2 RGB<->YUV (BT.601 analog YUV) float coefficients
_RGB2YUV = jnp.array(
    [[0.299, 0.587, 0.114], [-0.14713, -0.28886, 0.436], [0.615, -0.51499, -0.10001]],
    F32,
)
_YUV2RGB = jnp.array(
    [[1.0, 0.0, 1.13983], [1.0, -0.39465, -0.58060], [1.0, 2.03211, 0.0]], F32
)


@op_jit
def histogram_equalization(img: jnp.ndarray) -> jnp.ndarray:
    """YUV-space luma equalization (cifar_image_transformations.py:122-129).

    cv2's integer YUV conversion is approximated in f32 (<=2 LSB of cv2,
    verified in tests); the equalization LUT itself is exact.
    """
    x, single = as_batch(img)
    xf = x.astype(F32)
    yuv = jnp.einsum("nhwc,kc->nhwk", xf, _RGB2YUV)
    y = jnp.clip(jnp.rint(yuv[..., 0]), 0, 255)
    y_eq = equalize_channel(y).astype(F32)
    u = yuv[..., 1]
    v = yuv[..., 2]
    rgb = jnp.einsum("nhwk,ck->nhwc", jnp.stack([y_eq, u, v], -1), _YUV2RGB)
    out = jnp.clip(jnp.rint(rgb), 0, 255)
    out = out.astype(jnp.uint8) if img.dtype == jnp.uint8 else out
    return restore_layout(out, single)


@op_jit(static=("base2",))
def image_entropy(img: jnp.ndarray, base2: bool = True) -> jnp.ndarray:
    """Shannon entropy of the per-image 256-bin grayscale pixel histogram.

    Reference compute_shannon_entropy (fall_2025/TENT_Pipelines.py:99-121):
    grayscale, histogram over pixel values, p log p over nonzero bins.
    Returns [N] f32.
    """
    x, _ = as_batch(img)
    if x.shape[-1] == 3:
        from imagetransformations_tpu.ops.elementwise import grayscale

        x = grayscale(x, keep_rgb=False)
    hist = pixel_histogram(x).astype(F32)
    p = hist / jnp.sum(hist, axis=1, keepdims=True)
    logp = jnp.where(p > 0, jnp.log2(p) if base2 else jnp.log(p), 0.0)
    return -jnp.sum(p * logp, axis=1)
