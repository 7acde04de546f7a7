"""Elementwise (photometric) image ops — one fused VPU pass under jit.

Each op is a pure ``f(NHWC, params[N]) -> NHWC`` function; uint8 inputs are
unpacked to f32 at entry and repacked with the *reference-exact* quantization
(trunc for PIL-blend ops, rint for cv2 ops). Chains of these ops fuse into a
single XLA kernel; ``ops.pallas.elementwise`` provides the hand-fused Pallas
variant used by the benchmark pipeline.

Reference semantics reproduced (cites into /root/reference):
- brightness  : transformation.py:261-269  (PIL ImageEnhance.Brightness)
- contrast    : transformation.py:203-210  (cv2.convertScaleAbs)
- grayscale   : PIL convert('L') fixed-point luma (used by enhance/color paths)
- enhance_*   : pipenline/cifar_image_transformations.py:72-107
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, as_float, finalize, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit

F32 = jnp.float32


def _pvec(p, n: int) -> jnp.ndarray:
    """Broadcast a python scalar or [N] vector to [N,1,1,1] f32."""
    p = jnp.asarray(p, dtype=F32)
    if p.ndim == 0:
        p = jnp.broadcast_to(p, (n,))
    return p.reshape(-1, 1, 1, 1)


@op_jit
def apply_brightness(img: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Brightness(1.0 + factor); factor in [-0.05, 0.05] grid."""
    x, single = as_batch(img)
    out = as_float(x) * (F32(1.0) + _pvec(factor, x.shape[0]))
    return restore_layout(finalize(out, img.dtype, "trunc"), single)


@op_jit
def apply_contrast(img: jnp.ndarray, alpha) -> jnp.ndarray:
    """cv2.convertScaleAbs(img, alpha=c, beta=0): clip(rint(f32(px) * f32(c)))."""
    x, single = as_batch(img)
    out = as_float(x) * _pvec(alpha, x.shape[0])
    return restore_layout(finalize(out, img.dtype, "rint"), single)


@op_jit(static=("keep_rgb",))
def grayscale(img: jnp.ndarray, keep_rgb: bool = True) -> jnp.ndarray:
    """PIL convert('L'): (r*19595 + g*38470 + b*7471 + 0x8000) >> 16.

    For f32 inputs the same fixed-point math is applied to the truncated pixel
    values so chained (f32-intermediate) pipelines stay bit-identical to the
    uint8-roundtrip path.
    """
    x, single = as_batch(img)
    xi = jnp.clip(jnp.trunc(as_float(x)), 0.0, 255.0).astype(jnp.int32)
    luma = (
        xi[..., 0] * 19595 + xi[..., 1] * 38470 + xi[..., 2] * 7471 + 0x8000
    ) >> 16
    if keep_rgb:
        out = jnp.repeat(luma[..., None], 3, axis=-1)
    else:
        out = luma[..., None]
    out = out.astype(img.dtype if img.dtype == jnp.uint8 else F32)
    return restore_layout(out, single)


@op_jit
def invert(img: jnp.ndarray) -> jnp.ndarray:
    """255 - px (PIL ImageOps.invert)."""
    x, single = as_batch(img)
    out = F32(255.0) - as_float(x)
    return restore_layout(finalize(out, img.dtype, "rint"), single)


@op_jit
def enhance_contrast(img: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Contrast: trunc-blend toward int(mean(L) + 0.5).

    The mean is a per-image reduction — still a single fused pass on TPU.
    """
    x, single = as_batch(img)
    # int32 accumulation: the mean below computes 2*total, so exactness
    # needs sum(L) < 2^30 — images up to ~2050x2050 at worst-case
    # brightness. (jax x64 is disabled, so int64 truncated to int32
    # anyway — this is the same arithmetic, without the dtype warning.)
    gray = grayscale(x, keep_rgb=False).astype(jnp.int32)
    # PIL: mean = int(Stat(L).mean + 0.5); integer math keeps the .5 boundary
    # exact (f32 accumulation can flip it by 1)
    total = jnp.sum(gray, axis=(1, 2, 3), keepdims=True)
    npix = gray.shape[1] * gray.shape[2]
    mean = ((2 * total + npix) // (2 * npix)).astype(F32)
    # note: XLA CPU FMA-contracts this blend (rare 1-LSB 0.5-boundary flips);
    # the TPU VPU rounds the product separately, matching PIL exactly
    out = mean + (as_float(x) - mean) * _pvec(factor, x.shape[0])
    return restore_layout(finalize(out, img.dtype, "trunc"), single)


@op_jit
def enhance_color(img: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Color: trunc-blend toward per-pixel luma."""
    x, single = as_batch(img)
    gray = grayscale(x, keep_rgb=False).astype(F32)
    out = gray + (as_float(x) - gray) * _pvec(factor, x.shape[0])
    return restore_layout(finalize(out, img.dtype, "trunc"), single)
