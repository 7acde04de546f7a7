"""Composite ops: background change (edge-mask compositing), random crop.

Parity map:
- transformation.py:328-346 (apply_background_change): grayscale -> sobel ->
  >70th-percentile mask -> binary dilation x3 -> composite original over a
  solid background color. The uint8-wraparound sobel (scipy semantics) is
  reproduced; dilation is three 3x3 max-pool steps; the percentile is a
  per-image quantile.
- transformation.py:349-354 (apply_background_change_simple): 70/30 blend
  with the background (PIL Image.blend truncation semantics).
- fall_2025/transformations_code:43-49 (rand_crop): pad + random crop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, as_float, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit
from imagetransformations_tpu.ops.elementwise import grayscale
from imagetransformations_tpu.ops.stencil import sobel_edges

F32 = jnp.float32


def _dilate3x3(mask: jnp.ndarray, iterations: int = 3) -> jnp.ndarray:
    """Binary dilation with a 3x3 structuring element (scipy default)."""
    m = mask.astype(F32)
    for _ in range(iterations):
        mp = jnp.pad(m, [(0, 0), (1, 1), (1, 1)])
        h, w = m.shape[1], m.shape[2]
        stacks = [
            mp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
        ]
        m = jnp.max(jnp.stack(stacks), axis=0)
    return m > 0.5


@op_jit
def apply_background_change(img: jnp.ndarray, bg_color: jnp.ndarray) -> jnp.ndarray:
    """Replace the background with a solid color, keeping edge-dense regions.

    bg_color: [3] in [0,1] (reference passes 0-1 floats and scales by 255).
    """
    x, single = as_batch(img)
    gray = grayscale(x, keep_rgb=False)[..., 0]
    edges = sobel_edges(gray, mode="wrap_u8").astype(F32)  # [N,H,W]
    thresh = jnp.quantile(edges.reshape(x.shape[0], -1), 0.7, axis=1)
    edge_mask = edges > thresh[:, None, None]
    fg = _dilate3x3(edge_mask, 3)
    bg = jnp.trunc(jnp.asarray(bg_color, F32) * 255.0)
    out = jnp.where(fg[..., None], as_float(x), bg)
    out = out.astype(jnp.uint8) if img.dtype == jnp.uint8 else out
    return restore_layout(out, single)


@op_jit
def apply_background_change_simple(img: jnp.ndarray, bg_color: jnp.ndarray) -> jnp.ndarray:
    """70/30 PIL blend with a solid background (transformation.py:349-354)."""
    x, single = as_batch(img)
    bg = jnp.trunc(jnp.asarray(bg_color, F32) * 255.0)
    out = as_float(x) + F32(0.3) * (bg - as_float(x))
    out = jnp.clip(jnp.trunc(out), 0, 255)
    out = out.astype(jnp.uint8) if img.dtype == jnp.uint8 else out
    return restore_layout(out, single)


@op_jit(static=("pad",))
def random_crop(img: jnp.ndarray, key: jax.Array, pad: int = 4) -> jnp.ndarray:
    """Reflect-pad then random crop back to the original size
    (transformations_code:43-49 / torchvision RandomCrop(32, padding=4))."""
    x, single = as_batch(img)
    n, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, 2 * pad + 1)
    x0 = jax.random.randint(kx, (), 0, 2 * pad + 1)
    out = jax.lax.dynamic_slice(xp, (0, y0, x0, 0), (n, h, w, c))
    return restore_layout(out, single)


def apply_camera_distance(img: jnp.ndarray, distance_factor: float) -> jnp.ndarray:
    """transformation.py:309-315: scale by neutral/distance."""
    from imagetransformations_tpu.ops.warp import apply_scale

    return apply_scale(img, 2.75 / float(distance_factor))


def apply_xy_translation_3d(img: jnp.ndarray, tx: float, ty: float) -> jnp.ndarray:
    """transformation.py:317-322: fractional-of-size translation."""
    from imagetransformations_tpu.ops.warp import apply_translation

    x, _ = as_batch(img)
    return apply_translation(img, float(int(tx * x.shape[2])), float(int(ty * x.shape[1])))


def apply_rotation_3d(img: jnp.ndarray, angle: float) -> jnp.ndarray:
    """transformation.py:324-325: alias of apply_rotation."""
    from imagetransformations_tpu.ops.warp import apply_rotation

    return apply_rotation(img, angle)
