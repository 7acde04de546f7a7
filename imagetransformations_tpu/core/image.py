"""Canonical tensor model for image batches.

The framework-wide canonical layout is **NHWC** with dtype ``uint8`` at the HBM
boundary and ``float32`` (pixel range [0, 255]) inside compute. TPUs have no
efficient uint8 vector math, so every op unpacks to f32 on entry and repacks on
exit; chains of ops stay in f32 between stages (see pipeline.chain).

Quantization back to uint8 is op-dependent, matching the reference's exact
semantics (re-derived empirically, see oracle/):

- ``to_uint8_trunc``: PIL ``Image.blend``-style — float32 math then C-cast
  truncation (used by brightness; reference ``transformation.py:261-269``).
- ``to_uint8_rint`` : OpenCV ``convertScaleAbs``-style — float32 math then
  round-half-even (used by contrast; reference ``transformation.py:203-210``).
"""

from __future__ import annotations

import jax.numpy as jnp


def as_batch(x: jnp.ndarray) -> tuple[jnp.ndarray, bool]:
    """Promote HWC -> NHWC. Returns (batched array, was_single)."""
    if x.ndim == 3:
        return x[None], True
    if x.ndim != 4:
        raise ValueError(f"expected HWC or NHWC image array, got shape {x.shape}")
    return x, False


def restore_layout(x: jnp.ndarray, was_single: bool) -> jnp.ndarray:
    return x[0] if was_single else x


def as_float(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,255] (identity for float inputs)."""
    if x.dtype == jnp.float32:
        return x
    return x.astype(jnp.float32)


def to_uint8_trunc(x: jnp.ndarray) -> jnp.ndarray:
    """clip to [0,255] then truncate toward zero (PIL blend C-cast semantics)."""
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)


def to_uint8_rint(x: jnp.ndarray) -> jnp.ndarray:
    """round-half-even then clip (cv2.convertScaleAbs / cvRound semantics)."""
    return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)


def finalize(x: jnp.ndarray, like_dtype, mode: str = "rint") -> jnp.ndarray:
    """Return f32 result in the caller's dtype using the given quantization mode."""
    if like_dtype == jnp.uint8:
        return to_uint8_trunc(x) if mode == "trunc" else to_uint8_rint(x)
    return x
