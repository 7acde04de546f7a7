"""CPU oracle for the TPU fast-path warps (3-shear rotation).

The fast path's semantics are defined HERE (not by PIL): three per-row
fractional shifts with f32 lerp and uint8 truncation between passes — the
exact computation ops/pallas/shear.py performs on TPU. The <=1-LSB
differential gate for the fused benchmark pipeline runs against this oracle;
PIL-exact rotation remains available as ops.warp.apply_rotation and is gated
against PIL itself.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32


def shear_rows(img: np.ndarray, shifts: np.ndarray, fill: int = 0) -> np.ndarray:
    """out[n,y,x] = lerp(in[n,y,x+k], in[n,y,x+k+1], f), k=floor(s_y)."""
    n, h, w, c = img.shape
    pad = int(np.ceil(np.abs(shifts).max())) + 1
    pad = max(pad, 1)
    xp = np.pad(
        img, [(0, 0), (0, 0), (pad, pad + 1), (0, 0)], constant_values=fill
    ).astype(F32)
    k = np.floor(shifts).astype(np.int64) + pad
    f = (shifts - np.floor(shifts)).astype(F32)
    out = np.empty_like(img)
    for y in range(h):
        a = xp[:, y, k[y] : k[y] + w]
        b = xp[:, y, k[y] + 1 : k[y] + 1 + w]
        v = a + f[y] * (b - a)
        out[:, y] = np.clip(np.trunc(v), 0, 255).astype(np.uint8)
    return out


def _row_shifts(size: int, slope: float, center: float) -> np.ndarray:
    y = np.arange(size, dtype=np.float64) + 0.5
    return (slope * (y - center)).astype(F32)


def rotate_3shear(img: np.ndarray, angle_deg: float, fill: int = 0) -> np.ndarray:
    """Paeth 3-shear rotation, uint8-quantized between passes."""
    n, h, w, c = img.shape
    # sign matches apply_rotation (PIL rotate(-angle)), see pallas/shear.py
    t = math.radians(-angle_deg)
    a, b = -math.tan(t / 2.0), math.sin(t)
    x1 = shear_rows(img, _row_shifts(h, a, h / 2.0), fill)
    xt = x1.transpose(0, 2, 1, 3)
    x2 = shear_rows(xt, _row_shifts(w, b, w / 2.0), fill)
    x3 = x2.transpose(0, 2, 1, 3)
    return shear_rows(x3, _row_shifts(h, a, h / 2.0), fill)
