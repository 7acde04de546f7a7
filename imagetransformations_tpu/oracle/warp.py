"""NumPy oracle for geometric warps — bit-exact PIL semantics.

Empirically verified conventions (tests/test_oracle_vs_pil.py):

- Inverse mapping: source coords xx = m0*(xo+0.5) + m1*(yo+0.5) + m2 (same for
  yy); a pixel is fill-colored iff (xx, yy) leaves [0,W)x[0,H).
- NEAREST: src index = floor(xx), floor(yy).
- BILINEAR: sample at (xx-0.5, yy-0.5), 2x2 window clamped to bounds,
  lerp a+(d)*(b-a), C-cast truncation.
- BICUBIC: PIL Geometry.c BICUBIC macro (NOT Catmull-Rom):
  p(d) = v2 + d*((v3-v1) + d*((2v1-2v2+v3-v4) + d*(-v1+v2-v3+v4))),
  4x4 clamped window, clip to [0,255] then truncate.
- LANCZOS resize (PIL Resample.c): separable, per-output-pixel float64
  coefficients quantized to 22-bit fixed point, int accumulation with
  pre-added rounding half, horizontal-then-vertical pass order. Bit-exact.
"""

from __future__ import annotations

import math

import numpy as np

PRECISION_BITS = 22  # PIL: 32 - 8 - 2


# ---------------------------------------------------------------- matrices


def pil_rotate_matrix(angle_deg: float, w: int, h: int) -> tuple:
    """PIL Image.rotate(angle, expand=False) inverse-map affine matrix.

    Note PIL negates the angle internally; the reference calls
    ``img.rotate(-angle)`` (transformation.py:198-201), so the *reference* op
    ``apply_rotation(img, a)`` uses ``pil_rotate_matrix(-a, ...)``.
    """
    angle = -math.radians(angle_deg % 360.0)
    m = [
        round(math.cos(angle), 15),
        round(math.sin(angle), 15),
        0.0,
        round(-math.sin(angle), 15),
        round(math.cos(angle), 15),
        0.0,
    ]
    cx, cy = w / 2.0, h / 2.0
    m[2] = m[0] * (-cx) + m[1] * (-cy) + cx
    m[5] = m[3] * (-cx) + m[4] * (-cy) + cy
    return tuple(m)


def shear_matrix(shear_factor: float, h: int) -> tuple:
    """transformation.py:212-226: (1, s, -ceil(s*h) if s>0 else 0, 0, 1, 0)."""
    shift = int(math.ceil(shear_factor * h))
    return (1.0, shear_factor, float(-shift if shear_factor > 0 else 0), 0.0, 1.0, 0.0)


def shear_out_width(shear_factor: float, w: int, h: int) -> int:
    return w + int(math.ceil(shear_factor * h))


# ---------------------------------------------------------------- warps


def _coords(m, out_h: int, out_w: int):
    yo, xo = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    xx = m[0] * (xo + 0.5) + m[1] * (yo + 0.5) + m[2]
    yy = m[3] * (xo + 0.5) + m[4] * (yo + 0.5) + m[5]
    return xx, yy


def affine_nearest(img: np.ndarray, m, out_size=None, fill=0) -> np.ndarray:
    """NEAREST inverse-map warp: src = floor(direct f64 coords).

    PIL's C fast path accumulates coordinates incrementally (with compiler
    FMA contraction), which can flip floor() when a source coordinate lands
    within ~1 ULP of an integer (e.g. 45 deg on an even-sized square). Those
    degenerate boundary pixels are the only deviation from PIL (<0.5% in the
    worst constructed case, 0 for typical angles); direct evaluation is the
    canonical oracle semantics.
    """
    h, w = img.shape[:2]
    out_h, out_w = out_size or (h, w)
    xx, yy = _coords(m, out_h, out_w)
    xi, yi = np.floor(xx).astype(np.int64), np.floor(yy).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.full((out_h, out_w) + img.shape[2:], fill, img.dtype)
    out[valid] = img[yi[valid], xi[valid]]
    return out


def affine_bilinear(img: np.ndarray, m, out_size=None, fill=0) -> np.ndarray:
    h, w = img.shape[:2]
    out_h, out_w = out_size or (h, w)
    xx, yy = _coords(m, out_h, out_w)
    valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    xin, yin = xx - 0.5, yy - 0.5
    x0, y0 = np.floor(xin).astype(np.int64), np.floor(yin).astype(np.int64)
    fx = (xin - x0)[..., None] if img.ndim == 3 else (xin - x0)
    fy = (yin - y0)[..., None] if img.ndim == 3 else (yin - y0)
    f = img.astype(np.float64)

    def s(yyi, xxi):
        return f[np.clip(yyi, 0, h - 1), np.clip(xxi, 0, w - 1)]

    a, b = s(y0, x0), s(y0, x0 + 1)
    c, d = s(y0 + 1, x0), s(y0 + 1, x0 + 1)
    v1 = a + fx * (b - a)
    v2 = c + fx * (d - c)
    out = v1 + fy * (v2 - v1)
    q = np.clip(np.trunc(out), 0, 255)
    mask = valid[..., None] if img.ndim == 3 else valid
    return np.where(mask, q, np.float64(fill)).astype(np.uint8)


def _pil_cubic(v1, v2, v3, v4, d):
    p2 = -v1 + v3
    p3 = 2 * (v1 - v2) + v3 - v4
    p4 = -v1 + v2 - v3 + v4
    return v2 + d * (p2 + d * (p3 + d * p4))


def affine_bicubic(img: np.ndarray, m, out_size=None, fill=0) -> np.ndarray:
    h, w = img.shape[:2]
    out_h, out_w = out_size or (h, w)
    xx, yy = _coords(m, out_h, out_w)
    valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    xin, yin = xx - 0.5, yy - 0.5
    x0, y0 = np.floor(xin).astype(np.int64), np.floor(yin).astype(np.int64)
    fx = xin - x0
    fy = yin - y0
    if img.ndim == 3:
        fx, fy = fx[..., None], fy[..., None]
    f = img.astype(np.float64)
    rows = []
    for j in range(-1, 3):
        cols = [f[np.clip(y0 + j, 0, h - 1), np.clip(x0 + i, 0, w - 1)] for i in range(-1, 3)]
        rows.append(_pil_cubic(cols[0], cols[1], cols[2], cols[3], fx))
    out = _pil_cubic(rows[0], rows[1], rows[2], rows[3], fy)
    q = np.where(out <= 0, 0.0, np.where(out >= 255, 255.0, np.trunc(out)))
    mask = valid[..., None] if img.ndim == 3 else valid
    return np.where(mask, q, np.float64(fill)).astype(np.uint8)


# ---------------------------------------------------------------- PIL resize


def _sinc(x):
    out = np.ones_like(x)
    nz = x != 0
    px = np.pi * x[nz]
    out[nz] = np.sin(px) / px
    return out


def lanczos_filter(x, a=3.0):
    x = np.asarray(x, np.float64)
    return np.where(np.abs(x) < a, _sinc(x) * _sinc(x / a), 0.0)


def bilinear_filter(x):
    x = np.abs(np.asarray(x, np.float64))
    return np.maximum(1.0 - x, 0.0)


def box_filter(x):
    x = np.asarray(x, np.float64)
    return np.where((x > -0.5) & (x <= 0.5), 1.0, 0.0)


_FILTERS = {
    "lanczos": (lanczos_filter, 3.0),
    "bilinear": (bilinear_filter, 1.0),
    "box": (box_filter, 0.5),
}


def resize_coeffs(in_size: int, out_size: int, method: str = "lanczos"):
    """PIL Resample.c precompute_coeffs: per-output (xmin, taps[fixed-point])."""
    filt, support0 = _FILTERS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    ss = 1.0 / filterscale
    ksize = int(np.ceil(support)) * 2 + 1
    bounds = np.zeros((out_size, 2), np.int64)
    kk = np.zeros((out_size, ksize), np.int64)
    for xo in range(out_size):
        center = (xo + 0.5) * scale
        xmin = int(max(0, center - support + 0.5))
        xmax = int(min(in_size, center + support + 0.5)) - xmin
        w = filt((np.arange(xmax) + xmin - center + 0.5) * ss)
        w = w / w.sum()
        kk[xo, :xmax] = np.where(
            w < 0, w * (1 << PRECISION_BITS) - 0.5, w * (1 << PRECISION_BITS) + 0.5
        ).astype(np.int64)
        bounds[xo] = (xmin, xmax)
    return bounds, kk


def _resample_axis(arr: np.ndarray, out_size: int, axis: int, method: str) -> np.ndarray:
    in_size = arr.shape[axis]
    bounds, kk = resize_coeffs(in_size, out_size, method)
    arr = np.moveaxis(arr, axis, 0).astype(np.int64)
    out = np.zeros((out_size,) + arr.shape[1:], np.int64)
    init = 1 << (PRECISION_BITS - 1)
    for o in range(out_size):
        xmin, xmax = bounds[o]
        acc = np.full(arr.shape[1:], init, np.int64)
        for t in range(xmax):
            acc += arr[xmin + t] * kk[o, t]
        out[o] = np.clip(acc >> PRECISION_BITS, 0, 255)
    return np.moveaxis(out, 0, axis).astype(np.uint8)


def pil_resize(img: np.ndarray, out_w: int, out_h: int, method: str = "lanczos") -> np.ndarray:
    """PIL Image.resize bit-exact (horizontal pass then vertical pass)."""
    t = _resample_axis(img, out_w, axis=1, method=method)
    return _resample_axis(t, out_h, axis=0, method=method)


# ---------------------------------------------------------------- reference ops


def apply_scale(img: np.ndarray, scale_factor: float) -> np.ndarray:
    """transformation.py:173-196: LANCZOS resize then center crop / black pad."""
    h, w = img.shape[:2]
    nw, nh = int(w * scale_factor), int(h * scale_factor)
    scaled = pil_resize(img, nw, nh, "lanczos")
    if scale_factor > 1.0:
        left = (nw - w) // 2
        top = (nh - h) // 2
        return scaled[top : top + h, left : left + w]
    if scale_factor < 1.0:
        out = np.zeros_like(img)
        px, py = (w - nw) // 2, (h - nh) // 2
        out[py : py + nh, px : px + nw] = scaled
        return out
    return scaled


def apply_rotation(img: np.ndarray, angle: float) -> np.ndarray:
    """transformation.py:198-201: img.rotate(-angle, black fill, NEAREST)."""
    h, w = img.shape[:2]
    return affine_nearest(img, pil_rotate_matrix(-angle, w, h), fill=0)


def apply_shear(img: np.ndarray, shear_factor: float) -> np.ndarray:
    """transformation.py:212-226: widened canvas, BICUBIC, white fill."""
    h, w = img.shape[:2]
    m = shear_matrix(shear_factor, h)
    return affine_bicubic(img, m, out_size=(h, shear_out_width(shear_factor, w, h)), fill=255)


def apply_translation(img: np.ndarray, tx: int, ty: int) -> np.ndarray:
    """transformation.py:284-307: integer crop+paste on black canvas."""
    h, w = img.shape[:2]
    out = np.zeros_like(img)
    tx, ty = int(tx), int(ty)
    src_x0, src_y0 = max(0, -tx), max(0, -ty)
    src_x1, src_y1 = min(w, w - tx), min(h, h - ty)
    if src_x0 < src_x1 and src_y0 < src_y1:
        dst_x0, dst_y0 = max(0, tx), max(0, ty)
        out[dst_y0 : dst_y0 + (src_y1 - src_y0), dst_x0 : dst_x0 + (src_x1 - src_x0)] = img[
            src_y0:src_y1, src_x0:src_x1
        ]
    return out
