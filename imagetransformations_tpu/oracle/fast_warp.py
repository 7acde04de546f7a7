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


def _shear_rows_f32(v: np.ndarray, shifts: np.ndarray, fill: float) -> np.ndarray:
    """f32-streaming shear: lerp(v[y, x+k], v[y, x+k+1], f) with NO
    quantization — mirrors megakernel._shear_pass(quantize=False) op order
    (nbr-sub, mul, add; all f32 rounds, no FMA contraction)."""
    n, h, w, c = v.shape
    pad = max(int(np.ceil(np.abs(shifts).max())) + 1, 1)
    xp = np.pad(
        v.astype(F32), [(0, 0), (0, 0), (pad, pad + 1), (0, 0)],
        constant_values=F32(fill),
    )
    k = np.floor(shifts).astype(np.int64) + pad
    f = (shifts - np.floor(shifts)).astype(F32)
    out = np.empty_like(v, dtype=F32)
    for y in range(h):
        a = xp[:, y, k[y] : k[y] + w]
        b = xp[:, y, k[y] + 1 : k[y] + 1 + w]
        out[:, y] = a + f[y] * (b - a)
    return out


def _blur_f32(img_f: np.ndarray, radius: float) -> np.ndarray:
    """cv2-tap separable Gaussian in f32, reflect-101, NO quantization —
    mirrors the megakernel's paired tap_sum order exactly (center multiply
    first, then pairs t=0..p-1 as acc + taps[t]*(lo + hi))."""
    from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize, gaussian_taps

    ksize = cv2_gaussian_ksize(float(radius))
    taps = gaussian_taps(ksize, float(radius)).astype(F32)
    p = ksize // 2
    x = img_f.astype(F32)

    def tap_sum(src, axis):
        sl = lambda t: np.take(src, range(t, t + x.shape[axis + 1]), axis=axis + 1)
        acc = taps[p] * sl(p)
        for t in range(p):
            acc = acc + taps[t] * (sl(t) + sl(2 * p - t))
        return acc

    xp = np.pad(x, [(0, 0), (p, p), (0, 0), (0, 0)], mode="reflect")
    v = tap_sum(xp, 0)
    vp = np.pad(v, [(0, 0), (0, 0), (p, p), (0, 0)], mode="reflect")
    return tap_sum(vp, 1)


def grayscale_f32(v: np.ndarray) -> np.ndarray:
    """PIL L24 luma of f32 (possibly non-integer) values, floored — the
    stream-mode final quantization (megakernel._grayscale_rows order)."""
    w = np.asarray([19595.0, 38470.0, 7471.0], F32)
    q = v.astype(F32) * w
    sum3 = (q[..., 0] + q[..., 1]) + q[..., 2]
    luma = sum3 * F32(1.0 / 65536.0) + F32(0.5)
    out = np.floor(luma).astype(np.uint8)
    return np.repeat(out[..., None], 3, axis=-1)


def fused_stream_chain(
    img: np.ndarray, radius: float, angle_deg: float,
    grayscale_out: bool = False, fill: int = 0,
) -> np.ndarray:
    """f32-STREAMING fused chain oracle: blur -> 3-shear rotate
    (-> grayscale) composed entirely in f32 with ONE final quantization —
    the semantics of build_chain_fn's fast mode (chain.py: "elementwise/
    stencil stages keep f32 intermediates; uint8 quantization happens once
    at the end") and of megakernel stream=True. Higher quality than the
    per-op-quantized chain (no intermediate rounding).

    When rotating WITH grayscale, the kernel (and this oracle) commutes the
    per-pixel-linear grayscale to the FRONT of the chain — the blur and
    the shears are all linear — and runs everything on the single luma
    plane (megakernel._mega_gray1_kernel / _luma_blur_front). The luma is
    the EXACT integer L24 dot product converted to f32 (exact, < 2^24)
    and scaled by 2^-16 (exact); the kernel blurs the luma plane X-pass
    first, then Y-pass; the single final quantization is floor(v + 0.5)."""
    n, h, w, c = img.shape
    if grayscale_out and (angle_deg != 0.0 or radius > 0):
        xi = img.astype(np.int64)
        lum_i = (xi[..., 1] * 38470 + xi[..., 0] * 19595) + xi[..., 2] * 7471
        v = (lum_i.astype(F32) * F32(1.0 / 65536.0))[..., None]  # [n, h, w, 1]
        if radius > 0:
            # kernel blur order on the luma plane: X-pass then Y-pass —
            # run _blur_f32 (axis1 then axis2) on the transposed plane
            v = _blur_f32(v.transpose(0, 2, 1, 3), radius).transpose(0, 2, 1, 3)
        if angle_deg != 0.0:
            t = math.radians(-angle_deg)
            a, b = -math.tan(t / 2.0), math.sin(t)
            sx = _row_shifts(h, a, h / 2.0)
            sy = _row_shifts(w, b, w / 2.0)
            v = _shear_rows_f32(v, sx, fill)
            v = _shear_rows_f32(v.transpose(0, 2, 1, 3), sy, fill)
            v = _shear_rows_f32(v.transpose(0, 2, 1, 3), sx, fill)
        out = np.floor(v + F32(0.5)).astype(np.uint8)
        return np.repeat(out, 3, axis=-1)
    x = img.astype(F32)
    if radius > 0:
        x = _blur_f32(x, radius)
    if angle_deg != 0.0:
        t = math.radians(-angle_deg)
        a, b = -math.tan(t / 2.0), math.sin(t)
        x = _shear_rows_f32(x, _row_shifts(h, a, h / 2.0), fill)
        x = _shear_rows_f32(x.transpose(0, 2, 1, 3), _row_shifts(w, b, w / 2.0), fill)
        x = _shear_rows_f32(x.transpose(0, 2, 1, 3), _row_shifts(h, a, h / 2.0), fill)
        return np.clip(np.trunc(x), 0, 255).astype(np.uint8)
    if not grayscale_out:
        return np.clip(np.rint(x), 0, 255).astype(np.uint8)
    return grayscale_f32(x)
