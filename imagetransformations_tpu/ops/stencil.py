"""Stencil (small-convolution) ops: Gaussian/motion blur, sharpen, Sobel.

All ops are separable or 3x3 and run as fused multiply-add chains over the
batch under jit (NHWC f32); ``ops.pallas.stencil`` holds the tiled-VMEM Pallas
variants. Semantics match the CPU oracle (oracle/stencil.py):

- gaussian_blur : cv2.GaussianBlur, ksize=int(6r) odd min 3, sigma=r,
                  BORDER_REFLECT_101 (reference transformation.py:228-257).
- motion_blur   : horizontal 1xk mean (cifar_image_transformations.py:109-119).
- sharpen       : PIL ImageEnhance.Sharpness (SMOOTH 3x3 + trunc blend,
                  borders preserved).
- sobel_edges   : scipy.ndimage.sobel uint8-wraparound semantics
                  (transformation.py:339) plus a sane float mode.

Batched mixed radii use zero-padded taps of static length so one compiled
executable serves every radius in the grid (no per-value recompiles).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, as_float, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit
from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize, gaussian_taps

F32 = jnp.float32

#: max kernel size for the blur grid (radius<=5 -> ksize<=31).
MAX_BLUR_KSIZE = 31


def _finalize(x, like_dtype):
    if like_dtype == jnp.uint8:
        return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)
    return x


def _conv1d(x: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Separable 1D conv along H (axis=1) or W (axis=2), reflect-101 border.

    ``taps`` is [K] (shared) or [N, K] (per-image). Unrolled static-offset
    multiply-add chain — XLA fuses this into a single pass.
    """
    k = taps.shape[-1]
    p = k // 2
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (p, p)
    xp = jnp.pad(x, pad_width, mode="reflect")
    sl = [slice(None)] * x.ndim
    n = x.shape[axis]
    acc = None
    for t in range(k):
        sl[axis] = slice(t, t + n)
        w = taps[..., t]
        if w.ndim == 1:  # per-image [N]
            w = w.reshape(-1, 1, 1, 1)
        term = xp[tuple(sl)] * w
        acc = term if acc is None else acc + term
    return acc


@op_jit(static=("radius",))
def gaussian_blur(img: jnp.ndarray, radius: float) -> jnp.ndarray:
    """cv2.GaussianBlur semantics with a static (python float) radius."""
    if radius == 0:
        return img
    x, single = as_batch(img)
    k = cv2_gaussian_ksize(float(radius))
    taps = jnp.asarray(gaussian_taps(k, float(radius)), dtype=F32)
    out = _conv1d(_conv1d(as_float(x), taps, 1), taps, 2)
    return restore_layout(_finalize(out, img.dtype), single)


def blur_taps_batched(radii: jnp.ndarray, max_ksize: int = MAX_BLUR_KSIZE) -> jnp.ndarray:
    """Per-image cv2 Gaussian taps zero-padded to a static width -> [N, K].

    Reproduces the ksize rule int(6r)->odd->min 3 in traced arithmetic;
    radius == 0 yields an identity (delta) tap row.
    """
    r = jnp.asarray(radii, dtype=F32).reshape(-1, 1)
    k = jnp.floor(r * 6.0)
    k = jnp.where(jnp.mod(k, 2.0) == 0.0, k + 1.0, k)
    k = jnp.maximum(k, 3.0)
    half = (k - 1.0) / 2.0
    c = (max_ksize - 1) // 2
    x = jnp.arange(max_ksize, dtype=F32)[None, :] - F32(c)
    sigma = jnp.maximum(r, 1e-6)
    w = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    w = jnp.where(jnp.abs(x) <= half, w, 0.0)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    delta = (x == 0.0).astype(F32)
    return jnp.where(r == 0.0, delta, w)


def apply_blur(img: jnp.ndarray, radius) -> jnp.ndarray:
    """Reference apply_blur (transformation.py:228-257), batched.

    ``radius`` may be a python float (specialized kernel size) or an [N]
    array (shared compiled executable, padded taps).
    """
    if isinstance(radius, (int, float)):
        return gaussian_blur(img, float(radius))
    return _blur_batched(img, radius)


@op_jit
def _blur_batched(img: jnp.ndarray, radii) -> jnp.ndarray:
    x, single = as_batch(img)
    taps = blur_taps_batched(radii)
    out = _conv1d(_conv1d(as_float(x), taps, 1), taps, 2)
    return restore_layout(_finalize(out, img.dtype), single)


@op_jit(static=("ksize",))
def motion_blur(img: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Horizontal 1xk mean filter (cv2.filter2D, reflect-101)."""
    x, single = as_batch(img)
    taps = jnp.full((int(ksize),), 1.0 / int(ksize), dtype=F32)
    out = _conv1d(as_float(x), taps, 2)
    return restore_layout(_finalize(out, img.dtype), single)


def _smooth3x3(x: jnp.ndarray) -> jnp.ndarray:
    """PIL SMOOTH 3x3 conv with zero padding; borders replaced by input.

    Accumulates the INTEGER kernel sum exactly (max 13*255 < 2^24, f32-exact)
    and divides by 13 once — per-tap multiplication by k/13 in f32 flips
    0.5-boundary pixels by 1 LSB vs PIL.
    """
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    h, w = x.shape[1], x.shape[2]
    weights = (1.0, 1.0, 1.0, 1.0, 5.0, 1.0, 1.0, 1.0, 1.0)
    acc = None
    idx = 0
    for dy in range(3):
        for dx in range(3):
            term = xp[:, dy : dy + h, dx : dx + w, :] * weights[idx]
            acc = term if acc is None else acc + term
            idx += 1
    sm = jnp.floor(acc / 13.0 + 0.5)
    # PIL copies the 1-pixel border unchanged
    hy = jnp.arange(h).reshape(1, h, 1, 1)
    wx = jnp.arange(w).reshape(1, 1, w, 1)
    border = (hy == 0) | (hy == h - 1) | (wx == 0) | (wx == w - 1)
    return jnp.where(border, x, sm)


@op_jit
def sharpen(img: jnp.ndarray, factor) -> jnp.ndarray:
    """PIL ImageEnhance.Sharpness(factor): trunc-blend(SMOOTH(img), img, f).

    factor > 1 sharpens, < 1 smooths (cifar_image_transformations.py:93-99).
    """
    x, single = as_batch(img)
    xf = jnp.clip(jnp.trunc(as_float(x)), 0.0, 255.0)
    sm = _smooth3x3(xf)
    f = jnp.asarray(factor, dtype=F32)
    if f.ndim == 0:
        f = jnp.broadcast_to(f, (x.shape[0],))
    # note: XLA CPU FMA-contracts this blend (rare 1-LSB 0.5-boundary flips);
    # the TPU VPU rounds the product separately, matching PIL exactly
    out = sm + (xf - sm) * f.reshape(-1, 1, 1, 1)
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.trunc(out), 0.0, 255.0).astype(jnp.uint8)
    return restore_layout(out, single)


@op_jit(static=("mode",))
def sobel_edges(img: jnp.ndarray, mode: str = "wrap_u8") -> jnp.ndarray:
    """Sobel derivative along the last spatial axis.

    mode="wrap_u8" reproduces scipy.ndimage.sobel on uint8 (modulo-256
    wraparound, reflect border) as used by apply_background_change
    (transformation.py:339). mode="float" returns the unwrapped f32 response.
    Input: [N,H,W] or [H,W] grayscale (or NHWC -> luma is taken).
    """
    if img.ndim >= 3 and img.shape[-1] in (1, 3):
        from imagetransformations_tpu.ops.elementwise import grayscale

        img = grayscale(img, keep_rgb=False)[..., 0]
    x = img[None] if img.ndim == 2 else img
    xf = x.astype(jnp.int32) if mode == "wrap_u8" else x.astype(F32)
    # scipy.ndimage default mode='reflect' is symmetric (edge repeated),
    # unlike cv2's REFLECT_101 used by the blur ops.
    xp = jnp.pad(xf, [(0, 0), (1, 1), (1, 1)], mode="symmetric")
    h, w = x.shape[1], x.shape[2]

    def sl(dy, dx):
        return xp[:, dy : dy + h, dx : dx + w]

    # correlate with d/dx [-1,0,1] then smooth [1,2,1] along the other axis
    d = sl(0, 2) + 2 * sl(1, 2) + sl(2, 2) - sl(0, 0) - 2 * sl(1, 0) - sl(2, 0)
    if mode == "wrap_u8":
        out = jnp.mod(d, 256).astype(jnp.uint8)
    else:
        out = d.astype(F32)
    return out[0] if img.ndim == 2 else out


# --------------------------------------------------- PIL GaussianBlur (exact)


def _pil_box_pass(xi: jnp.ndarray, float_radius: float, axis: int) -> jnp.ndarray:
    """One PIL box-blur pass along ``axis`` (1=H, 2=W), bit-exact, int32.

    oracle/stencil._pil_box_pass_h defines the semantics. The sliding inner
    window is an exclusive-prefix-sum difference; the 24-bit fixed-point
    weights are split into 12-bit limbs so every product stays < 2^31 (TPUs
    run with int32; acc <= 255*(2l+1), limb <= 4095).
    """
    fr = np.float32(float_radius)
    l = int(fr)
    ww = int(np.float32(1 << 24) / (fr * np.float32(2) + np.float32(1)))
    fw = ((1 << 24) - (2 * l + 1) * ww) // 2
    ww_hi, ww_lo = ww >> 12, ww & 4095
    fw_hi, fw_lo = fw >> 12, fw & 4095
    n = xi.shape[axis]
    pad = [(0, 0)] * xi.ndim
    pad[axis] = (l + 1, l + 1)
    xe = jnp.pad(xi, pad, mode="edge")
    zshape = list(xe.shape)
    zshape[axis] = 1
    q = jnp.concatenate(
        [jnp.zeros(zshape, jnp.int32), jnp.cumsum(xe, axis=axis, dtype=jnp.int32)],
        axis=axis,
    )

    def sl(arr, start, length):
        s = [slice(None)] * arr.ndim
        s[axis] = slice(start, start + length)
        return arr[tuple(s)]

    acc = sl(q, 2 * l + 2, n) - sl(q, 1, n)  # inner 2l+1 taps
    lr = sl(xe, 0, n) + sl(xe, 2 * l + 2, n)  # two fractional edge taps
    a_hi = acc * ww_hi + lr * fw_hi + 2048  # +2048 == rounding 2^23 >> 12
    a_lo = acc * ww_lo + lr * fw_lo
    return (a_hi + (a_lo >> 12)) >> 12


@op_jit(static=("radius", "passes"))
def pil_box_blur(img: jnp.ndarray, radius: float, passes: int = 1) -> jnp.ndarray:
    """PIL ImageFilter.BoxBlur, bit-exact: H passes then V passes (int32)."""
    x, single = as_batch(img)
    xi = jnp.clip(jnp.trunc(as_float(x)), 0.0, 255.0).astype(jnp.int32)
    for _ in range(passes):
        xi = _pil_box_pass(xi, radius, 2)
    for _ in range(passes):
        xi = _pil_box_pass(xi, radius, 1)
    out = xi.astype(jnp.uint8) if img.dtype == jnp.uint8 else xi.astype(F32)
    return restore_layout(out, single)


@op_jit(static=("radius",))
def pil_gaussian_blur(img: jnp.ndarray, radius: float) -> jnp.ndarray:
    """PIL ImageFilter.GaussianBlur, bit-exact — the TransformationPool
    defocus_blur primitive (pipenline/cifar_image_transformations.py:72-76).

    PIL implements Gaussian blur as 3 extended-box passes per axis with a
    variance-matched fractional box radius (oracle/stencil.pil_gauss_box_radius,
    computed in f32 like the C code); each pass quantizes to uint8. The TPU
    kernel reproduces the integer pipeline exactly.
    """
    from imagetransformations_tpu.oracle.stencil import pil_gauss_box_radius

    return pil_box_blur(img, pil_gauss_box_radius(radius, 3), 3)
