"""NumPy oracle for stencil (convolution) ops.

- ``gaussian_blur``: cv2.GaussianBlur semantics (transformation.py:228-257):
  ksize = int(6*radius) forced odd (min 3), sigma = radius, BORDER_REFLECT_101.
  cv2's 8U path is fixed-point; this float64 separable conv is within 1 LSB of
  it (verified in tests), and is the canonical ground truth for the TPU kernel.
- ``motion_blur``: horizontal 1xk mean kernel via cv2.filter2D
  (pipenline/cifar_image_transformations.py:109-119) — float path is exact.
- ``smooth`` / ``sharpness``: PIL ImageFilter.SMOOTH (3x3 [1,1,1;1,5,1;1,1,1]/13,
  borders copied unchanged) + ImageEnhance.Sharpness trunc-blend — exact.
- ``sobel``: scipy.ndimage.sobel on uint8 (wraps modulo 256 — reproduced
  faithfully), used by apply_background_change (transformation.py:328-346).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def cv2_gaussian_ksize(radius: float) -> int:
    """transformation.py:239-246 kernel-size rule."""
    k = int(radius * 6)
    if k % 2 == 0:
        k += 1
    if k < 3:
        k = 3
    return k


def gaussian_taps(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel semantics (sigma > 0): normalized exp(-x^2/2s^2)."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / w.sum()


def _reflect101_pad(img: np.ndarray, py: int, px: int) -> np.ndarray:
    pad = [(py, py), (px, px)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="reflect")


def _sep_conv(img_f: np.ndarray, taps: np.ndarray, axis: int) -> np.ndarray:
    from scipy.ndimage import convolve1d

    return convolve1d(img_f, taps, axis=axis, mode="constant")


def gaussian_blur(img: np.ndarray, radius: float) -> np.ndarray:
    """cv2.GaussianBlur(img, (k,k), radius); radius==0 -> identity."""
    if radius == 0:
        return img.copy()
    k = cv2_gaussian_ksize(radius)
    taps = gaussian_taps(k, radius)
    p = k // 2
    pad = _reflect101_pad(img.astype(np.float64), p, p)
    t = _sep_conv(_sep_conv(pad, taps, 0), taps, 1)
    out = t[p:-p, p:-p]
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def motion_blur(img: np.ndarray, ksize: int) -> np.ndarray:
    """Horizontal 1xk mean filter, reflect-101 border (cv2.filter2D default)."""
    taps = np.full(ksize, 1.0 / ksize, np.float64)
    p = ksize // 2
    pad = np.pad(img.astype(np.float64), [(0, 0), (p, p)] + [(0, 0)] * (img.ndim - 2), mode="reflect")
    t = _sep_conv(pad, taps, 1)[:, p:-p] if p else _sep_conv(pad, taps, 1)
    return np.clip(np.rint(t), 0, 255).astype(np.uint8)


SMOOTH_KERNEL = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float64) / 13.0


def smooth(img: np.ndarray) -> np.ndarray:
    """PIL ImageFilter.SMOOTH: 3x3 conv, floor(x+0.5), border rows/cols copied."""
    from scipy.ndimage import convolve

    x = img.astype(np.float64)
    if img.ndim == 3:
        conv = np.stack(
            [convolve(x[..., c], SMOOTH_KERNEL, mode="constant") for c in range(img.shape[-1])],
            axis=-1,
        )
    else:
        conv = convolve(x, SMOOTH_KERNEL, mode="constant")
    out = np.clip(np.floor(conv + 0.5), 0, 255).astype(np.uint8)
    out[0, :] = img[0, :]
    out[-1, :] = img[-1, :]
    out[:, 0] = img[:, 0]
    out[:, -1] = img[:, -1]
    return out


def sharpness(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Sharpness(factor): trunc-blend(smooth, img, factor)."""
    sm = smooth(img).astype(F32)
    out = sm + (img.astype(F32) - sm) * F32(factor)
    return np.clip(np.trunc(out), 0, 255).astype(np.uint8)


def sobel_u8_wrap(gray: np.ndarray, axis: int = -1) -> np.ndarray:
    """scipy.ndimage.sobel on uint8 input: int math wrapped modulo 256.

    Reproduces transformation.py:339 (``ndimage.sobel(img_array)`` where
    img_array is uint8) including the uint8 overflow artifacts.
    """
    from scipy.ndimage import correlate1d

    x = gray.astype(np.int64)
    ax = axis % 2
    other = 1 - ax
    d = correlate1d(x, [-1, 0, 1], axis=ax, mode="reflect")
    s = correlate1d(d, [1, 2, 1], axis=other, mode="reflect")
    return np.mod(s, 256).astype(np.uint8)


def background_change_mask(gray: np.ndarray) -> np.ndarray:
    """transformation.py:339-343: sobel -> >70th percentile -> dilate x3."""
    from scipy.ndimage import binary_dilation

    edges = sobel_u8_wrap(gray)
    edge_mask = edges > np.percentile(edges, 70)
    return binary_dilation(edge_mask, iterations=3)


# --------------------------------------------------- PIL GaussianBlur (exact)


def pil_gauss_box_radius(radius: float, passes: int = 3) -> float:
    """PIL GaussianBlur's box radius: Gwosdek extended-box variance matching.

    Pillow (BoxBlur.c) converts the Gaussian radius (= sigma) into ONE float
    box radius l+t per pass such that `passes` box passes reproduce the
    Gaussian variance exactly: sigma2 = r^2/passes, L = sqrt(12*sigma2 + 1),
    l = int((L-1)/2), t solves the variance equation for the fractional edge
    taps. All arithmetic is C float (f32) — f64 here flips 1-LSB pixels
    (e.g. r=1.0, where the f32-rounded 2^24/(2r+1) weight differs by 1).
    """
    r = np.float32(radius)
    sigma2 = r * r / np.float32(passes)
    ll = np.sqrt(np.float32(12.0) * sigma2 + np.float32(1.0), dtype=np.float32)
    l = int((ll - np.float32(1.0)) / np.float32(2.0))
    t = (
        np.float32(2 * l + 1)
        * (sigma2 - np.float32(l * (l + 1)) / np.float32(3.0))
        / (np.float32(2.0) * (np.float32((l + 1) ** 2) - sigma2))
    )
    return float(np.float32(l + t))


def _pil_box_pass_h(img_u8: np.ndarray, float_radius: float) -> np.ndarray:
    """One horizontal PIL box-blur pass (BoxBlur.c LineBoxBlur), bit-exact.

    Window: 2*int(r)+1 inner taps weight ww = trunc(f32(2^24)/(2r+1)), two
    edge taps (x +- (int(r)+1), clamped) weight fw = (2^24-(2l+1)ww)//2;
    out = (acc + 2^23) >> 24, quantized to u8 per pass.
    """
    fr = np.float32(float_radius)
    radius = int(fr)
    ww = int(np.float32(1 << 24) / (fr * np.float32(2) + np.float32(1)))
    fw = ((1 << 24) - (radius * 2 + 1) * ww) // 2
    w = img_u8.shape[1]
    x = np.arange(w)
    idx = np.clip(x[:, None] + np.arange(-radius, radius + 1)[None, :], 0, w - 1)
    acc = img_u8[:, idx].astype(np.int64).sum(axis=2)
    left = img_u8[:, np.clip(x - radius - 1, 0, w - 1)].astype(np.int64)
    right = img_u8[:, np.clip(x + radius + 1, 0, w - 1)].astype(np.int64)
    bulk = acc * ww + (left + right) * fw
    return ((bulk + (1 << 23)) >> 24).astype(np.uint8)


def pil_box_blur(img: np.ndarray, float_radius: float, passes: int = 1) -> np.ndarray:
    """PIL ImageFilter.BoxBlur, bit-exact: `passes` horizontal passes then
    `passes` vertical passes, each quantizing to uint8."""
    out = img
    for _ in range(passes):
        out = _pil_box_pass_h(out, float_radius)
    out = np.swapaxes(out, 0, 1)
    for _ in range(passes):
        out = _pil_box_pass_h(out, float_radius)
    return np.swapaxes(out, 0, 1)


def pil_gaussian_blur(img: np.ndarray, radius: float) -> np.ndarray:
    """PIL ImageFilter.GaussianBlur, bit-exact (3 extended-box passes).

    This is the TransformationPool defocus_blur primitive
    (pipenline/cifar_image_transformations.py:72-76, radii [3,4,6,8,10]).
    """
    return pil_box_blur(img, pil_gauss_box_radius(radius, 3), 3)
