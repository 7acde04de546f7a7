"""NumPy oracle for elementwise (photometric) ops — bit-exact PIL/cv2 semantics.

Empirically verified equivalences (see tests/test_oracle_vs_pil.py):

- PIL ``ImageEnhance.Brightness(1+f)`` == ``clip(trunc(f32(x) * f32(1+f)))``
  (PIL Blend.c C-cast truncation, float32 arithmetic).
- cv2 ``convertScaleAbs(x, alpha)`` == ``clip(rint(f32(x) * f32(alpha)))``
  (cvRound = round-half-even, float32 arithmetic).
- PIL ``convert('L')`` == ``(r*19595 + g*38470 + b*7471 + 0x8000) >> 16``.
- PIL ``ImageEnhance.Contrast(f)`` == trunc-blend toward
  ``int(mean(L) + 0.5)``;  ``ImageEnhance.Color(f)`` == trunc-blend toward L.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def _trunc_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.trunc(x), 0, 255).astype(np.uint8)


def _rint_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Brightness(1.0 + factor) — reference transformation.py:261-269."""
    return _trunc_u8(img.astype(F32) * F32(1.0 + factor))


def contrast_cv2(img: np.ndarray, alpha: float) -> np.ndarray:
    """cv2.convertScaleAbs(img, alpha, beta=0) — reference transformation.py:203-210."""
    return _rint_u8(img.astype(F32) * F32(alpha))


def grayscale_l24(img: np.ndarray) -> np.ndarray:
    """PIL convert('L') ITU-R 601-2 fixed-point luma. Returns HxW uint8."""
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def grayscale_rgb(img: np.ndarray) -> np.ndarray:
    """convert('L') broadcast back to 3 channels (grayscale image kept as RGB)."""
    return np.repeat(grayscale_l24(img)[..., None], 3, axis=-1)


def invert(img: np.ndarray) -> np.ndarray:
    """PIL ImageOps.invert."""
    return (255 - img.astype(np.int32)).astype(np.uint8)


def enhance_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Contrast — blend toward rounded global mean luma.

    Reference pipenline/cifar_image_transformations.py:84-91 (random factor).
    """
    mean = int(grayscale_l24(img).mean() + 0.5)
    x = img.astype(F32)
    return _trunc_u8(F32(mean) + (x - F32(mean)) * F32(factor))


def enhance_color(img: np.ndarray, factor: float) -> np.ndarray:
    """PIL ImageEnhance.Color — blend toward per-pixel luma."""
    gray = grayscale_l24(img).astype(F32)[..., None]
    return _trunc_u8(gray + (img.astype(F32) - gray) * F32(factor))


def gaussian_noise(img: np.ndarray, std: float, noise: np.ndarray) -> np.ndarray:
    """f32(px) + N(0, std*255), clip, astype(uint8) — transformation.py:272-281.

    ``noise`` is the standard-normal draw (same shape as img) so oracle and TPU
    kernel can be fed identical randomness.
    """
    out = img.astype(F32) + noise.astype(F32) * F32(std * 255.0)
    return np.clip(out, 0, 255).astype(np.uint8)


def gaussian_noise_01(img: np.ndarray, severity_std: float, noise: np.ndarray) -> np.ndarray:
    """TransformationPool variant: normalize to [0,1], add N(0, s), clip, back.

    Reference pipenline/cifar_image_transformations.py:39-47 (severity stds
    [.08,.12,.18,.26,.38]).
    """
    x = img.astype(F32) / F32(255.0)
    out = np.clip(x + noise.astype(F32) * F32(severity_std), 0.0, 1.0)
    return np.clip(np.rint(out * F32(255.0)), 0, 255).astype(np.uint8)


def impulse_noise(img: np.ndarray, amount: float, u: np.ndarray) -> np.ndarray:
    """Salt-and-pepper: fraction ``amount`` of pixels forced to 0 or 255.

    ``u`` is uniform[0,1) of shape img.shape[:-1] (per-pixel, all channels
    flip together). Reference pipenline/cifar_image_transformations.py:49-58.
    """
    out = img.copy()
    salt = u < amount / 2
    pepper = (u >= amount / 2) & (u < amount)
    out[salt] = 255
    out[pepper] = 0
    return out


def shot_noise(img: np.ndarray, lam: float, poisson_draw: np.ndarray) -> np.ndarray:
    """Poisson/shot noise: x' = Poisson(x * lam) / lam on [0,1] scale.

    ``poisson_draw`` = np.random.poisson(x01 * lam) supplied externally.
    Reference pipenline/cifar_image_transformations.py:60-70 (lam in
    [60,25,12,5,3]).
    """
    out = np.clip(poisson_draw.astype(F32) / F32(lam), 0.0, 1.0)
    return np.clip(np.rint(out * F32(255.0)), 0, 255).astype(np.uint8)


def histogram_equalization_yuv(img: np.ndarray) -> np.ndarray:
    """cv2 YUV-space equalizeHist on the Y channel.

    Reference pipenline/cifar_image_transformations.py:122-129:
    RGB->YUV, equalizeHist(Y), YUV->RGB (cv2 integer-rounded conversions).
    """
    import cv2

    yuv = cv2.cvtColor(img, cv2.COLOR_RGB2YUV)
    yuv[..., 0] = cv2.equalizeHist(yuv[..., 0])
    return cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB)


def equalize_hist_channel(chan: np.ndarray) -> np.ndarray:
    """cv2.equalizeHist semantics on one uint8 channel.

    cv2: cdf excluding zero bins; lut = round((cdf - cdf_min)/(N - cdf_min)*255).
    """
    hist = np.bincount(chan.ravel(), minlength=256)
    cdf = hist.cumsum()
    nz = cdf[hist > 0]
    if nz.size == 0:
        return chan.copy()
    cdf_min = nz[0]
    total = chan.size
    denom = max(total - cdf_min, 1)
    lut = np.clip(np.rint((cdf - cdf_min) * 255.0 / denom), 0, 255).astype(np.uint8)
    return lut[chan]
