"""CPU oracle for the CIFAR-10-C corruption generators (NumPy, per-image).

The reference evaluates the 15 canonical CIFAR-10-C corruptions loaded from
precomputed ``.npy`` files (/root/reference/attacks/uncertainty/
FINAL_cifar_corrupted.py:22-27); it contains no generation code. This module
defines the *generation semantics* this framework commits to — the canonical
algorithms of Hendrycks & Dietterich (2019), re-derived and vectorized — and
serves as the differential-test oracle for the batched TPU implementations in
ops/corruptions.py.

Every randomized op takes its random draws as explicit arrays so the TPU path
can be fed bit-identical randomness. All math is float32 unless noted (JPEG
uses the same f32 matmul decomposition as the TPU kernel so quantization-bin
boundaries agree).

Documented deviations from Hendrycks' reference generator:
- glass_blur moves pixels by a one-directional gather instead of sequential
  in-place swaps (the swap loop is inherently serial; the gather is the
  standard vectorized form).
- frost uses a procedural crystal texture (sparse seeded halos over smoothed
  noise) instead of photographs of frost, which are not redistributable.
- zoom_blur / elastic use bilinear sampling (reference uses scipy splines).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


# ------------------------------------------------------------- shared helpers


def gauss_taps_sigma(sigma: float) -> np.ndarray:
    """Sampled-Gaussian 1D taps, ksize = 2*ceil(3*sigma)+1, normalized (f32)."""
    if sigma <= 0:
        return np.ones(1, F32)
    r = int(np.ceil(3.0 * sigma))
    x = np.arange(-r, r + 1, dtype=F32)
    t = np.exp(-(x * x) / F32(2.0 * sigma * sigma))
    return (t / t.sum()).astype(F32)


def gauss_blur_sigma(img_f: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian blur, edge-replicate padding. img_f: [H,W] or [H,W,C]."""
    taps = gauss_taps_sigma(sigma)
    r = len(taps) // 2
    if r == 0:
        return img_f.astype(F32)
    out = img_f.astype(F32)
    for axis in (0, 1):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (r, r)
        p = np.pad(out, pad, mode="edge")
        acc = np.zeros_like(out)
        for t in range(len(taps)):
            sl = [slice(None)] * out.ndim
            sl[axis] = slice(t, t + out.shape[axis])
            acc += taps[t] * p[tuple(sl)]
        out = acc
    return out


def bilinear_zoom_f32(img_f: np.ndarray, factor: float) -> np.ndarray:
    """Center zoom-in (factor >= 1), bilinear on f32, clamped sampling.

    Uses the same pixel-center convention as ops/warp.zoom_matrix:
    src = cx + (xo + 0.5 - cx)/factor, sampled at src - 0.5.
    """
    h, w = img_f.shape[:2]
    cy, cx = h / 2.0, w / 2.0
    ys = (cy + (np.arange(h, dtype=F32) + F32(0.5) - cy) / F32(factor)) - F32(0.5)
    xs = (cx + (np.arange(w, dtype=F32) + F32(0.5) - cx) / F32(factor)) - F32(0.5)
    return _sample_bilinear_clamped(img_f, ys[:, None] + 0 * xs[None, :],
                                    0 * ys[:, None] + xs[None, :])


def _sample_bilinear_clamped(img_f: np.ndarray, yy: np.ndarray, xx: np.ndarray) -> np.ndarray:
    h, w = img_f.shape[:2]
    y0 = np.floor(yy).astype(np.int64)
    x0 = np.floor(xx).astype(np.int64)
    fy = (yy - y0).astype(F32)
    fx = (xx - x0).astype(F32)
    if img_f.ndim == 3:
        fy, fx = fy[..., None], fx[..., None]

    def g(yi, xi):
        return img_f[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].astype(F32)

    a, b = g(y0, x0), g(y0, x0 + 1)
    c, d = g(y0 + 1, x0), g(y0 + 1, x0 + 1)
    return (a + fx * (b - a)) + fy * ((c + fx * (d - c)) - (a + fx * (b - a)))


def _u8(x01: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x01 * F32(255.0)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- zoom blur


def clipped_zoom_coords(size: int, factor: float) -> np.ndarray:
    """Hendrycks clipped_zoom source coordinates along one axis: integer
    center-crop ceil(size/z), scipy order-1 (align-corners) upscale to
    round(crop*z), center-trim back to size. The integer crop/trim offsets
    give each factor a distinct sub-pixel shift — the real zoom-blur data's
    residual is ~2x a center-fixed zoom's because of exactly this."""
    if factor <= 1.0:
        return np.arange(size, dtype=F32)
    cs = int(np.ceil(size / factor))
    top = (size - cs) // 2
    os_ = int(round(cs * factor))
    trim = (os_ - size) // 2
    scale = F32((cs - 1) / max(os_ - 1, 1))
    return (F32(top) + (np.arange(size, dtype=F32) + F32(trim)) * scale).astype(F32)


def clipped_zoom_f32(img_f: np.ndarray, factor: float) -> np.ndarray:
    """Hendrycks clipped_zoom (scizoom order=1 on an integer center crop)."""
    h, w = img_f.shape[:2]
    if factor <= 1.0:
        return img_f.astype(F32)
    ys = clipped_zoom_coords(h, factor)
    xs = clipped_zoom_coords(w, factor)
    yy = np.broadcast_to(ys[:, None], (h, w))
    xx = np.broadcast_to(xs[None, :], (h, w))
    return _sample_bilinear_clamped(img_f, yy, xx)


def zoom_blur(img_u8: np.ndarray, max_zoom: float, step: float = 0.01) -> np.ndarray:
    """Multi-scale zoom AVERAGE: mean of the image and its clipped zooms at
    factors arange(1, max_zoom, step) — the CIFAR-10-C recipe (identity
    included in the factor list, so the clean image is counted twice)."""
    x = img_u8.astype(F32)
    zooms = zoom_factors(max_zoom, step)
    acc = x.copy()
    for z in zooms:
        acc += clipped_zoom_f32(x, float(z))
    out = acc / F32(len(zooms) + 1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def zoom_factors(max_zoom: float, step: float = 0.01) -> np.ndarray:
    """np.arange(1, max_zoom, step) — LITERALLY, float-ulp overshoot
    included: the real generator's arange(1, 1.06, 0.01) yields SEVEN
    factors ending at ~1.06 (and arange(1, 1.11, ...) twelve), so a
    "clean" half-open grid would drop the strongest zoom layer at
    severities 1-2. z=1 is the identity (the clean image counts twice)."""
    return np.arange(1.0, max_zoom, step)


# ------------------------------------------------------------- glass blur


def glass_blur(
    img_u8: np.ndarray, sigma: float, max_delta: int, iterations: int, offsets: np.ndarray
) -> np.ndarray:
    """Gaussian blur -> `iterations` rounds of random local pixel displacement
    (gather by offsets in [-max_delta, max_delta - 1]: the CIFAR-10-C
    recipe's ``np.random.randint(-d, d)`` is high-EXCLUSIVE) -> Gaussian
    blur.

    offsets: int array [iterations, H, W, 2] of (dy, dx).
    """
    h, w = img_u8.shape[:2]
    x = _u8(gauss_blur_sigma(img_u8.astype(F32) / F32(255.0), sigma))
    yy, xx = np.mgrid[0:h, 0:w]
    for it in range(iterations):
        dy, dx = offsets[it, ..., 0], offsets[it, ..., 1]
        yi = np.clip(yy + dy, 0, h - 1)
        xi = np.clip(xx + dx, 0, w - 1)
        x = x[yi, xi]
    out = gauss_blur_sigma(x.astype(F32) / F32(255.0), sigma)
    return _u8(np.clip(out, 0.0, 1.0))


# ------------------------------------------------------------- fog (plasma)


def plasma_fractal(draws: np.ndarray, wibbledecay: float) -> np.ndarray:
    """Diamond-square heightmap normalized to [0,1].

    draws: [L, S, S] uniform(-1,1) noise, one full-resolution field per level;
    each fill step reads the draw entries at exactly the positions it writes,
    so a jnp implementation indexing the same way is bit-comparable.
    """
    levels, size, _ = draws.shape
    assert size & (size - 1) == 0
    m = np.zeros((size, size), F32)
    stepsize = size
    wibble = F32(100.0)
    lvl = 0
    while stepsize >= 2:
        half = stepsize // 2
        d = draws[lvl].astype(F32)
        # squares: center of each square = mean of 4 corners + wibble*draw
        corner = m[0:size:stepsize, 0:size:stepsize]
        sq = corner + np.roll(corner, -1, axis=0)
        sq = sq + np.roll(sq, -1, axis=1)
        m[half::stepsize, half::stepsize] = (
            sq / F32(4.0) + wibble * d[half::stepsize, half::stepsize]
        )
        # diamonds: two interleaved grids, mean of 4 diamond neighbors + wibble
        dr = m[half::stepsize, half::stepsize]
        ul = m[0:size:stepsize, 0:size:stepsize]
        ldr = dr + np.roll(dr, 1, axis=0)
        lul = ul + np.roll(ul, -1, axis=1)
        m[0:size:stepsize, half::stepsize] = (
            (ldr + lul) / F32(4.0) + wibble * d[0:size:stepsize, half::stepsize]
        )
        tdr = dr + np.roll(dr, 1, axis=1)
        tul = ul + np.roll(ul, -1, axis=0)
        m[half::stepsize, 0:size:stepsize] = (
            (tdr + tul) / F32(4.0) + wibble * d[half::stepsize, 0:size:stepsize]
        )
        stepsize //= 2
        wibble = wibble / F32(wibbledecay)
        lvl += 1
    m = m - m.min()
    return (m / max(m.max(), 1e-12)).astype(F32)


def fog(img_u8: np.ndarray, strength: float, wibbledecay: float, draws: np.ndarray) -> np.ndarray:
    """x01 += strength * plasma; rescale by max/(max+strength); clip."""
    h, w = img_u8.shape[:2]
    x01 = img_u8.astype(F32) / F32(255.0)
    plasma = plasma_fractal(draws, wibbledecay)[:h, :w]
    max_val = x01.max()
    out = x01 + F32(strength) * plasma[..., None]
    out = np.clip(out * max_val / (max_val + F32(strength)), 0.0, 1.0)
    return _u8(out)


# ------------------------------------------------------------- frost


def frost_texture(u_seed: np.ndarray, u_amp: np.ndarray, g_noise: np.ndarray) -> np.ndarray:
    """Procedural frost: sparse crystal seeds -> Gaussian halos + smoothed
    backdrop noise. u_seed/u_amp: uniform[0,1) [H,W]; g_noise: randn [H,W]."""
    # calibrated against the real CIFAR-10-C severity-1 frost samples
    # (tools/corruption_fidelity.py): resid ~10, hf ~1.0, mean +31 at 0.2
    seeds = np.where(u_seed > F32(0.98), F32(0.5) + F32(0.5) * u_amp, F32(0.0)).astype(F32)
    halos = gauss_blur_sigma(seeds, 1.2) * F32(6.0)
    backdrop = gauss_blur_sigma(g_noise.astype(F32), 2.0) * F32(0.9) + F32(0.55)
    return np.clip(halos + backdrop, 0.0, 1.0).astype(F32)


def frost(
    img_u8: np.ndarray, scale_img: float, scale_frost: float,
    u_seed: np.ndarray, u_amp: np.ndarray, g_noise: np.ndarray,
) -> np.ndarray:
    x01 = img_u8.astype(F32) / F32(255.0)
    tex = frost_texture(u_seed, u_amp, g_noise)[..., None]
    return _u8(np.clip(F32(scale_img) * x01 + F32(scale_frost) * tex, 0.0, 1.0))


# ------------------------------------------------------------- snow


def snow(
    img_u8: np.ndarray,
    loc: float, scale: float, zoom: float, thresh: float,
    mb_radius: int, mb_sigma: float, blend: float,
    g_noise: np.ndarray, angle_deg: float,
) -> np.ndarray:
    """Gaussian snow field -> zoom -> threshold -> directional motion blur ->
    graying blend -> add layer + 180-degree-rotated layer.

    g_noise: randn [H,W]; angle_deg: motion-blur direction (ref: U(-135,-45)).
    """
    h, w = img_u8.shape[:2]
    x01 = img_u8.astype(F32) / F32(255.0)
    layer = (g_noise.astype(F32) * F32(scale) + F32(loc)).astype(F32)
    if zoom > 1.0:
        layer = clipped_zoom_f32(layer, float(zoom))
    layer = np.where(layer < F32(thresh), F32(0.0), layer)
    k = motion_kernel(mb_radius, mb_sigma, angle_deg)
    layer = _conv2d_same(layer, k)
    gray = x01.mean(axis=-1, keepdims=True)
    x01 = F32(blend) * x01 + (1.0 - F32(blend)) * np.maximum(
        x01, gray * F32(1.5) + F32(0.5)
    )
    out = x01 + layer[..., None] + np.rot90(layer, 2)[..., None]
    return _u8(np.clip(out, 0.0, 1.0))


def motion_kernel(radius: int, sigma: float, angle_deg: float) -> np.ndarray:
    """Line PSF of length 2*radius+1 at angle, Gaussian cross-section (f32)."""
    k = 2 * radius + 1
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1].astype(F32)
    a = np.deg2rad(F32(angle_deg))
    dx, dy = np.cos(a, dtype=F32), np.sin(a, dtype=F32)
    along = xs * dx + ys * dy
    across = -xs * dy + ys * dx
    sig_across = F32(0.5)
    w = np.exp(-(across * across) / (2 * sig_across * sig_across)) * np.exp(
        -(along * along) / F32(2.0 * sigma * sigma)
    )
    w = np.where(np.abs(along) <= F32(radius), w, F32(0.0)).reshape(k, k)
    return (w / w.sum()).astype(F32)


def _conv2d_same(x: np.ndarray, k: np.ndarray) -> np.ndarray:
    r = k.shape[0] // 2
    p = np.pad(x, ((r, r), (r, r)), mode="edge")
    out = np.zeros_like(x, dtype=F32)
    for i in range(k.shape[0]):
        for j in range(k.shape[1]):
            out += k[i, j] * p[i : i + x.shape[0], j : j + x.shape[1]]
    return out


# ------------------------------------------------------------- elastic


def elastic_transform(
    img_u8: np.ndarray, alpha: float, sigma: float, disp: np.ndarray
) -> np.ndarray:
    """Displacement field = alpha * gaussian-smooth(U(-1,1)); bilinear resample
    with clamped borders. disp: [H,W,2] uniform(-1,1) -> (dy, dx)."""
    h, w = img_u8.shape[:2]
    dy = gauss_blur_sigma(disp[..., 0].astype(F32), sigma) * F32(alpha)
    dx = gauss_blur_sigma(disp[..., 1].astype(F32), sigma) * F32(alpha)
    yy, xx = np.mgrid[0:h, 0:w].astype(F32)
    out = _sample_bilinear_clamped(img_u8.astype(F32), yy + dy, xx + dx)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- pixelate


def nearest_resize_map(in_size: int, out_size: int) -> np.ndarray:
    """PIL NEAREST-resize source index per output pixel, bit-exact.

    PIL routes NEAREST resize through the incremental affine loop
    (Geometry.c): xin starts at scale*0.5 and accumulates ``xin += scale`` in
    f64 per pixel, so the map is floor of the *sequentially rounded* cumsum —
    not floor((i+0.5)*scale) (they differ on exact-integer boundaries, e.g.
    50->53). np.cumsum reproduces the sequential rounding.
    """
    a0 = np.float64(in_size) / np.float64(out_size)
    seq = np.cumsum(np.concatenate([[a0 * 0.5], np.full(out_size - 1, a0)]))
    return np.clip(seq.astype(np.int64), 0, in_size - 1)


def pixelate(img_u8: np.ndarray, factor: float) -> np.ndarray:
    """PIL-exact: BOX downscale to (int(W*f), int(H*f)) then NEAREST upscale.

    BOX uses the fixed-point resample path (oracle.warp.pil_resize, "box"
    filter); NEAREST uses the incremental-affine map (nearest_resize_map).
    """
    from imagetransformations_tpu.oracle import warp as _ow

    h, w = img_u8.shape[:2]
    nw, nh = max(1, int(w * factor)), max(1, int(h * factor))
    small = _ow.pil_resize(img_u8, nw, nh, "box")
    return small[nearest_resize_map(nh, h)][:, nearest_resize_map(nw, w)]


# ------------------------------------------------------------- jpeg


_Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.int32,
)
_Q_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.int32,
)


def jpeg_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling: Annex-K tables scaled and clamped to [1,255]."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q

    def s(tab):
        return np.clip((tab * scale + 50) // 100, 1, 255).astype(F32)

    return s(_Q_LUM), s(_Q_CHROM)


def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix (f32)."""
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    d = np.cos(np.pi * (2 * n + 1) * k / 16.0) * np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d.astype(F32)


def _blocks(x: np.ndarray) -> np.ndarray:
    h, w = x.shape
    return x.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(b: np.ndarray, h: int, w: int) -> np.ndarray:
    return b.transpose(0, 2, 1, 3).reshape(h, w)


def _jpeg_channel(ch: np.ndarray, q: np.ndarray) -> np.ndarray:
    """DCT -> quantize -> dequantize -> IDCT on one padded channel (f32)."""
    d = dct_matrix()
    b = _blocks(ch.astype(F32) - F32(128.0))
    coef = np.einsum("ij,abjk->abik", d, b).astype(F32)
    coef = np.einsum("abik,lk->abil", coef, d).astype(F32)
    qc = np.rint(coef / q).astype(F32) * q
    rec = np.einsum("ji,abjk->abik", d, qc).astype(F32)
    rec = np.einsum("abik,kl->abil", rec, d).astype(F32)
    return _unblocks(rec, ch.shape[0], ch.shape[1]) + F32(128.0)


def _pad_to(x: np.ndarray, mult: int) -> np.ndarray:
    h, w = x.shape
    ph, pw = (-h) % mult, (-w) % mult
    return np.pad(x, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else x


def fancy_upsample_2x(ch_u8: np.ndarray) -> np.ndarray:
    """libjpeg h2v2 'fancy' (triangular) chroma upsampling, integer-exact.

    Per jdsample.c: vertical mix colsum = 3*cur + neighbor (int), then
    horizontally out = (3*colsum_this + colsum_next + 8) >> 4, edge columns
    (colsum*4 + 8) >> 4. Input is the decoded u8 chroma plane.
    """
    c = ch_u8.astype(np.int32)
    h, w = c.shape
    up = np.concatenate([c[:1], c[:-1]], axis=0)
    dn = np.concatenate([c[1:], c[-1:]], axis=0)
    rows = np.empty((2 * h, w), np.int32)
    rows[0::2] = 3 * c + up
    rows[1::2] = 3 * c + dn
    left = np.concatenate([rows[:, :1], rows[:, :-1]], axis=1)
    right = np.concatenate([rows[:, 1:], rows[:, -1:]], axis=1)
    out = np.empty((2 * h, 2 * w), np.int32)
    out[:, 0::2] = (3 * rows + left + 8) >> 4
    out[:, 1::2] = (3 * rows + right + 8) >> 4
    out[:, 0] = (rows[:, 0] * 4 + 8) >> 4
    out[:, -1] = (rows[:, -1] * 4 + 8) >> 4
    return out


def jpeg_compression(img_u8: np.ndarray, quality: int) -> np.ndarray:
    """Real JPEG round-trip: YCbCr + 4:2:0 subsampling + 8x8 block DCT with
    libjpeg-scaled Annex-K quantization, then the inverse chain. The lossy
    transform matches what PIL/libjpeg does to pixel data (entropy coding is
    lossless and therefore omitted)."""
    h, w = img_u8.shape[:2]
    x = img_u8.astype(F32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = F32(0.299) * r + F32(0.587) * g + F32(0.114) * b
    cb = F32(-0.168736) * r - F32(0.331264) * g + F32(0.5) * b + F32(128.0)
    cr = F32(0.5) * r - F32(0.418688) * g - F32(0.081312) * b + F32(128.0)
    # 4:2:0: pad to even, 2x2 mean
    ye = _pad_to(y, 2)
    cbs = _pad_to(cb, 2).reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
    crs = _pad_to(cr, 2).reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
    qy, qc = jpeg_quant_tables(quality)
    # decoded planes are rounded to u8 (as libjpeg range-limits them) before
    # chroma upsampling and color conversion
    yr = np.clip(np.rint(_jpeg_channel(_pad_to(y, 8), qy)[:h, :w]), 0, 255).astype(F32)
    cbr = np.clip(np.rint(_jpeg_channel(_pad_to(cbs.astype(F32), 8), qc)), 0, 255)
    crr = np.clip(np.rint(_jpeg_channel(_pad_to(crs.astype(F32), 8), qc)), 0, 255)
    cbu = fancy_upsample_2x(cbr.astype(np.uint8))[:h, :w].astype(F32)
    cru = fancy_upsample_2x(crr.astype(np.uint8))[:h, :w].astype(F32)
    ro = yr + F32(1.402) * (cru - F32(128.0))
    go = yr - F32(0.344136) * (cbu - F32(128.0)) - F32(0.714136) * (cru - F32(128.0))
    bo = yr + F32(1.772) * (cbu - F32(128.0))
    out = np.stack([ro, go, bo], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------- photometric (CIFAR-10-C exact)


def contrast_meanpreserve(img_u8: np.ndarray, c: float) -> np.ndarray:
    """CIFAR-10-C contrast: pull toward the per-channel image mean.

    Hendrycks' recipe is ``clip((x - mean) * c + mean)`` with per-channel
    means over the image — unlike the reference's transformation.py contrast
    (convertScaleAbs, x*c, which darkens). Validated against the real
    severity-1 samples: mean shift ~0, residual std = (1-c)*std(x).
    """
    x01 = img_u8.astype(F32) / F32(255.0)
    means = x01.mean(axis=(0, 1), keepdims=True).astype(F32)
    return _u8(np.clip((x01 - means) * F32(c) + means, 0.0, 1.0))


def brightness_hsv(img_u8: np.ndarray, c: float) -> np.ndarray:
    """CIFAR-10-C brightness: add ``c`` to the HSV value channel.

    Hendrycks converts to HSV, clips V+c to [0,1], and converts back. With
    H and S fixed, scaling V scales RGB proportionally, so the round-trip
    collapses to ``rgb * clip(v+c,0,1)/v`` (v = max(rgb); v=0 pixels become
    the gray (c,c,c)) — no actual HSV conversion needed.
    """
    x01 = img_u8.astype(F32) / F32(255.0)
    v = x01.max(axis=-1, keepdims=True)
    v2 = np.clip(v + F32(c), 0.0, 1.0)
    scaled = np.where(v > 0, x01 * (v2 / np.maximum(v, F32(1e-12))), v2)
    return _u8(np.clip(scaled, 0.0, 1.0))


# ---------------------------------------------- defocus (disk PSF, CIFAR-10-C)


def disk_kernel(radius: float, alias_blur: float) -> np.ndarray:
    """Hendrycks' disk(): anti-aliased disk PSF on a 17x17 grid (radius <= 8),
    alias-blurred with cv2.GaussianBlur(ksize=(3,3), sigmaX=alias_blur)."""
    from imagetransformations_tpu.oracle.stencil import gaussian_taps

    L = np.arange(-8, 8 + 1)
    X, Y = np.meshgrid(L, L)
    disk = ((X**2 + Y**2) <= radius**2).astype(F32)
    disk /= disk.sum()
    taps = gaussian_taps(3, float(alias_blur)).astype(F32)
    # cv2.GaussianBlur separable conv, BORDER_REFLECT_101 (irrelevant here:
    # the disk is centered and far from the border)
    p = np.pad(disk, ((1, 1), (0, 0)), mode="reflect")
    disk = taps[0] * p[:-2] + taps[1] * p[1:-1] + taps[2] * p[2:]
    p = np.pad(disk, ((0, 0), (1, 1)), mode="reflect")
    return (taps[0] * p[:, :-2] + taps[1] * p[:, 1:-1] + taps[2] * p[:, 2:]).astype(F32)


def defocus_blur_disk(img_u8: np.ndarray, radius: float, alias_blur: float) -> np.ndarray:
    """CIFAR-10-C defocus: per-channel filter2D with the disk PSF,
    BORDER_REFLECT_101 (cv2 default), on [0,1] floats."""
    k = disk_kernel(radius, alias_blur)
    r = k.shape[0] // 2
    x01 = img_u8.astype(F32) / F32(255.0)
    p = np.pad(x01, ((r, r), (r, r), (0, 0)), mode="reflect")
    out = np.zeros_like(x01)
    for i in range(k.shape[0]):
        for j in range(k.shape[1]):
            out += k[i, j] * p[i : i + x01.shape[0], j : j + x01.shape[1]]
    return _u8(np.clip(out, 0.0, 1.0))


# ---------------------------------------------- motion blur (directional PSF)


def motion_blur_directional(
    img_u8: np.ndarray, radius: int, sigma: float, angle_deg: float
) -> np.ndarray:
    """CIFAR-10-C-style motion blur: line PSF at a random angle (the real
    generator draws U(-45, 45) per image via Wand), reflect-101 border."""
    k = motion_kernel(radius, sigma, angle_deg)
    r = k.shape[0] // 2
    x01 = img_u8.astype(F32) / F32(255.0)
    p = np.pad(x01, ((r, r), (r, r), (0, 0)), mode="reflect")
    out = np.zeros_like(x01)
    for i in range(k.shape[0]):
        for j in range(k.shape[1]):
            out += k[i, j] * p[i : i + x01.shape[0], j : j + x01.shape[1]]
    return _u8(np.clip(out, 0.0, 1.0))


# ---------------------------------------------- elastic (affine + smooth field)


def affine_from_points(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 2x3 affine mapping the 3 ``src`` points onto ``dst``
    (cv2.getAffineTransform semantics), float64 solve."""
    a = np.zeros((6, 6))
    b = np.zeros(6)
    for i in range(3):
        x, y = src[i]
        a[2 * i, 0:3] = (x, y, 1.0)
        a[2 * i + 1, 3:6] = (x, y, 1.0)
        b[2 * i] = dst[i][0]
        b[2 * i + 1] = dst[i][1]
    m = np.linalg.solve(a, b)
    return m.reshape(2, 3)


def elastic_points(h: int, w: int) -> np.ndarray:
    """Hendrycks' anchor triangle: center +- square_size (min(h,w)//3)."""
    cx, cy = np.float32(w // 2), np.float32(h // 2)
    s = np.float32(min(h, w) // 3)
    return np.asarray(
        [[cx + s, cy + s], [cx + s, cy - s], [cx - s, cy - s]], np.float32
    )


def elastic_transform_affine(
    img_u8: np.ndarray,
    alpha: float,
    sigma: float,
    disp: np.ndarray,
    jitter: np.ndarray,
) -> np.ndarray:
    """CIFAR-10-C elastic: random affine (anchor-triangle corner jitter,
    bilinear, reflect-101 border) THEN bilinear resample along a
    Gaussian-smoothed displacement field (scipy 'reflect' = symmetric
    border). ``disp``: [H,W,2] U(-1,1); ``jitter``: [3,2] U(-aa, aa) px.

    Severity 1 of the real data is pure affine (alpha = 0); the affine
    component dominates the measured residual (std ~30 on real samples).
    """
    h, w = img_u8.shape[:2]
    pts1 = elastic_points(h, w)
    pts2 = pts1 + jitter.astype(np.float32)
    # warpAffine samples src = M_inv(dst); build the dst->src map directly
    minv = affine_from_points(pts2, pts1).astype(F32)
    yy, xx = np.mgrid[0:h, 0:w].astype(F32)
    sx = minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]
    sy = minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]
    # reflect-101 fold: ... d c b | a b c d | c b a (no edge repeat)
    def fold101(c, size):
        if size == 1:
            return np.zeros_like(c)
        period = 2 * (size - 1)
        c = np.abs(c) % period
        return np.minimum(c, period - c)

    x01 = img_u8.astype(F32)
    aff = _sample_bilinear_clamped(x01, fold101(sy, h), fold101(sx, w))
    if alpha > 0:
        dy = gauss_blur_sigma(disp[..., 0].astype(F32), sigma) * F32(alpha)
        dx = gauss_blur_sigma(disp[..., 1].astype(F32), sigma) * F32(alpha)
        # scipy map_coordinates mode='reflect' = symmetric (edge repeated)
        def foldsym(c, size):
            # scipy mode='reflect': reflection axis at -0.5 (arr[-1]==arr[0])
            period = 2 * size
            t = (c + F32(0.5)) % period
            return np.minimum(t, period - t) - F32(0.5)

        out = _sample_bilinear_clamped(aff, foldsym(yy + dy, h), foldsym(xx + dx, w))
    else:
        out = aff
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------- remaining store corruptions (to 19/19)


def speckle_noise(img_u8: np.ndarray, c: float, noise: np.ndarray) -> np.ndarray:
    """CIFAR-10-C speckle: clip(x + x*N(0,c)) on [0,1]. noise: randn [H,W,C]."""
    x01 = img_u8.astype(F32) / F32(255.0)
    return _u8(np.clip(x01 + x01 * (noise.astype(F32) * F32(c)), 0.0, 1.0))


def gaussian_blur_sigma_u8(img_u8: np.ndarray, sigma: float) -> np.ndarray:
    """CIFAR-10-C gaussian_blur: skimage-style sampled-Gaussian separable
    blur (edge-replicate border) on [0,1], sigma in px."""
    x01 = img_u8.astype(F32) / F32(255.0)
    return _u8(np.clip(gauss_blur_sigma(x01, sigma), 0.0, 1.0))


def spatter(
    img_u8: np.ndarray,
    zq: float,
    sigma: float,
    opacity: float,
    mud: bool,
    g_noise: np.ndarray,
) -> np.ndarray:
    """CIFAR-10-C-style spatter: a smoothed Gaussian liquid field,
    z-NORMALIZED per image and thresholded at the ``zq`` quantile level
    (smoothing shrinks the raw field's variance, so an absolute threshold
    would leave almost no liquid); WATER (mud=False) blends a blue-tinted
    layer over the covered region, MUD a brown one. g_noise: randn [H,W].

    Semantics re-derived (the original uses cv2 Canny-distance color
    machinery for water highlights; this keeps the liquid-field geometry
    and the color/opacity treatment, calibrated against the real
    severity-1 sample statistics: ~5% coverage, residual std ~11).
    """
    x01 = img_u8.astype(F32) / F32(255.0)
    field = gauss_blur_sigma(g_noise.astype(F32), sigma)
    z = (field - field.mean()) / max(float(field.std()), 1e-6)
    m = np.clip((z - F32(zq)) * F32(3.0), 0.0, 1.0)[..., None]
    if mud:
        color = np.asarray([63.0 / 255.0, 42.0 / 255.0, 20.0 / 255.0], F32)
    else:
        color = np.asarray([175.0 / 255.0, 238.0 / 255.0, 238.0 / 255.0], F32)
    layer = color.reshape(1, 1, 3).astype(F32)
    out = x01 * (1.0 - F32(opacity) * m) + layer * (F32(opacity) * m)
    return _u8(np.clip(out, 0.0, 1.0))


def saturate_hsv(img_u8: np.ndarray, a: float, b: float) -> np.ndarray:
    """CIFAR-10-C saturate: scale/shift the HSV saturation channel,
    s' = clip(a*s + b). With H and V fixed, (v - rgb) is proportional to
    s, so the round-trip collapses to rgb' = v - (v - rgb) * (s'/s)
    (s = (v - min)/v; v = max(rgb)). Achromatic pixels (s == 0) have
    hue 0 after rgb2hsv (skimage zeroes hue when delta == 0), so with
    b > 0 they red-tint: hsv2rgb(0, s', v) = (v, v(1-s'), v(1-s'))."""
    x01 = img_u8.astype(F32) / F32(255.0)
    v = x01.max(axis=-1, keepdims=True)
    mn = x01.min(axis=-1, keepdims=True)
    s = np.where(v > 0, (v - mn) / np.maximum(v, F32(1e-12)), F32(0.0))
    s2 = np.clip(F32(a) * s + F32(b), 0.0, 1.0)
    ratio = s2 / np.maximum(s, F32(1e-12))
    grayv = v * (1.0 - s2)
    tint = np.concatenate([v, grayv, grayv], axis=-1)
    out = np.where(s > 0, v - (v - x01) * ratio, tint)
    return _u8(np.clip(out, 0.0, 1.0))
