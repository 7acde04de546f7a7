"""Batched TPU generators for the 15 canonical CIFAR-10-C corruptions.

The reference evaluates the canonical corruption list
(/root/reference/attacks/uncertainty/FINAL_cifar_corrupted.py:22-27) from
precomputed npy files; this module GENERATES them on device. Semantics are
defined by oracle/corruptions.py (differentially tested, <=1 LSB); severity
constants follow the CIFAR-10-C recipe of Hendrycks & Dietterich (2019).

TPU design notes:
- everything is batched NHWC over the whole batch in one jitted executable;
  per-image randomness comes from a single key (explicit draws can be passed
  for differential testing);
- smoothing uses separable convs (static taps -> XLA fuses them);
- jpeg_compression runs the 8x8 DCTs as einsums -> MXU matmuls;
- the diamond-square fog fractal runs as a log2(S)-step unrolled loop of
  strided .at[] updates — fully vectorized per level, one executable;
- severity parameters that change kernel sizes (sigma, radius) are static
  arguments: one executable per severity, reused across batches.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit
from imagetransformations_tpu.oracle.corruptions import (
    clipped_zoom_coords,
    dct_matrix,
    gauss_taps_sigma,
    jpeg_quant_tables,
    motion_kernel,
    nearest_resize_map,
    zoom_factors,
)

F32 = jnp.float32

#: severity -> parameters (CIFAR-10-C recipe; index with severity-1)
#: Glass sigmas are CALIBRATED against the reference's real severity-1
#: store samples (round 4): the canonical make_cifar_c value (0.05, 1, 1)
#: measurably does NOT reproduce them — a faithful sequential-swap rerun
#: of that recipe gives residual std 28.4 / hf_ratio 1.64 vs the real
#: samples' 21.97 / 1.125 (tools/corruption_fidelity.py), i.e. the real
#: data is smoother than the published recipe by an extra sigma ~0.33
#: stage. Fitting sigma_1 to the real samples gives 0.33 (ours: resid
#: 21.8, hf 1.11, PSNR-vs-real 21.3 up from 18.8). Severities 2-5 (no
#: ground truth on disk) compose the quadrature-corrected sigmas
#: (sqrt(0.25^2+0.33^2) ~= 0.41, sqrt(0.4^2+0.33^2) ~= 0.52) with GROWING
#: displacement (iterations, then max_delta — the ImageNet-C convention)
#: because extra smoothing alone partially REPAIRS shuffle damage and
#: breaks monotone classifier degradation (measured: the sigma-only
#: ladder rebounds +0.09 agreement sev2->3; this one is monotone with
#: rebound 0.04 and total drop 0.16 on the pretrained-ResNet-56 gate).
GLASS_BLUR_SEV = [(0.33, 1, 1), (0.41, 1, 2), (0.52, 1, 3), (0.52, 2, 1), (0.52, 2, 2)]
FOG_SEV = [(0.2, 3.0), (0.5, 3.0), (0.75, 2.5), (1.0, 2.0), (1.5, 1.75)]
FROST_SEV = [(1.0, 0.2), (1.0, 0.3), (0.9, 0.4), (0.85, 0.4), (0.75, 0.45)]
#: (loc, scale, zoom, thresh, mb_radius, mb_sigma, blend); severity 1 is
#: calibrated against the real CIFAR-10-C severity-1 samples (residual std
#: ~12, HF ratio ~1.2, mean shift ~+11 — sparse bright flakes), higher
#: severities follow the published density/blur/graying progression
#: progression tuned so pretrained-ResNet-56 agreement falls monotonically
#: (~0.71/0.52/0.43/0.32/0.26 on natural 32x32 bases); zoom is held at 1.0 —
#: the clipped-zoom layer dilution is non-monotonic in flake mass
SNOW_SEV = [
    (0.1, 0.33, 1.0, 0.85, 6, 2.5, 0.96),
    (0.12, 0.36, 1.0, 0.82, 7, 2.5, 0.94),
    (0.15, 0.4, 1.0, 0.75, 8, 3.0, 0.92),
    (0.18, 0.45, 1.0, 0.72, 9, 3.5, 0.9),
    (0.25, 0.55, 1.0, 0.65, 10, 5.0, 0.85),
]
#: (alpha_frac, sigma_frac) of min(H, W) — legacy displacement-only recipe
ELASTIC_SEV = [(0.05, 0.22), (0.065, 0.2), (0.085, 0.17), (0.1, 0.14), (0.12, 0.11)]
#: (alpha_frac, sigma_frac, affine_frac) of min(H, W): CIFAR-10-C elastic is
#: random-affine + smoothed displacement; severity 1 is PURE affine (the real
#: severity-1 samples show whole-image warp, residual std ~30, no local noise)
ELASTIC_AFFINE_SEV = [
    (0.0, 0.2, 0.08),
    (0.05, 0.2, 0.07),
    (0.08, 0.06, 0.06),
    (0.1, 0.04, 0.05),
    (0.12, 0.03, 0.03),
]
PIXELATE_SEV = [0.95, 0.9, 0.85, 0.75, 0.65]
JPEG_SEV = [80, 65, 58, 50, 40]
ZOOM_BLUR_SEV = [1.06, 1.11, 1.16, 1.21, 1.26]
#: CIFAR-10-C noise severities (the ImageNet-C values are ~2x stronger and
#: do NOT match the real 32x32 data — validated in tests/test_corruption_fidelity)
GAUSSIAN_NOISE_SEV = [0.04, 0.06, 0.08, 0.09, 0.10]
SHOT_NOISE_SEV = [500.0, 250.0, 100.0, 75.0, 50.0]
IMPULSE_NOISE_SEV = [0.01, 0.02, 0.03, 0.05, 0.07]
#: (radius, alias_blur) of the disk PSF
DEFOCUS_SEV = [(0.3, 0.4), (0.4, 0.5), (0.5, 0.6), (1.0, 0.2), (1.5, 0.1)]
#: (radius, sigma) of the directional line PSF
MOTION_SEV = [(6, 1.0), (6, 1.5), (6, 2.0), (8, 2.0), (9, 2.5)]
CONTRAST_SEV = [0.75, 0.5, 0.4, 0.3, 0.15]
BRIGHTNESS_SEV = [0.05, 0.1, 0.15, 0.2, 0.3]


# ------------------------------------------------------------- shared helpers


def _sep_gauss(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian over axes (1, 2) of [N,H,W,...] f32, edge padding."""
    taps = gauss_taps_sigma(sigma)
    r = len(taps) // 2
    if r == 0:
        return x
    tj = jnp.asarray(taps)
    for axis in (1, 2):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        p = jnp.pad(x, pad, mode="edge")
        acc = jnp.zeros_like(x)
        for t in range(len(taps)):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(t, t + x.shape[axis])
            acc = acc + tj[t] * p[tuple(sl)]
        x = acc
    return x


def _sample_bilinear_clamped(xf: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
    """xf: [N,H,W,C] f32; yy/xx: [N,H',W'] sample coords -> [N,H',W',C]."""
    n, h, w, _ = xf.shape
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = (yy - y0.astype(F32))[..., None]
    fx = (xx - x0.astype(F32))[..., None]
    bidx = jnp.arange(n).reshape(n, 1, 1)

    def g(yi, xi):
        return xf[bidx, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]

    a, b = g(y0, x0), g(y0, x0 + 1)
    c, d = g(y0 + 1, x0), g(y0 + 1, x0 + 1)
    return (a + fx * (b - a)) + fy * ((c + fx * (d - c)) - (a + fx * (b - a)))


def _clipped_zoom_coords_b(n: int, h: int, w: int, factor: float):
    """Hendrycks clipped_zoom coords (integer crop + align-corners resize),
    precomputed host-side per static factor (oracle.clipped_zoom_coords)."""
    ys = jnp.asarray(clipped_zoom_coords(h, float(factor)))
    xs = jnp.asarray(clipped_zoom_coords(w, float(factor)))
    yy = jnp.broadcast_to(ys[None, :, None], (n, h, w))
    xx = jnp.broadcast_to(xs[None, None, :], (n, h, w))
    return yy, xx


def _u8(x01: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.rint(x01 * F32(255.0)), 0.0, 255.0).astype(jnp.uint8)


# ------------------------------------------------------------- zoom blur


@op_jit(static=("max_zoom", "step"))
def zoom_blur(img: jnp.ndarray, max_zoom: float, step: float = 0.01) -> jnp.ndarray:
    """Multi-scale zoom AVERAGE (mean of identity + center zooms 1..max_zoom).

    Fixes the round-1 single-zoom stand-in; oracle.corruptions.zoom_blur.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    xf = x.astype(F32)
    acc = xf
    zooms = zoom_factors(max_zoom, step)
    for z in zooms:
        if float(z) <= 1.0:
            acc = acc + xf
            continue
        yy, xx = _clipped_zoom_coords_b(n, h, w, float(z))
        acc = acc + _sample_bilinear_clamped(xf, yy, xx)
    out = acc / F32(len(zooms) + 1)
    out = jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)
    return restore_layout(out if img.dtype == jnp.uint8 else out.astype(F32), single)


# ------------------------------------------------------------- glass blur


@op_jit(static=("sigma", "max_delta", "iterations"))
def glass_blur(
    img: jnp.ndarray,
    sigma: float,
    max_delta: int,
    iterations: int,
    key=None,
    offsets=None,
) -> jnp.ndarray:
    """blur -> iterations of random local pixel displacement -> blur.

    offsets: int [iterations, N, H, W, 2] in [-max_delta, max_delta - 1]
    (generated from ``key`` when omitted) — the CIFAR-10-C recipe draws
    ``np.random.randint(-d, d)`` with the HIGH bound EXCLUSIVE, so with
    the severity tables' d=1 displacements come from {-1, 0}, never +1.
    oracle.corruptions.glass_blur.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if offsets is None:
        offsets = jax.random.randint(
            key, (iterations, n, h, w, 2), -max_delta, max_delta, dtype=jnp.int32
        )
    else:
        offsets = jnp.asarray(offsets, jnp.int32)
        if offsets.ndim == 4:
            offsets = offsets[:, None]
    xcur = _u8(_sep_gauss(x.astype(F32) / F32(255.0), sigma))
    yy = jnp.arange(h, dtype=jnp.int32).reshape(1, h, 1)
    xx = jnp.arange(w, dtype=jnp.int32).reshape(1, 1, w)
    bidx = jnp.arange(n).reshape(n, 1, 1)
    for it in range(iterations):
        yi = jnp.clip(yy + offsets[it, ..., 0], 0, h - 1)
        xi = jnp.clip(xx + offsets[it, ..., 1], 0, w - 1)
        xcur = xcur[bidx, yi, xi]
    out01 = jnp.clip(_sep_gauss(xcur.astype(F32) / F32(255.0), sigma), 0.0, 1.0)
    return restore_layout(_u8(out01), single)


# ------------------------------------------------------------- fog


def _plasma_fractal(draws: jnp.ndarray, wibbledecay: float, size: int) -> jnp.ndarray:
    """Batched diamond-square: draws [N, L, S, S] -> [N, S, S] in [0,1].

    Mirrors oracle.corruptions.plasma_fractal level by level; the unrolled
    python loop has log2(S) static iterations, each a vectorized strided
    update — XLA compiles it to one fused executable.
    """
    n = draws.shape[0]
    m = jnp.zeros((n, size, size), F32)
    # wibble must follow the oracle's f32 division chain — a Python-f64
    # chain diverges from f32(100/decay/.../decay) at level >= 5 for
    # decay 2.5 (>= 64px fog), flipping coefficients vs the oracle
    stepsize, wibble, lvl = size, np.float32(100.0), 0
    while stepsize >= 2:
        half = stepsize // 2
        d = draws[:, lvl].astype(F32)
        corner = m[:, 0:size:stepsize, 0:size:stepsize]
        sq = corner + jnp.roll(corner, -1, axis=1)
        sq = sq + jnp.roll(sq, -1, axis=2)
        m = m.at[:, half::stepsize, half::stepsize].set(
            sq / F32(4.0) + F32(wibble) * d[:, half::stepsize, half::stepsize]
        )
        dr = m[:, half::stepsize, half::stepsize]
        ul = m[:, 0:size:stepsize, 0:size:stepsize]
        ldr = dr + jnp.roll(dr, 1, axis=1)
        lul = ul + jnp.roll(ul, -1, axis=2)
        m = m.at[:, 0:size:stepsize, half::stepsize].set(
            (ldr + lul) / F32(4.0) + F32(wibble) * d[:, 0:size:stepsize, half::stepsize]
        )
        tdr = dr + jnp.roll(dr, 1, axis=2)
        tul = ul + jnp.roll(ul, -1, axis=1)
        m = m.at[:, half::stepsize, 0:size:stepsize].set(
            (tdr + tul) / F32(4.0) + F32(wibble) * d[:, half::stepsize, 0:size:stepsize]
        )
        stepsize //= 2
        wibble = np.float32(wibble / np.float32(wibbledecay))
        lvl += 1
    mn = m.min(axis=(1, 2), keepdims=True)
    m = m - mn
    mx = jnp.maximum(m.max(axis=(1, 2), keepdims=True), 1e-12)
    return m / mx


def plasma_levels(size: int) -> int:
    return int(math.log2(size))


@op_jit(static=("strength", "wibbledecay"))
def fog(img: jnp.ndarray, strength: float, wibbledecay: float, key=None, draws=None) -> jnp.ndarray:
    """x01 += strength*plasma; rescale by max/(max+strength) per image.

    draws: uniform(-1,1) [N, L, S, S] with S = next pow2 >= max(H,W),
    L = log2(S) (generated from ``key`` when omitted).
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    size = 1 << max(1, math.ceil(math.log2(max(h, w))))
    if draws is None:
        draws = jax.random.uniform(
            key, (n, plasma_levels(size), size, size), F32, -1.0, 1.0
        )
    else:
        draws = jnp.asarray(draws, F32)
        if draws.ndim == 3:
            draws = draws[None]
    x01 = x.astype(F32) / F32(255.0)
    plasma = _plasma_fractal(draws, wibbledecay, size)[:, :h, :w]
    max_val = x01.max(axis=(1, 2, 3), keepdims=True)
    out = x01 + F32(strength) * plasma[..., None]
    out = jnp.clip(out * max_val / (max_val + F32(strength)), 0.0, 1.0)
    return restore_layout(_u8(out), single)


# ------------------------------------------------------------- frost


@op_jit(static=("scale_img", "scale_frost"))
def frost(
    img: jnp.ndarray,
    scale_img: float,
    scale_frost: float,
    key=None,
    u_seed=None,
    u_amp=None,
    g_noise=None,
) -> jnp.ndarray:
    """Procedural frost overlay: clip(c0*x + c1*frost_texture).

    Texture = sparse crystal seeds blurred into halos + smoothed noise
    backdrop (oracle.corruptions.frost_texture; photographs in the original
    recipe are replaced by this procedural texture).
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if u_seed is None:
        k1, k2, k3 = jax.random.split(key, 3)
        u_seed = jax.random.uniform(k1, (n, h, w), F32)
        u_amp = jax.random.uniform(k2, (n, h, w), F32)
        g_noise = jax.random.normal(k3, (n, h, w), F32)
    else:
        if u_amp is None or g_noise is None:
            raise ValueError(
                "frost: u_seed, u_amp and g_noise must all be given together"
            )
        u_seed, u_amp, g_noise = (
            jnp.asarray(a, F32)[None] if jnp.asarray(a).ndim == 2 else jnp.asarray(a, F32)
            for a in (u_seed, u_amp, g_noise)
        )
    # texture constants calibrated against the real CIFAR-10-C severity-1
    # frost samples (residual std ~10, HF ratio ~1.0, mean shift ~+31 at
    # scale_frost=0.2): sparser seeds, softer halos, brighter backdrop
    seeds = jnp.where(u_seed > F32(0.98), F32(0.5) + F32(0.5) * u_amp, F32(0.0))
    halos = _sep_gauss(seeds[..., None], 1.2)[..., 0] * F32(6.0)
    backdrop = _sep_gauss(g_noise[..., None], 2.0)[..., 0] * F32(0.9) + F32(0.55)
    tex = jnp.clip(halos + backdrop, 0.0, 1.0)[..., None]
    x01 = x.astype(F32) / F32(255.0)
    out = jnp.clip(F32(scale_img) * x01 + F32(scale_frost) * tex, 0.0, 1.0)
    return restore_layout(_u8(out), single)


# ------------------------------------------------------------- snow


@op_jit(static=("loc", "scale", "zoom", "thresh", "mb_radius", "mb_sigma", "blend"))
def snow(
    img: jnp.ndarray,
    loc: float,
    scale: float,
    zoom: float,
    thresh: float,
    mb_radius: int,
    mb_sigma: float,
    blend: float,
    key=None,
    g_noise=None,
    angles_deg=None,
) -> jnp.ndarray:
    """Snow field -> zoom -> threshold -> per-image directional motion blur ->
    graying blend -> add layer + rot180(layer). oracle.corruptions.snow.

    The per-image motion-blur kernels (random angle in U(-135,-45)) run as ONE
    grouped convolution: images become feature groups, so a whole batch of
    different kernels is a single XLA conv.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if g_noise is None:
        k1, k2 = jax.random.split(key)
        g_noise = jax.random.normal(k1, (n, h, w), F32)
        angles_deg = jax.random.uniform(k2, (n,), F32, -135.0, -45.0)
    else:
        if angles_deg is None:
            raise ValueError("snow: angles_deg is required when g_noise is given")
        g_noise = jnp.asarray(g_noise, F32)
        if g_noise.ndim == 2:
            g_noise = g_noise[None]
        angles_deg = jnp.atleast_1d(jnp.asarray(angles_deg, F32))
    x01 = x.astype(F32) / F32(255.0)
    layer = g_noise * F32(scale) + F32(loc)
    if zoom > 1.0:
        yy, xx = _clipped_zoom_coords_b(n, h, w, float(zoom))
        layer = _sample_bilinear_clamped(layer[..., None], yy, xx)[..., 0]
    layer = jnp.where(layer < F32(thresh), F32(0.0), layer)
    kern = _motion_kernels_batched(angles_deg, mb_radius, mb_sigma)  # [N,K,K]
    layer = _grouped_conv2d(layer, kern, "edge")
    gray = x01.mean(axis=-1, keepdims=True)
    x01 = F32(blend) * x01 + (1.0 - F32(blend)) * jnp.maximum(
        x01, gray * F32(1.5) + F32(0.5)
    )
    out = x01 + layer[..., None] + jnp.rot90(layer, 2, axes=(1, 2))[..., None]
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)


def _motion_kernels_batched(angles_deg: jnp.ndarray, radius: int, sigma: float) -> jnp.ndarray:
    """[N] angles -> [N,K,K] line PSFs (oracle.corruptions.motion_kernel)."""
    k = 2 * radius + 1
    ys, xs = jnp.mgrid[-radius : radius + 1, -radius : radius + 1]
    ys, xs = ys.astype(F32)[None], xs.astype(F32)[None]
    a = jnp.deg2rad(angles_deg).reshape(-1, 1, 1)
    dx, dy = jnp.cos(a), jnp.sin(a)
    along = xs * dx + ys * dy
    across = -xs * dy + ys * dx
    sig_across = F32(0.5)
    wgt = jnp.exp(-(across * across) / (2 * sig_across * sig_across)) * jnp.exp(
        -(along * along) / F32(2.0 * sigma * sigma)
    )
    wgt = jnp.where(jnp.abs(along) <= F32(radius), wgt, F32(0.0))
    return wgt / wgt.sum(axis=(1, 2), keepdims=True)


def _grouped_conv2d(x: jnp.ndarray, kernels, mode: str) -> jnp.ndarray:
    """2D 'same' conv as ONE XLA grouped convolution.

    x: [N,H,W] or [N,H,W,C]; kernels: [K,K] (shared across the batch) or
    [N,K,K] (per-image, e.g. random motion-blur angles); border ``mode``
    is a jnp.pad mode ('edge' for the snow layer, 'reflect' =
    BORDER_REFLECT_101 for the cv2.filter2D-style ops). Images x channels
    become feature groups, so a whole batch of different kernels is a
    single conv call.
    """
    chan = x.ndim == 4
    xv = x if chan else x[..., None]
    n, h, w, c = xv.shape
    kj = jnp.asarray(kernels)
    k = kj.shape[-1]
    r = k // 2
    if kj.ndim == 2:
        rhs = jnp.broadcast_to(kj, (n * c, 1, k, k))
    else:
        rhs = jnp.repeat(kj, c, axis=0)[:, None]  # [N*C, 1, K, K]
    xp = jnp.pad(xv, ((0, 0), (r, r), (r, r), (0, 0)), mode=mode)
    lhs = xp.transpose(0, 3, 1, 2).reshape(1, n * c, h + 2 * r, w + 2 * r)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), "VALID", feature_group_count=n * c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ).reshape(n, c, h, w).transpose(0, 2, 3, 1)
    return out if chan else out[..., 0]


# ------------------------------------------- photometric (CIFAR-10-C exact)


@op_jit(static=("c",))
def contrast_meanpreserve(img: jnp.ndarray, c: float) -> jnp.ndarray:
    """CIFAR-10-C contrast: clip((x - mean)*c + mean) with per-image
    per-channel means — mean-preserving, unlike transformation.py's
    convertScaleAbs contrast. oracle.corruptions.contrast_meanpreserve."""
    x, single = as_batch(img)
    x01 = x.astype(F32) / F32(255.0)
    means = x01.mean(axis=(1, 2), keepdims=True)
    out = jnp.clip((x01 - means) * F32(c) + means, 0.0, 1.0)
    return restore_layout(_u8(out), single)


@op_jit(static=("c",))
def brightness_hsv(img: jnp.ndarray, c: float) -> jnp.ndarray:
    """CIFAR-10-C brightness: +c on the HSV value channel. With H and S
    fixed, scaling V scales RGB proportionally, so the HSV round-trip
    collapses to rgb * clip(v+c,0,1)/v (v = max(rgb); v=0 -> gray c).
    oracle.corruptions.brightness_hsv."""
    x, single = as_batch(img)
    x01 = x.astype(F32) / F32(255.0)
    v = x01.max(axis=-1, keepdims=True)
    v2 = jnp.clip(v + F32(c), 0.0, 1.0)
    out = jnp.where(v > 0, x01 * (v2 / jnp.maximum(v, F32(1e-12))), v2)
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)


# ------------------------------------------- defocus (disk PSF, CIFAR-10-C)


@op_jit(static=("radius", "alias_blur"))
def defocus_blur_disk(img: jnp.ndarray, radius: float, alias_blur: float) -> jnp.ndarray:
    """CIFAR-10-C defocus: anti-aliased disk PSF (Hendrycks disk()) applied
    per channel on [0,1] floats, reflect-101 border. The TransformationPool
    defocus (PIL GaussianBlur radius 3-10) is a DIFFERENT, much stronger op
    (ops.stencil.pil_gaussian_blur) — the real 32x32 data uses this tiny
    disk. oracle.corruptions.defocus_blur_disk; DEFOCUS_SEV."""
    from imagetransformations_tpu.oracle.corruptions import disk_kernel

    x, single = as_batch(img)
    k = disk_kernel(float(radius), float(alias_blur))
    out = _grouped_conv2d(x.astype(F32) / F32(255.0), k.astype(np.float32), "reflect")
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)


# ------------------------------------------- motion blur (directional PSF)


@op_jit(static=("radius", "sigma"))
def motion_blur_directional(
    img: jnp.ndarray, radius: int, sigma: float, key=None, angles_deg=None
) -> jnp.ndarray:
    """CIFAR-10-C-style motion blur: per-image line PSF at a random angle
    U(-45, 45) (the real generator uses Wand's motion_blur), reflect-101
    border. Per-image kernels run as ONE grouped conv over N*C feature
    groups. oracle.corruptions.motion_blur_directional; MOTION_SEV."""
    x, single = as_batch(img)
    n, h, w, c = x.shape
    if angles_deg is None:
        angles_deg = jax.random.uniform(key, (n,), F32, -45.0, 45.0)
    else:
        angles_deg = jnp.atleast_1d(jnp.asarray(angles_deg, F32))
    kern = _motion_kernels_batched(angles_deg, int(radius), float(sigma))  # [N,K,K]
    out = _grouped_conv2d(x.astype(F32) / F32(255.0), kern, "reflect")
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)


# ------------------------------------------------------------- elastic


@op_jit(static=("alpha", "sigma"))
def elastic_transform(
    img: jnp.ndarray, alpha: float, sigma: float, key=None, disp=None
) -> jnp.ndarray:
    """Bilinear warp by a Gaussian-smoothed random displacement field.

    disp: uniform(-1,1) [N,H,W,2]; alpha/sigma in pixels (see ELASTIC_SEV for
    the fraction-of-size severity recipe). oracle.corruptions.elastic_transform.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if disp is None:
        disp = jax.random.uniform(key, (n, h, w, 2), F32, -1.0, 1.0)
    else:
        disp = jnp.asarray(disp, F32)
        if disp.ndim == 3:
            disp = disp[None]
    sm = _sep_gauss(disp, sigma) * F32(alpha)
    yy = jnp.arange(h, dtype=F32).reshape(1, h, 1) + sm[..., 0]
    xx = jnp.arange(w, dtype=F32).reshape(1, 1, w) + sm[..., 1]
    out = _sample_bilinear_clamped(x.astype(F32), yy, xx)
    out = jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)
    return restore_layout(out if img.dtype == jnp.uint8 else out.astype(F32), single)


def _fold101(c: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reflect-101 coordinate fold into [0, size-1] (cv2 BORDER_REFLECT_101)."""
    if size == 1:
        return jnp.zeros_like(c)
    period = F32(2 * (size - 1))
    c = jnp.abs(c) % period
    return jnp.minimum(c, period - c)


def _foldsym(c: jnp.ndarray, size: int) -> jnp.ndarray:
    """Symmetric (edge-repeated) continuous-coordinate fold — scipy
    map_coordinates mode='reflect'. The reflection axis sits at -0.5 (the
    reflected sample arr[-1] equals arr[0]), so fold the +0.5-shifted
    coordinate about the 2*size period: coordinate -1 maps to 0,
    -1.75 to 0.75 (verified against scipy)."""
    period = F32(2 * size)
    t = (c + F32(0.5)) % period
    return jnp.minimum(t, period - t) - F32(0.5)


@op_jit(static=("alpha", "sigma", "alpha_affine"))
def elastic_transform_affine(
    img: jnp.ndarray,
    alpha: float,
    sigma: float,
    alpha_affine: float,
    key=None,
    disp=None,
    jitter=None,
) -> jnp.ndarray:
    """CIFAR-10-C elastic: per-image random affine (anchor-triangle corner
    jitter U(-alpha_affine, alpha_affine) px, bilinear, reflect-101 border)
    THEN bilinear resample along a Gaussian-smoothed displacement field
    (symmetric border). Severity 1 of the real data is pure affine
    (ELASTIC_AFFINE_SEV). oracle.corruptions.elastic_transform_affine.

    The 3-point affine solve is a batched closed-form 3x3 inverse in-graph —
    one executable for any jitter draws.
    """
    from imagetransformations_tpu.oracle.corruptions import elastic_points

    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if jitter is None:
        kj, kd = jax.random.split(key)
        jitter = jax.random.uniform(
            kj, (n, 3, 2), F32, -alpha_affine, alpha_affine
        )
        if disp is None and alpha > 0:
            disp = jax.random.uniform(kd, (n, h, w, 2), F32, -1.0, 1.0)
    else:
        jitter = jnp.asarray(jitter, F32)
        if jitter.ndim == 2:
            jitter = jitter[None]
    pts1 = jnp.asarray(elastic_points(h, w))  # [3, 2]
    pts2 = pts1[None] + jitter  # [N, 3, 2]
    # inverse map dst->src: M = P1 (2x3) @ inv([x2; y2; 1]) per image
    p2h = jnp.concatenate(
        [pts2.transpose(0, 2, 1), jnp.ones((n, 1, 3), F32)], axis=1
    )  # [N, 3, 3]
    p1 = jnp.broadcast_to(pts1.T[None], (n, 2, 3))  # [N, 2, 3]
    minv = p1 @ jnp.linalg.inv(p2h)  # [N, 2, 3]
    yy = jnp.broadcast_to(jnp.arange(h, dtype=F32).reshape(1, h, 1), (n, h, w))
    xx = jnp.broadcast_to(jnp.arange(w, dtype=F32).reshape(1, 1, w), (n, h, w))
    m = minv.reshape(n, 6, 1, 1)
    sx = m[:, 0] * xx + m[:, 1] * yy + m[:, 2]
    sy = m[:, 3] * xx + m[:, 4] * yy + m[:, 5]
    aff = _sample_bilinear_clamped(x.astype(F32), _fold101(sy, h), _fold101(sx, w))
    if alpha > 0:
        if disp is None:
            raise ValueError("elastic_transform_affine: disp required when alpha > 0")
        disp = jnp.asarray(disp, F32)
        if disp.ndim == 3:
            disp = disp[None]
        sm = _sep_gauss(disp, sigma) * F32(alpha)
        out = _sample_bilinear_clamped(
            aff, _foldsym(yy + sm[..., 0], h), _foldsym(xx + sm[..., 1], w)
        )
    else:
        out = aff
    out = jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)
    return restore_layout(out if img.dtype == jnp.uint8 else out.astype(F32), single)


def elastic_affine_pixels(
    h: int, w: int, af: float, sf: float, aa: float
) -> tuple[float, float, float]:
    """(alpha, sigma, alpha_affine) fractions -> pixels for an HxW image
    (sigma floored at 0.5 px so tiny images still displace). The ONE place
    the fraction->pixel scaling rule lives — evalx.harness routes through
    it too."""
    m = min(h, w)
    return af * m, max(sf * m, 0.5), aa * m


def elastic_affine_params(h: int, w: int, severity: int) -> tuple[float, float, float]:
    """Severity -> (alpha, sigma, alpha_affine) in pixels for an HxW image."""
    af, sf, aa = ELASTIC_AFFINE_SEV[severity - 1]
    return elastic_affine_pixels(h, w, af, sf, aa)


def elastic_pixels(h: int, w: int, af: float, sf: float) -> tuple[float, float]:
    """(alpha_frac, sigma_frac) -> (alpha, sigma) in pixels for an HxW image
    (sigma floored at 0.5 px so tiny images still displace)."""
    m = min(h, w)
    return af * m, max(sf * m, 0.5)


def elastic_params(h: int, w: int, severity: int) -> tuple[float, float]:
    """Severity -> (alpha, sigma) in pixels for an HxW image."""
    af, sf = ELASTIC_SEV[severity - 1]
    return elastic_pixels(h, w, af, sf)


# ------------------------------------------------------------- pixelate


@op_jit(static=("factor",))
def pixelate(img: jnp.ndarray, factor: float) -> jnp.ndarray:
    """PIL-bit-exact BOX downscale + NEAREST upscale (oracle.corruptions).

    BOX reuses the int32 fixed-point resize matmuls (ops.warp.pil_resize);
    NEAREST is a static gather from the incremental-affine index map.
    """
    from imagetransformations_tpu.ops.warp import pil_resize

    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    nw, nh = max(1, int(w * factor)), max(1, int(h * factor))
    small = pil_resize(x, nw, nh, "box")
    ys = jnp.asarray(nearest_resize_map(nh, h))
    xs = jnp.asarray(nearest_resize_map(nw, w))
    out = small[:, ys][:, :, xs]
    return restore_layout(out, single)


# ------------------------------------------------------------- jpeg


@functools.lru_cache(maxsize=None)
def _dct_mats():
    d = dct_matrix()
    return d, d.T


def _jpeg_channel_j(ch: jnp.ndarray, q: np.ndarray) -> jnp.ndarray:
    """ch: [N, H, W] (H,W % 8 == 0) f32 -> DCT/quant/dequant/IDCT round-trip.

    The 8x8 DCTs are einsums over blocked layout -> batched MXU matmuls.
    """
    d, dt = _dct_mats()
    dj, dtj = jnp.asarray(d), jnp.asarray(dt)
    qj = jnp.asarray(q, F32)
    n, h, w = ch.shape
    b = ch.reshape(n, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4) - F32(128.0)
    # HIGHEST: TPU matmuls default to bf16 passes, which flips quantization
    # bins; the DCT needs full-f32 MXU accumulation
    hi = jax.lax.Precision.HIGHEST
    coef = jnp.einsum("ij,nabjk->nabik", dj, b, precision=hi)
    coef = jnp.einsum("nabik,lk->nabil", coef, dj, precision=hi)
    qc = jnp.rint(coef / qj) * qj
    rec = jnp.einsum("ji,nabjk->nabik", dj, qc, precision=hi)
    rec = jnp.einsum("nabik,kl->nabil", rec, dj, precision=hi)
    return rec.transpose(0, 1, 3, 2, 4).reshape(n, h, w) + F32(128.0)


def _fancy_upsample_2x_j(c_u8: jnp.ndarray) -> jnp.ndarray:
    """Batched libjpeg h2v2 fancy upsample: [N,h,w] u8 -> [N,2h,2w] int32."""
    c = c_u8.astype(jnp.int32)
    up = jnp.concatenate([c[:, :1], c[:, :-1]], axis=1)
    dn = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
    n, h, w = c.shape
    rows = jnp.stack([3 * c + up, 3 * c + dn], axis=2).reshape(n, 2 * h, w)
    left = jnp.concatenate([rows[:, :, :1], rows[:, :, :-1]], axis=2)
    right = jnp.concatenate([rows[:, :, 1:], rows[:, :, -1:]], axis=2)
    out = jnp.stack(
        [(3 * rows + left + 8) >> 4, (3 * rows + right + 8) >> 4], axis=3
    ).reshape(n, 2 * h, 2 * w)
    edge_l = (rows[:, :, 0] * 4 + 8) >> 4
    edge_r = (rows[:, :, -1] * 4 + 8) >> 4
    out = out.at[:, :, 0].set(edge_l).at[:, :, -1].set(edge_r)
    return out


def _pad_to_j(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    ph, pw = (-h) % mult, (-w) % mult
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge") if (ph or pw) else x


@op_jit(static=("quality",))
def jpeg_compression(img: jnp.ndarray, quality: int) -> jnp.ndarray:
    """Real JPEG round-trip on device: YCbCr, 4:2:0, 8x8 DCT with
    libjpeg-scaled quantization, fancy chroma upsampling, inverse transform.

    oracle.corruptions.jpeg_compression defines the exact semantics.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    xf = x.astype(F32)
    r, g, b = xf[..., 0], xf[..., 1], xf[..., 2]
    y = F32(0.299) * r + F32(0.587) * g + F32(0.114) * b
    cb = F32(-0.168736) * r - F32(0.331264) * g + F32(0.5) * b + F32(128.0)
    cr = F32(0.5) * r - F32(0.418688) * g - F32(0.081312) * b + F32(128.0)
    ye = _pad_to_j(y, 2)
    he, we = ye.shape[1], ye.shape[2]
    cbs = _pad_to_j(cb, 2).reshape(n, he // 2, 2, we // 2, 2).mean(axis=(2, 4))
    crs = _pad_to_j(cr, 2).reshape(n, he // 2, 2, we // 2, 2).mean(axis=(2, 4))
    qy, qc = jpeg_quant_tables(quality)
    yr = jnp.clip(jnp.rint(_jpeg_channel_j(_pad_to_j(y, 8), qy)[:, :h, :w]), 0, 255)
    cbr = jnp.clip(jnp.rint(_jpeg_channel_j(_pad_to_j(cbs, 8), qc)), 0, 255)
    crr = jnp.clip(jnp.rint(_jpeg_channel_j(_pad_to_j(crs, 8), qc)), 0, 255)
    cbu = _fancy_upsample_2x_j(cbr.astype(jnp.uint8))[:, :h, :w].astype(F32)
    cru = _fancy_upsample_2x_j(crr.astype(jnp.uint8))[:, :h, :w].astype(F32)
    ro = yr + F32(1.402) * (cru - F32(128.0))
    go = yr - F32(0.344136) * (cbu - F32(128.0)) - F32(0.714136) * (cru - F32(128.0))
    bo = yr + F32(1.772) * (cbu - F32(128.0))
    out = jnp.stack([ro, go, bo], axis=-1)
    out = jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)
    return restore_layout(out, single)


# --------------------------- remaining store corruptions (19/19 coverage)

#: CIFAR-10-C severities for the four non-canonical store corruptions
SPECKLE_SEV = [0.06, 0.1, 0.12, 0.16, 0.2]
GAUSSIAN_BLUR_SEV = [0.4, 0.6, 0.7, 0.8, 1.0]
#: (zq, sigma, opacity, mud): z-quantile threshold of the smoothed liquid
#: field, smoothing sigma, blend opacity, water/mud; severity 1 calibrated
#: against the real severity-1 spatter samples (residual std ~11)
SPATTER_SEV = [
    (1.6, 0.7, 0.55, False),
    (1.45, 0.8, 0.55, False),
    (1.3, 1.0, 0.6, False),
    (1.3, 0.7, 0.65, True),
    (1.15, 0.5, 0.65, True),
]
#: (a, b): s' = clip(a*s + b) HSV-saturation severities (CIFAR-10-C)
SATURATE_SEV = [(0.3, 0.0), (0.1, 0.0), (1.5, 0.0), (2.0, 0.1), (2.5, 0.2)]


@op_jit
def speckle_noise(img: jnp.ndarray, c, key=None, noise=None) -> jnp.ndarray:
    """CIFAR-10-C speckle: clip(x + x*N(0,c)) on [0,1] (multiplicative
    noise). oracle.corruptions.speckle_noise; SPECKLE_SEV."""
    x, single = as_batch(img)
    if noise is None:
        noise = jax.random.normal(key, x.shape, F32)
    else:
        noise = jnp.asarray(noise, F32)
        if noise.ndim == 3:
            noise = noise[None]
    cv = jnp.asarray(c, F32)
    if cv.ndim == 0:
        cv = jnp.broadcast_to(cv, (x.shape[0],))
    x01 = x.astype(F32) / F32(255.0)
    out = jnp.clip(x01 + x01 * (noise * cv.reshape(-1, 1, 1, 1)), 0.0, 1.0)
    return restore_layout(_u8(out), single)


@op_jit(static=("sigma",))
def gaussian_blur_sigma_op(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """CIFAR-10-C gaussian_blur: sampled-Gaussian separable blur on [0,1]
    (edge border). oracle.corruptions.gaussian_blur_sigma_u8;
    GAUSSIAN_BLUR_SEV."""
    x, single = as_batch(img)
    out = jnp.clip(_sep_gauss(x.astype(F32) / F32(255.0), float(sigma)), 0.0, 1.0)
    return restore_layout(_u8(out), single)


@op_jit(static=("zq", "sigma", "opacity", "mud"))
def spatter(
    img: jnp.ndarray,
    zq: float,
    sigma: float,
    opacity: float,
    mud: bool,
    key=None,
    g_noise=None,
) -> jnp.ndarray:
    """CIFAR-10-C-style spatter: smoothed Gaussian liquid field,
    z-normalized PER IMAGE and thresholded at the zq quantile level,
    blended as water (blue tint) or mud (brown) over the covered region.
    oracle.corruptions.spatter; SPATTER_SEV."""
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    if g_noise is None:
        g_noise = jax.random.normal(key, (n, h, w), F32)
    else:
        g_noise = jnp.asarray(g_noise, F32)
        if g_noise.ndim == 2:
            g_noise = g_noise[None]
    x01 = x.astype(F32) / F32(255.0)
    field = _sep_gauss(g_noise[..., None], float(sigma))[..., 0]
    mu = field.mean(axis=(1, 2), keepdims=True)
    sd = jnp.maximum(field.std(axis=(1, 2), keepdims=True), F32(1e-6))
    z = (field - mu) / sd
    m = jnp.clip((z - F32(zq)) * F32(3.0), 0.0, 1.0)[..., None]
    if mud:
        color = jnp.asarray([63.0, 42.0, 20.0], F32) / F32(255.0)
    else:
        color = jnp.asarray([175.0, 238.0, 238.0], F32) / F32(255.0)
    out = x01 * (1.0 - F32(opacity) * m) + color.reshape(1, 1, 1, 3) * (F32(opacity) * m)
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)


@op_jit(static=("a", "b"))
def saturate_hsv(img: jnp.ndarray, a: float, b: float) -> jnp.ndarray:
    """CIFAR-10-C saturate: s' = clip(a*s + b) on the HSV saturation
    channel — collapses to rgb' = v - (v - rgb)*(s'/s) with H, V fixed.
    Achromatic pixels (s == 0) take hue 0 in the rgb2hsv roundtrip, so
    with b > 0 (severities 4-5) they red-tint: (v, v(1-s'), v(1-s')) —
    matching skimage's rgb2hsv/hsv2rgb, which zeroes hue when delta == 0.
    oracle.corruptions.saturate_hsv; SATURATE_SEV."""
    x, single = as_batch(img)
    x01 = x.astype(F32) / F32(255.0)
    v = x01.max(axis=-1, keepdims=True)
    mn = x01.min(axis=-1, keepdims=True)
    s = jnp.where(v > 0, (v - mn) / jnp.maximum(v, F32(1e-12)), F32(0.0))
    s2 = jnp.clip(F32(a) * s + F32(b), 0.0, 1.0)
    ratio = s2 / jnp.maximum(s, F32(1e-12))
    grayv = v * (1.0 - s2)
    tint = jnp.concatenate([v, grayv, grayv], axis=-1)
    out = jnp.where(s > 0, v - (v - x01) * ratio, tint)
    return restore_layout(_u8(jnp.clip(out, 0.0, 1.0)), single)
