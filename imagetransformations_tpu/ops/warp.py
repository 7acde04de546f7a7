"""Geometric warps as inverse-mapping gather ops (NHWC, batched, jittable).

One generic ``affine_warp`` core implements PIL's exact sampling conventions
(see oracle/warp.py for the empirically verified spec); rotate / shear /
translate / zoom are thin matrix constructors over it, so arbitrary chains of
geometric ops compose into a *single* gather by multiplying 3x3 matrices
(pipeline.chain does this fusion).

``apply_scale`` reproduces the reference's LANCZOS resize + center crop/pad
(transformation.py:173-196) as two coefficient matmuls (MXU-friendly), with
PIL's per-pass uint8 quantization.
"""

from __future__ import annotations

import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, as_float, restore_layout
from imagetransformations_tpu.core.jitutil import is_traced, op_jit
from imagetransformations_tpu.oracle import warp as _ow

F32 = jnp.float32


# ------------------------------------------------------------------ matrices


def rotation_matrix(angle_deg, w: int, h: int) -> jnp.ndarray:
    """Inverse-map matrix for the reference's apply_rotation(img, angle).

    Reference calls PIL ``img.rotate(-angle)`` (transformation.py:198-201) and
    PIL negates internally, so the source-coordinate rotation is by ``-angle``
    after the two negations cancel into PIL's matrix convention.
    Accepts a scalar or [N] array of degrees; returns [N, 6].
    """
    xp = jnp if is_traced(angle_deg) else np
    a = xp.deg2rad(xp.atleast_1d(xp.asarray(angle_deg, dtype=np.float32 if xp is np else F32)))
    cos, sin = xp.cos(a), xp.sin(a)
    cx, cy = w / 2.0, h / 2.0
    m0, m1, m3, m4 = cos, sin, -sin, cos
    m2 = m0 * (-cx) + m1 * (-cy) + cx
    m5 = m3 * (-cx) + m4 * (-cy) + cy
    out = xp.stack([m0, m1, m2, m3, m4, m5], axis=-1)
    return out if xp is jnp else out.astype(np.float32)


def translation_matrix(tx, ty) -> jnp.ndarray:
    """Integer-pixel shift: out(x,y) <- src(x-tx, y-ty), zero fill.

    Fractional shifts truncate toward zero (reference ``int(tx)``,
    transformation.py:288-289)."""
    xp = jnp if (is_traced(tx) or is_traced(ty)) else np
    tx = xp.atleast_1d(xp.asarray(tx, dtype=np.float32 if xp is np else F32))
    ty = xp.atleast_1d(xp.asarray(ty, dtype=tx.dtype))
    # broadcast BOTH ways (scalar tx + vector ty must work too)
    shape = np.broadcast_shapes(tx.shape, ty.shape)
    tx = xp.broadcast_to(tx, shape)
    ty = xp.broadcast_to(ty, shape)
    one = xp.ones_like(tx)
    zero = xp.zeros_like(tx)
    out = xp.stack([one, zero, -xp.trunc(tx), zero, one, -xp.trunc(ty)], axis=-1)
    return out if xp is jnp else out.astype(np.float32)


def zoom_matrix(factor, w: int, h: int) -> jnp.ndarray:
    """Zoom about the image center (keeps canvas size; factor>1 magnifies)."""
    xp = jnp if is_traced(factor) else np
    f = xp.atleast_1d(xp.asarray(factor, dtype=np.float32 if xp is np else F32))
    inv = 1.0 / f
    cx, cy = w / 2.0, h / 2.0
    zero = xp.zeros_like(f)
    out = xp.stack([inv, zero, cx - inv * cx, zero, inv, cy - inv * cy], axis=-1)
    return out if xp is jnp else out.astype(np.float32)


def compose_matrices(m_outer: jnp.ndarray, m_inner: jnp.ndarray) -> jnp.ndarray:
    """Compose two inverse-map [N,6] affines: result = inner ∘ outer.

    Applying warp(m_outer) then warp(m_inner) to an image equals a single
    warp with ``compose_matrices(m_inner, m_outer)`` -- the key fusion rule
    used by pipeline.chain to collapse geometric chains into one gather.
    For inverse maps: out->src1 via m_outer(sic), see chain.py for usage.
    """
    a = jnp.atleast_2d(m_outer)
    b = jnp.atleast_2d(m_inner)
    # treat each as 3x3 with last row [0,0,1]; result = b_applied_after? No:
    # inverse maps compose in application order: coords -> m_outer -> m_inner
    r0 = b[:, 0] * a[:, 0] + b[:, 1] * a[:, 3]
    r1 = b[:, 0] * a[:, 1] + b[:, 1] * a[:, 4]
    r2 = b[:, 0] * a[:, 2] + b[:, 1] * a[:, 5] + b[:, 2]
    r3 = b[:, 3] * a[:, 0] + b[:, 4] * a[:, 3]
    r4 = b[:, 3] * a[:, 1] + b[:, 4] * a[:, 4]
    r5 = b[:, 3] * a[:, 2] + b[:, 4] * a[:, 5] + b[:, 5]
    return jnp.stack([r0, r1, r2, r3, r4, r5], axis=-1)


# ------------------------------------------------------------------ core warp


def _gather(x: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Clamped gather x[n, yi[n,h,w], xi[n,h,w], :] -> [N,H',W',C]."""
    n, h, w, _ = x.shape
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    bidx = jnp.arange(n).reshape(n, 1, 1)
    return x[bidx, yi, xi]


@op_jit(static=("out_size", "method", "fill"))
def affine_warp(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_size: tuple[int, int] | None = None,
    method: str = "bilinear",
    fill: float = 0.0,
) -> jnp.ndarray:
    """Inverse-mapping affine warp with PIL-exact sampling.

    matrix: [6] or [N,6] = (a,b,c,d,e,f): src_x = a*(x+.5)+b*(y+.5)+c,
    src_y = d*(x+.5)+e*(y+.5)+f. method in {nearest, bilinear, bicubic}.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    out_h, out_w = out_size or (h, w)
    m = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(matrix, dtype=F32)), (n, 6))
    m = m.reshape(n, 6, 1, 1)
    yo = jnp.arange(out_h, dtype=F32).reshape(1, out_h, 1) + F32(0.5)
    xo = jnp.arange(out_w, dtype=F32).reshape(1, 1, out_w) + F32(0.5)
    xx = m[:, 0] * xo + m[:, 1] * yo + m[:, 2]
    yy = m[:, 3] * xo + m[:, 4] * yo + m[:, 5]
    valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    xf = as_float(x)

    if method == "nearest":
        xi = jnp.floor(xx).astype(jnp.int32)
        yi = jnp.floor(yy).astype(jnp.int32)
        out = _gather(xf, yi, xi)
        quant = None
    elif method == "bilinear":
        xin, yin = xx - 0.5, yy - 0.5
        x0 = jnp.floor(xin).astype(jnp.int32)
        y0 = jnp.floor(yin).astype(jnp.int32)
        fx = (xin - x0.astype(F32))[..., None]
        fy = (yin - y0.astype(F32))[..., None]
        a = _gather(xf, y0, x0)
        b = _gather(xf, y0, x0 + 1)
        c = _gather(xf, y0 + 1, x0)
        d = _gather(xf, y0 + 1, x0 + 1)
        v1 = a + fx * (b - a)
        v2 = c + fx * (d - c)
        out = v1 + fy * (v2 - v1)
        quant = "trunc"
    elif method == "bicubic":
        xin, yin = xx - 0.5, yy - 0.5
        x0 = jnp.floor(xin).astype(jnp.int32)
        y0 = jnp.floor(yin).astype(jnp.int32)
        fx = (xin - x0.astype(F32))[..., None]
        fy = (yin - y0.astype(F32))[..., None]

        def cubic(v1, v2, v3, v4, d):
            p2 = -v1 + v3
            p3 = 2 * (v1 - v2) + v3 - v4
            p4 = -v1 + v2 - v3 + v4
            return v2 + d * (p2 + d * (p3 + d * p4))

        rows = []
        for j in range(-1, 3):
            cols = [_gather(xf, y0 + j, x0 + i) for i in range(-1, 3)]
            rows.append(cubic(cols[0], cols[1], cols[2], cols[3], fx))
        out = cubic(rows[0], rows[1], rows[2], rows[3], fy)
        quant = "clip_trunc"
    else:
        raise ValueError(f"unknown warp method {method!r}")

    if img.dtype == jnp.uint8:
        if quant == "trunc":
            out = jnp.clip(jnp.trunc(out), 0.0, 255.0)
        elif quant == "clip_trunc":
            out = jnp.where(out <= 0, 0.0, jnp.where(out >= 255, 255.0, jnp.trunc(out)))
        out = jnp.where(valid[..., None], out, F32(fill)).astype(jnp.uint8)
    else:
        out = jnp.where(valid[..., None], out, F32(fill))
    return restore_layout(out, single)


# ------------------------------------------------------------------ public ops


def apply_rotation(img: jnp.ndarray, angle, max_angle_deg: float | None = None) -> jnp.ndarray:
    """Reference apply_rotation: PIL rotate(-angle), NEAREST, black fill.

    uint8 batches with |angle| <= 45 route to the roll/select Pallas kernel
    (ops/pallas/rotate_gather.py) — XLA's gather lowering costs ~525 ms per
    32x512x512 batch, the kernel ~30-90x less. The bound is checked on
    concrete values (python floats and non-traced arrays — every direct
    call). Angle arrays traced inside an *enclosing* jit cannot be
    inspected: they use the always-correct XLA warp UNLESS the caller
    declares a bound via ``max_angle_deg`` (<= 45), which opts into the
    kernel with that routing budget. Larger angles and float images use
    the exact XLA warp.
    """
    import jax

    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    budget = 45.0 if max_angle_deg is None else float(max_angle_deg)
    traced = not isinstance(angle, (int, float))
    if traced and not isinstance(angle, jax.core.Tracer):
        in_bounds = bool(np.abs(np.asarray(angle)).max() <= budget) and budget <= 45.0
    elif not traced:
        in_bounds = abs(float(angle)) <= budget and budget <= 45.0
    else:
        # enclosing-jit tracer: only an explicit caller-declared bound
        # routes to the kernel (an unbounded angle beyond the routing
        # budget would silently produce unmatched-select garbage)
        in_bounds = max_angle_deg is not None and budget <= 45.0
    if x.dtype == jnp.uint8 and in_bounds:
        from imagetransformations_tpu.ops.pallas.rotate_gather import (
            pil_rotate_nearest_batched,
        )

        out = pil_rotate_nearest_batched(
            x, jnp.asarray(angle, jnp.float32), max_angle_deg=budget
        )
        return restore_layout(out, single)
    if not traced:
        m = jnp.asarray(np.asarray(_ow.pil_rotate_matrix(-float(angle), w, h), np.float32))
    else:
        m = rotation_matrix(angle, w, h)
    out = affine_warp(x, m, method="nearest", fill=0.0)
    return restore_layout(out, single)


def apply_translation(img: jnp.ndarray, tx, ty=None) -> jnp.ndarray:
    """Reference apply_translation: integer shift, black fill (crop+paste).

    Static shifts are a zeros canvas + static slice copy (the NEAREST
    gather warp costs ~0.26 s per 32x512x512 batch on v5e); traced
    per-image shifts keep the exact warp (the apply_all driver uses the
    dynamic-slice kernel in pipeline/batch.py instead). Fractional shifts
    truncate toward zero like the reference's ``int(tx)``
    (transformation.py:288-289) — NOT floor.
    """
    if ty is None:
        ty = tx
    x, single = as_batch(img)
    if isinstance(tx, (int, float)) and isinstance(ty, (int, float)):
        sx, sy = int(tx), int(ty)
        h, w = x.shape[1], x.shape[2]
        hh, ww = h - abs(sy), w - abs(sx)
        out = jnp.zeros_like(x)
        if hh > 0 and ww > 0:
            dy0, sy0 = max(sy, 0), max(-sy, 0)
            dx0, sx0 = max(sx, 0), max(-sx, 0)
            out = out.at[:, dy0 : dy0 + hh, dx0 : dx0 + ww].set(
                x[:, sy0 : sy0 + hh, sx0 : sx0 + ww]
            )
        return restore_layout(out, single)
    out = affine_warp(x, translation_matrix(tx, ty), method="nearest", fill=0.0)
    return restore_layout(out, single)


@op_jit(static=("shear_factor",))
def apply_shear(img: jnp.ndarray, shear_factor: float) -> jnp.ndarray:
    """Reference apply_shear: widened canvas, AFFINE BICUBIC, white fill."""
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    s = float(shear_factor)
    m = jnp.asarray(np.asarray(_ow.shear_matrix(s, h), np.float32))
    out_w = _ow.shear_out_width(s, w, h)
    out = affine_warp(x, m, out_size=(h, out_w), method="bicubic", fill=255.0)
    return restore_layout(out, single)


def random_zoom(img: jnp.ndarray, factor) -> jnp.ndarray:
    """Center zoom keeping canvas size (fall_2025/transformations_code:50).

    Static uint8 zooms route through the gather-free separable kernel
    (ops/pallas/resample.py, <=1 LSB vs the bilinear warp); traced factors
    without known bounds keep the exact warp (the apply_all driver calls
    the kernel directly with its grid bounds).
    """
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    # the select-over-rolls kernel unrolls ~|1-1/f|*dim/2 chained rolls:
    # extreme factors would compile forever (or OOM Mosaic) — keep the
    # exact warp outside a sane kernel range, mirroring apply_rotation's
    # >45-degree fallback
    if (
        isinstance(factor, (int, float))
        and x.dtype == jnp.uint8
        and 0.5 <= factor <= 4.0
    ):
        from imagetransformations_tpu.ops.pallas.resample import (
            zoom_bilinear_batched,
        )

        f = float(factor)
        # numpy, not eager jnp: operand vectors cost ~40 ms/op on the tunnel
        fac = np.full((x.shape[0],), f, np.float32)
        out = zoom_bilinear_batched(
            x, fac, min_factor=f - 0.01, max_factor=f + 0.01
        )
        return restore_layout(out, single)
    out = affine_warp(x, zoom_matrix(factor, w, h), method="bilinear", fill=0.0)
    return restore_layout(out, single)


@op_jit
def flip_vertical(img: jnp.ndarray) -> jnp.ndarray:
    """Vertical flip (fall_2025/transformations_code:39)."""
    x, single = as_batch(img)
    return restore_layout(jnp.flip(x, axis=1), single)


@op_jit(static=("crop_h", "crop_w"))
def center_crop(img: jnp.ndarray, crop_h: int, crop_w: int) -> jnp.ndarray:
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    top, left = (h - crop_h) // 2, (w - crop_w) // 2
    return restore_layout(x[:, top : top + crop_h, left : left + crop_w], single)


def perspective_coeffs(startpoints, endpoints) -> np.ndarray:
    """Homography coefficients from 4 (or more) point pairs.

    torchvision-style API (fall_2025/transformations_code:54-67 uses
    F.perspective(startpoints, endpoints)): returns the [8] inverse-map
    coefficients for ``perspective_warp`` such that the image quad
    ``startpoints`` is carried onto ``endpoints``; i.e. the homography maps
    each endpoint back to its startpoint:
    sx = (a ex + b ey + c)/(g ex + h ey + 1), sy analogous.

    Solved on host in float64 (exact for 4 pairs, least-squares for more).
    """
    sp = np.asarray(startpoints, np.float64).reshape(-1, 2)
    ep = np.asarray(endpoints, np.float64).reshape(-1, 2)
    if sp.shape[0] != ep.shape[0]:
        raise ValueError(
            f"startpoints/endpoints length mismatch: {sp.shape[0]} vs {ep.shape[0]}"
        )
    if sp.shape[0] < 4:
        raise ValueError("need at least 4 point pairs")
    rows, rhs = [], []
    for (sx, sy), (ex, ey) in zip(sp, ep):
        rows.append([ex, ey, 1, 0, 0, 0, -sx * ex, -sx * ey])
        rhs.append(sx)
        rows.append([0, 0, 0, ex, ey, 1, -sy * ex, -sy * ey])
        rhs.append(sy)
    a = np.asarray(rows)
    b = np.asarray(rhs)
    coeffs, *_ = np.linalg.lstsq(a, b, rcond=None)
    return coeffs.astype(np.float32)


def apply_perspective(img: jnp.ndarray, startpoints, endpoints, fill: float = 0.0) -> jnp.ndarray:
    """Perspective warp defined by corner point pairs (torchvision
    F.perspective semantics): startpoints quad -> endpoints quad, bilinear."""
    return perspective_warp(img, jnp.asarray(perspective_coeffs(startpoints, endpoints)), fill=fill)


@op_jit(static=("fill",))
def perspective_warp(img: jnp.ndarray, coeffs, fill: float = 0.0) -> jnp.ndarray:
    """Projective warp: src = (a x + b y + c, d x + e y + f) / (g x + h y + 1).

    coeffs: [8] or [N,8] inverse-map homography (torchvision-style
    perspective, fall_2025/transformations_code:54-67). Bilinear sampling.
    """
    x, single = as_batch(img)
    n, h, w, _ = x.shape
    cf = jnp.broadcast_to(jnp.atleast_2d(jnp.asarray(coeffs, dtype=F32)), (n, 8))
    cf = cf.reshape(n, 8, 1, 1)
    yo = jnp.arange(h, dtype=F32).reshape(1, h, 1) + F32(0.5)
    xo = jnp.arange(w, dtype=F32).reshape(1, 1, w) + F32(0.5)
    den = cf[:, 6] * xo + cf[:, 7] * yo + 1.0
    xx = (cf[:, 0] * xo + cf[:, 1] * yo + cf[:, 2]) / den
    yy = (cf[:, 3] * xo + cf[:, 4] * yo + cf[:, 5]) / den
    # reuse the bilinear core by inlining a per-pixel matrix-free warp
    valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
    xf = as_float(x)
    xin, yin = xx - 0.5, yy - 0.5
    x0 = jnp.floor(xin).astype(jnp.int32)
    y0 = jnp.floor(yin).astype(jnp.int32)
    fx = (xin - x0.astype(F32))[..., None]
    fy = (yin - y0.astype(F32))[..., None]
    a = _gather(xf, y0, x0)
    b = _gather(xf, y0, x0 + 1)
    c = _gather(xf, y0 + 1, x0)
    d = _gather(xf, y0 + 1, x0 + 1)
    out = (a + fx * (b - a)) + fy * ((c + fx * (d - c)) - (a + fx * (b - a)))
    if img.dtype == jnp.uint8:
        out = jnp.clip(jnp.trunc(out), 0.0, 255.0)
        out = jnp.where(valid[..., None], out, F32(fill)).astype(jnp.uint8)
    else:
        out = jnp.where(valid[..., None], out, F32(fill))
    return restore_layout(out, single)


# ------------------------------------------------------------------ resize


def _resize_matrix_fixed(in_size: int, out_size: int, method: str) -> np.ndarray:
    """Dense [out,in] int32 fixed-point (2^22) filter matrix (PIL coefficients)."""
    bounds, kk = _ow.resize_coeffs(in_size, out_size, method)
    mat = np.zeros((out_size, in_size), np.int32)
    for o in range(out_size):
        xmin, xmax = bounds[o]
        mat[o, xmin : xmin + xmax] = kk[o, :xmax]
    return mat


@op_jit(static=("out_w", "out_h", "method"))
def pil_resize(img: jnp.ndarray, out_w: int, out_h: int, method: str = "lanczos") -> jnp.ndarray:
    """PIL Image.resize, bit-exact: two int32 fixed-point matmuls.

    PIL accumulates pixel * int22-coefficient in int32 with a pre-added
    rounding half, shifts, clamps, and quantizes to uint8 *between* the
    horizontal and vertical passes (Resample.c). Integer accumulation keeps
    this exact (max |acc| < 2^31 for 8-bit pixels and lanczos3 lobes); a f32
    path would drift up to 2 LSB at rounding boundaries.
    """
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    hmat = jnp.asarray(_resize_matrix_fixed(w, out_w, method))
    vmat = jnp.asarray(_resize_matrix_fixed(h, out_h, method))
    half = jnp.int32(1 << (_ow.PRECISION_BITS - 1))
    xi = jnp.clip(jnp.trunc(as_float(x)), 0.0, 255.0).astype(jnp.int32)
    t = jnp.einsum("nhwc,ow->nhoc", xi, hmat, preferred_element_type=jnp.int32)
    t = jnp.clip(jnp.right_shift(t + half, _ow.PRECISION_BITS), 0, 255)
    o = jnp.einsum("nhwc,oh->nowc", t, vmat, preferred_element_type=jnp.int32)
    o = jnp.clip(jnp.right_shift(o + half, _ow.PRECISION_BITS), 0, 255)
    out = o.astype(jnp.uint8) if img.dtype == jnp.uint8 else o.astype(F32)
    return restore_layout(out, single)


import functools as _functools

#: apply_scale_batched formulation (all three are bit-exact vs apply_scale):
#: "scan"  — lax.scan over images, one per-image limb-matmul program
#:           (compile: seconds; runtime: +~ms serial; the default)
#: "limb"  — batched 11-bit-limb f32 MXU einsums (compile: minutes)
#: "i32"   — batched int32 einsum pair (compile: minutes, slowest)
_SCALE_FORM = os.environ.get("ITT_SCALE_FORM", "scan")
_SCALE_LIMB_MXU = _SCALE_FORM != "i32"


def _limb_pass(a, mm, spec: str):
    """One resize pass as three f32 MXU matmuls over 8-BIT coefficient
    limbs, recombined in int32 — bit-exact vs the int32 einsum on BOTH
    backends: every operand integer is <= 255 and therefore EXACT in
    bfloat16, so the TPU MXU's default-precision bf16 input truncation is
    lossless (any hi/lo decomposition of exact-bf16 inputs is exact);
    products are < 2^16 and the ~7-tap row support keeps partial sums
    < 2^19, exact in the f32 accumulator.

    HARD-WON (round 5): the original 11-bit limbs were exact on CPU (true
    f32 einsum) but WRONG on the real chip — jnp.einsum's DEFAULT TPU
    precision truncates f32 inputs to bf16 (8 mantissa bits), silently
    dropping the low bits of 11-bit limbs (bench_kernels gate: 3 LSB at
    23% of pixels at 512x512). Integer-exact MXU matmuls must keep every
    operand <= 2^8 (or request Precision.HIGHEST and pay the multi-pass
    cost)."""
    hi = jnp.floor_divide(mm, 1 << 16).astype(jnp.float32)
    mid = jnp.floor_divide(jnp.remainder(mm, 1 << 16), 1 << 8).astype(jnp.float32)
    lo = jnp.remainder(mm, 1 << 8).astype(jnp.float32)
    af = a.astype(jnp.float32)
    phi = jnp.einsum(spec, af, hi).astype(jnp.int32)
    pmid = jnp.einsum(spec, af, mid).astype(jnp.int32)
    plo = jnp.einsum(spec, af, lo).astype(jnp.int32)
    return (phi << 16) + (pmid << 8) + plo


@_functools.lru_cache(maxsize=32)
def _scale_canvas_matrices(size: int, grid: tuple) -> np.ndarray:
    """[G, size, size] int32 canvas-composed LANCZOS matrices per grid factor.

    apply_scale is resize(LANCZOS) then center crop (factor>1) / black pad
    (factor<1) back to the original canvas (transformation.py:173-196).
    Cropping/padding selects OUTPUT rows of each pass's coefficient matrix
    and commutes with the other pass and with PIL's between-pass uint8
    quantization (both are per-element), so the whole canvas-to-canvas op
    per axis is ONE [size, size] matrix: resize rows shifted to their canvas
    positions, zero rows where the canvas is black-padded (the fixed-point
    rounding of a zero row quantizes to exactly 0 = black).
    """
    mats = np.zeros((len(grid), size, size), np.int32)
    for g, v in enumerate(grid):
        nsize = int(size * v)
        m = _resize_matrix_fixed(size, nsize, "lanczos")
        if v > 1.0:
            off = (nsize - size) // 2
            mats[g] = m[off : off + size]
        else:
            off = (size - nsize) // 2
            mats[g, off : off + nsize] = m
    return mats


@op_jit(static=("grid",))
def apply_scale_batched(img: jnp.ndarray, factors, grid: tuple) -> jnp.ndarray:
    """Per-image apply_scale with traced factors over a static grid — ONE
    executable, ONE LANCZOS resize per image (vs the grid-sweep's
    len(grid) full-batch resizes).

    Each image's two fixed-point coefficient matrices are selected from the
    precomputed canvas-composed stack (``_scale_canvas_matrices``) by
    nearest-grid-value index; the resize itself is the same int32 einsum
    pair as ``pil_resize`` (MXU-friendly), so results are bit-exact vs
    ``apply_scale`` per image. Reference: transformation.py:173-196.
    """
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    gt = tuple(float(v) for v in grid)
    gv = jnp.asarray(np.asarray(gt, np.float32))
    f = jnp.asarray(factors, F32).reshape(-1)
    idx = jnp.argmin(jnp.abs(f[:, None] - gv[None, :]), axis=1)
    half = jnp.int32(1 << (_ow.PRECISION_BITS - 1))
    xi = jnp.clip(jnp.trunc(as_float(x)), 0.0, 255.0).astype(jnp.int32)
    if _SCALE_FORM == "scan":
        # lax.scan over images: XLA compiles ONE per-image limb-matmul
        # program reused N times instead of layout-searching the giant
        # batched einsum, and the per-image matrix comes from a
        # dynamic_slice into the [G, size, size] stack instead of a
        # batched gather (jit of `mats[idx]` ALONE compiled in 86 s at
        # 32x512x512 — the gather, not the einsum, is apply_scale_batched's
        # dominant compile cost; tools/probe_scale_compile.py round 4).
        # The serial MXU matmuls add only ~ms (each image's two passes are
        # ~3 GFLOP). Same limb math as below, so bit-exact.
        hmats = jnp.asarray(_scale_canvas_matrices(w, gt))
        vmats = jnp.asarray(_scale_canvas_matrices(h, gt))

        def body(_, args):
            im, i = args  # [H,W,C] i32, scalar index into the grid
            hm = jax.lax.dynamic_index_in_dim(hmats, i, keepdims=False)
            vm = jax.lax.dynamic_index_in_dim(vmats, i, keepdims=False)
            t1 = _limb_pass(im, hm, "hwc,ow->hoc")
            t1 = jnp.clip(jnp.right_shift(t1 + half, _ow.PRECISION_BITS), 0, 255)
            return None, _limb_pass(t1, vm, "hwc,oh->owc")

        o = jax.lax.scan(body, None, (xi, idx))[1]
    else:
        # batched formulations (compile in MINUTES at 32x512x512 — the
        # [G,size,size][idx] gather alone costs ~86 s to compile, the
        # batched einsum pair the rest; kept for A/B and as the
        # maximum-parallelism option for huge batches):
        # - limb: 8-bit-limb f32 MXU einsums — bit-exact vs int32 on BOTH
        #   backends (all operands <= 255 are exact in bf16, so the TPU
        #   MXU's default input truncation is lossless — see _limb_pass's
        #   hard-won note); the 2-matmul 11-bit form compiled ~20% faster
        #   than the int32 pair (371 vs 467 s, round-4 slow-server regime)
        #   but was WRONG on the real chip
        # - i32: the original int32 einsum pair
        hsel = jnp.asarray(_scale_canvas_matrices(w, gt))[idx]
        vsel = jnp.asarray(_scale_canvas_matrices(h, gt))[idx]
        if _SCALE_LIMB_MXU:
            t = _limb_pass(xi, hsel, "nhwc,now->nhoc")
            t = jnp.clip(jnp.right_shift(t + half, _ow.PRECISION_BITS), 0, 255)
            o = _limb_pass(t, vsel, "nhwc,noh->nowc")
        else:
            t = jnp.einsum(
                "nhwc,now->nhoc", xi, hsel, preferred_element_type=jnp.int32
            )
            t = jnp.clip(jnp.right_shift(t + half, _ow.PRECISION_BITS), 0, 255)
            o = jnp.einsum(
                "nhwc,noh->nowc", t, vsel, preferred_element_type=jnp.int32
            )
    o = jnp.clip(jnp.right_shift(o + half, _ow.PRECISION_BITS), 0, 255)
    out = o.astype(jnp.uint8) if img.dtype == jnp.uint8 else o.astype(F32)
    return restore_layout(out, single)


@op_jit(static=("scale_factor",))
def apply_scale(img: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Reference apply_scale: LANCZOS resize then center crop (up) or black
    pad (down) back to the original canvas (transformation.py:173-196)."""
    x, single = as_batch(img)
    h, w = x.shape[1], x.shape[2]
    sf = float(scale_factor)
    nw, nh = int(w * sf), int(h * sf)
    scaled = pil_resize(x, nw, nh, "lanczos")
    if sf > 1.0:
        left, top = (nw - w) // 2, (nh - h) // 2
        out = scaled[:, top : top + h, left : left + w]
    elif sf < 1.0:
        px, py = (w - nw) // 2, (h - nh) // 2
        out = jnp.zeros_like(x)
        out = out.at[:, py : py + nh, px : px + nw].set(scaled)
    else:
        out = scaled
    return restore_layout(out, single)
