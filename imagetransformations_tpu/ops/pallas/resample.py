"""Separable per-image resampling without gathers: traced-factor zoom.

random_zoom (fall_2025/transformations_code:50) is an affine bilinear warp;
XLA lowers its gathers to scalar loops (~0.8 s per 32x512x512 batch). A
center zoom is SEPARABLE — the source x depends only on the output x, the
source y only on the output y — and bilinear interpolation factorizes
exactly into an x-pass then a y-pass (the lerp expressions are literally
the same f32 ops as ops.warp.affine_warp's v1/v2/out). Each axis pass is a
monotone resample with shifts in a small static range (|1 - 1/factor| *
dim/2), applied as select-over-chained-rolls: one roll + three selects per
candidate shift, masks computed from the per-image factor scalar.

The two passes are separate pallas calls blocked along the axis the shift
does NOT mix (row blocks for the horizontal pass, 128-lane blocks for the
vertical pass): the select chain keeps O(range) slabs live through the
Mosaic scheduler, so whole-image slabs blow VMEM at 512x512 (~400 MB);
per-block slabs bound the live set to tens of MB. The f32 intermediate
makes one HBM round trip (~0.25 ms/batch).

One executable for ANY traced factor vector within [min_factor,
max_factor]; matches ops.warp.random_zoom to <=1 LSB (clamped 2x2 windows,
trunc quantization, zero fill outside the source canvas; XLA's FMA
contraction on the CPU backend flips rare 0.5-boundary pixels).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll_left(x: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    size = x.shape[axis]
    s = (size - m) % size
    return x if s == 0 else pltpu.roll(x, s, axis=axis)


def _axis_resample(v, d0, d1, frac, axis, unit, dmin, dmax):
    """out[p] = lerp(v[p + d0], v[p + d1], frac) along ``axis`` where the
    shifts and frac are constant along the OTHER axis and d1 in {d0, d0+1}
    (clamped bilinear window). Select-over-one-chained-roll-family: exact
    for any per-position d0 in [dmin, dmax]."""
    va = jnp.zeros_like(v)
    vb = jnp.zeros_like(v)
    vk = _roll_left(v, dmin * unit, axis)
    for k in range(dmin, dmax + 1):
        vk1 = _roll_left(vk, unit, axis)
        sel = d0 == k
        va = jnp.where(sel, vk, va)
        vb = jnp.where(sel & (d1 == k + 1), vk1, jnp.where(sel, vk, vb))
        vk = vk1
    return va + frac * (vb - va)


def _coords(inv, pos_center, dim):
    """Source coordinate pieces for one axis, same f32 ops as
    zoom_matrix + affine_warp: returns (d0, d1, frac, valid)."""
    half = dim / 2.0
    m = half - inv * half
    src = inv * pos_center + m
    sin = src - 0.5
    s0 = jnp.floor(sin).astype(jnp.int32)
    frac = sin - jnp.floor(sin)
    pix = (pos_center - 0.5).astype(jnp.int32)
    d0 = jnp.clip(s0, 0, dim - 1) - pix
    d1 = jnp.clip(s0 + 1, 0, dim - 1) - pix
    valid = (src >= 0) & (src < dim)
    return d0, d1, frac, valid


def _hpass_kernel(f_sref, x_ref, xc_ref, o_ref, *, w, c, dxl, dxh):
    i = pl.program_id(0)
    inv = 1.0 / f_sref[i]
    xf = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [bh, ls]
    xo = xc_ref[0:1, :]
    d0, d1, fx, validx = _coords(inv, xo, w)
    out = _axis_resample(xf, d0, d1, fx, 1, c, dxl, dxh)
    o_ref[0] = jnp.where(validx, out, 0.0)


def _vpass_kernel(f_sref, v_ref, yc_ref, o_ref, *, h, dyl, dyh):
    i = pl.program_id(0)
    inv = 1.0 / f_sref[i]
    v = v_ref[0]  # [h, bl] f32
    yo = yc_ref[0][:, :1]  # [h, 1]
    e0, e1, fy, validy = _coords(inv, yo, h)
    out = _axis_resample(v, e0, e1, fy, 0, 1, dyl, dyh)
    out = jnp.clip(jnp.trunc(out), 0.0, 255.0)
    o_ref[0] = jnp.where(validy, out, 0.0).astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("min_factor", "max_factor"))
def zoom_bilinear_batched(
    img: jnp.ndarray,
    factors: jnp.ndarray,
    min_factor: float = 0.85,
    max_factor: float = 1.45,
) -> jnp.ndarray:
    """Center zoom with per-image traced factors, matching
    ops.warp.random_zoom to <=1 LSB. factors must lie in [min_factor,
    max_factor] (static bounds set the roll budget; the reference grid is
    0.9-1.4, transformation.py:95-105). NHWC uint8 -> uint8.
    """
    n, h, w, c = img.shape
    wc = w * c
    ls = _round_up(wc + c, 128)

    def drange(dim):
        lo, hi = 0, 0
        for f in (min_factor, max_factor):
            inv = 1.0 / f
            m = int(math.ceil(abs(1.0 - inv) * (dim / 2.0 + 1))) + 2
            lo, hi = min(lo, -m), max(hi, m)
        return lo, hi

    dxl, dxh = drange(w)
    dyl, dyh = drange(h)
    bh = 32 if h % 32 == 0 else h  # H-pass row block
    bl = 128 if ls % 128 == 0 else ls  # V-pass lane block

    fac = jnp.asarray(factors, jnp.float32)
    xc = np.minimum(np.arange(ls) // c, w + 1).astype(np.float32) + 0.5
    xc_in = jnp.asarray(xc).reshape(1, ls)
    yc = (np.arange(h).astype(np.float32) + 0.5).reshape(1, h, 1)
    yc_in = jnp.broadcast_to(jnp.asarray(yc), (1, h, 128))

    xpad = jnp.pad(img.reshape(n, h, wc), [(0, 0), (0, 0), (0, ls - wc)])
    hgrid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, h // bh),
        in_specs=[
            pl.BlockSpec((1, bh, ls), lambda i, j, f_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ls), lambda i, j, f_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, ls), lambda i, j, f_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    hp = pl.pallas_call(
        functools.partial(_hpass_kernel, w=w, c=c, dxl=dxl, dxh=dxh),
        out_shape=jax.ShapeDtypeStruct((n, h, ls), jnp.float32),
        grid_spec=hgrid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(fac, xpad, xc_in)

    vgrid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, ls // bl),
        in_specs=[
            pl.BlockSpec((1, h, bl), lambda i, j, f_: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 128), lambda i, j, f_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, bl), lambda i, j, f_: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_vpass_kernel, h=h, dyl=dyl, dyh=dyh),
        out_shape=jax.ShapeDtypeStruct((n, h, ls), jnp.uint8),
        grid_spec=vgrid,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=_interpret(),
    )(fac, hp, yc_in)
    return out[:, :, :wc].reshape(n, h, w, c)


def _shear_bicubic_kernel(
    f_sref,  # [n] f32 shear factors
    x_ref,   # [1, h, wc] u8
    xc_ref,  # [1, ls] f32 pixel centers (x + 0.5, clamped in pad)
    o_ref,
    *,
    h: int,
    w: int,
    wc: int,
    c: int,
    ls: int,
    b_shift: int,
    nbits: int,
):
    from imagetransformations_tpu.ops.pallas.rotate_gather import (
        _route_const_axis,
    )

    i = pl.program_id(0)
    s = f_sref[i]
    # PIL AFFINE matrix (1, s, -ceil(s*h) if s>0 else 0): oracle
    # shear_matrix computes ceil on the python float; the traced version
    # uses f32 ceil (boundary-identical for the reference grid)
    m1 = s
    m2 = -jnp.where(s > 0, jnp.ceil(s * float(h)), 0.0)

    xf = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [h, wc]
    v = jnp.concatenate([xf, jnp.zeros((h, ls - wc), jnp.float32)], axis=1)

    xo = xc_ref[0:1, :]  # [1, ls]
    yo = (
        jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(jnp.float32) + 0.5
    )
    # same f32 op order as affine_warp: xx = m0*xo + m1*yo + m2
    xx = (xo + m1 * yo) + m2  # [h, ls]
    xin = xx - 0.5
    x0 = jnp.floor(xin).astype(jnp.int32)
    fx = xin - jnp.floor(xin)
    xpix = (xo - 0.5).astype(jnp.int32)
    k = x0 - xpix  # row-constant in exact math, +-1 from f32 rounding
    cy = m1 * yo + m2
    ky = jnp.floor(cy).astype(jnp.int32)  # [h, 1] row base shift
    dk = jnp.clip(k - ky, -1, 1)  # per-position candidate in {-1, 0, 1}
    valid = (xx >= 0) & (xx < w)

    # 6 consecutive taps v[x + ky + t], t = -2..3, via one exact log route
    # (ky is constant along the routed axis) + 5 chained unit rolls
    base = _route_const_axis(v, ky + b_shift, 1, c, nbits, b_shift)
    chain = [_roll_left(base, -2 * c, 1)]
    for _ in range(5):
        chain.append(_roll_left(chain[-1], c, 1))

    def tap(j):  # v[x + k + j] for j in -1..2, honoring dk
        # chain index: (k - ky) + j + 2 in 0..5
        t = jnp.where(dk == -1, chain[j + 1], chain[j + 2])
        return jnp.where(dk == 1, chain[j + 3], t)

    t_m1, t_0, t_1, t_2 = tap(-1), tap(0), tap(1), tap(2)
    # border clamping (affine_warp._gather clips sample indices): within the
    # valid region only x0 in {-1, 0, w-2, w-1} need remaps, all of which
    # stay inside the 4-tap window
    c_m1 = jnp.where(x0 == -1, t_1, jnp.where(x0 == 0, t_0, t_m1))
    c_0 = jnp.where(x0 == -1, t_1, t_0)
    c_1 = jnp.where(x0 == -1, t_1, jnp.where(x0 >= w - 1, t_0, t_1))
    c_2 = jnp.where(
        x0 == -1, t_2, jnp.where(x0 >= w - 1, t_0,
                                 jnp.where(x0 == w - 2, t_1, t_2))
    )
    # cubic Horner on values, identical ops to affine_warp's bicubic branch
    p2 = -c_m1 + c_1
    p3 = 2 * (c_m1 - c_0) + c_1 - c_2
    p4 = -c_m1 + c_0 - c_1 + c_2
    out = c_0 + fx * (p2 + fx * (p3 + fx * p4))
    out = jnp.where(out <= 0, 0.0, jnp.where(out >= 255, 255.0, jnp.trunc(out)))
    out = jnp.where(valid, out, 255.0)
    o_ref[0] = out[:, :wc].astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("max_shear",))
def shear_bicubic_batched(
    img: jnp.ndarray, factors: jnp.ndarray, max_shear: float = 1.05
) -> jnp.ndarray:
    """Reference apply_shear (PIL AFFINE BICUBIC on a widened canvas, white
    fill, transformation.py:212-226) cropped back to the input width, with
    per-image TRACED shear factors in [0, max_shear].

    The vertical cubic collapses (src_y == y exactly, so fy == 0 and the
    y-Horner returns its center row), leaving a per-row horizontal 4-tap
    resample with a row-constant integer shift: one exact log route + 5
    chained rolls + candidate/border selects. Bit-compatible with
    apply_shear(...)[:, :, :w] up to f32 FMA-contraction boundary flips.
    Replaces the 11-value parity sweep that cost ~49 s per 32x512x512 batch.
    """
    n, h, w, c = img.shape
    wc = w * c
    ls = _round_up(wc + c, 128)
    shift_max = int(math.ceil(max_shear * h)) + 2
    b_shift = shift_max + 2
    nbits = max(int(math.ceil(math.log2(2 * b_shift + 1))), 1)

    xc = np.minimum(np.arange(ls) // c, w + 1).astype(np.float32) + 0.5
    xc_in = jnp.asarray(xc).reshape(1, ls)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i, f_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ls), lambda i, f_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i, f_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _shear_bicubic_kernel,
            h=h, w=w, wc=wc, c=c, ls=ls, b_shift=b_shift, nbits=nbits,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(factors, jnp.float32), img.reshape(n, h, wc), xc_in)
    return out.reshape(n, h, w, c)
