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
