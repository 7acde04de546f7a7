"""PIL-exact NEAREST rotation for traced per-image angles, without gathers.

The reference's apply_rotation (transformation.py:198-201) is PIL
``rotate(-angle)`` NEAREST: out[y,x] = in[YY, XX] with
XX = floor(m0*xc + m1*yc + m2), YY = floor(m3*xc + m4*yc + m5)
(inverse-map matrix, xc = x+0.5). XLA lowers the 2D gather to a scalar loop
(~525 ms per 32x512x512 batch on v5e); this kernel expresses the same gather
as two axis passes of VPU rolls + selects, one compiled executable for ANY
angle vector.

Why two passes are enough (and why two buffers): parametrize pass 1 by the
SOURCE row r. For |angle| <= 45 deg (cos >= 0.707) each source row serves at
most two destination rows per column (YY is monotone in y with slope
cos < 1). Pass 1 builds, for each (r, x):

  tA[r, x] = in[r, XXc_A(r, x)],   XXc_A = XX(yA(r,x), x)

where yA(r,x) = min{y : YY(y,x) = r} = ceil((r - m3*xc - m5)/m4 - 0.5) is a
closed-form inverse, and tB uses yB = the other candidate (yA+1 when it maps
to the same r). Pass 2 routes vertically by dv = YY(y,x) - y and picks
A or B per destination with isFirst = [YY(y-1,x) != YY(y,x)]. Substituting
yA into XX gives XXc_A ~= xc/m4 + (m1/m4)*r + const (the rotation
determinant is 1), so the pass-1 lane shift splits into

  base(r)  = floor((m1/m4)*r + const)   -- constant along the routed axis
  residual in [0, K_h],  K_h ~ (1/cos - 1)*w  (small for small angles)

A shift that is CONSTANT ALONG THE ROUTED AXIS can be applied exactly with
log2 rolls + per-row masks (the mask never varies where data moves — no
compounding); the residual is applied exactly with K_h chained unit rolls +
per-element equality selects. Pass 2 splits the same way (base constant
along y is m3-dependent per lane; residual K_v ~ (1-cos)*h).

Costs scale with (1-cos(max_angle)) * image size: trivial for the
reference's CIFAR-scale traced-rotation workloads (uncertainty grids sweep
+-22.5 deg, FINAL_cifar scripts), ~30-90x faster than the XLA gather at
512x512. Coordinates are f32 on device (PIL uses f64), flipping floor() on
measure-zero boundary pixels — callers' parity tests budget <= 0.5% flips
(tests/test_warp.py).
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


def _roll_left(x: jnp.ndarray, m: int, axis: int) -> jnp.ndarray:
    size = x.shape[axis]
    s = (size - m) % size
    return x if s == 0 else pltpu.roll(x, s, axis=axis)


def _route_const_axis(v, amt, axis, unit, nbits, bias):
    """Exact log-shift gather out[p] = v[p + (amt - bias)*unit] along ``axis``
    where ``amt`` (int32, >= 0, < 2**nbits) is CONSTANT along ``axis``
    (it may vary along the other axis — masks broadcast, never move)."""
    v = _roll_left(v, -bias * unit, axis)
    for b in range(nbits):
        rolled = _roll_left(v, (1 << b) * unit, axis)
        v = jnp.where(((amt >> b) & 1) == 1, rolled, v)
    return v


def _rot_kernel(
    m_sref,  # [1, 1, 6] f32 inverse-map matrix, SMEM-blocked per grid step
    x_ref,   # [1, h, wc] u8
    xc_ref,  # [1, wc] f32 pixel-center x coords per lane (x + 0.5)
    o_ref,
    *,
    h: int,
    w: int,
    wc: int,
    c: int,
    kh: int,
    kv: int,
    bits_bh: int,
    bias_bh: int,
    bits_bv: int,
    bias_bv: int,
    fill: int,
):
    m0, m1, m2 = m_sref[0, 0, 0], m_sref[0, 0, 1], m_sref[0, 0, 2]
    m3, m4, m5 = m_sref[0, 0, 3], m_sref[0, 0, 4], m_sref[0, 0, 5]

    xc = xc_ref[0:1, :]  # [1, wc]
    yc = (
        jax.lax.broadcasted_iota(jnp.int32, (h, wc), 0).astype(jnp.float32) + 0.5
    )

    # destination-indexed source coordinates (f32 floors; PIL uses f64 —
    # boundary flips are within callers' 0.5% budget)
    xx = jnp.floor(m0 * xc + m1 * yc + m2)
    yy = jnp.floor(m3 * xc + m4 * yc + m5)
    yym = jnp.floor(m3 * xc + m4 * (yc - 1.0) + m5)
    is_first = yy != yym
    valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)

    v = x_ref[0].astype(jnp.int32)  # route in int32 (u8<->f32 needs a bridge)

    # ---- pass 1: per-source-row horizontal gather --------------------------
    # r = sublane index; yA/yB = candidate destination rows for source row r
    rr = jax.lax.broadcasted_iota(jnp.int32, (h, wc), 0).astype(jnp.float32)
    ya = jnp.ceil((rr - m3 * xc - m5) / m4 - 0.5)
    same = jnp.floor(m3 * xc + m4 * (ya + 1.5) + m5) == rr
    yb = jnp.where(same, ya + 1.0, ya)
    xxa = jnp.floor(m0 * xc + m1 * (ya + 0.5) + m2)
    xxb = jnp.floor(m0 * xc + m1 * (yb + 0.5) + m2)
    # linearized shift: xxa - x ~= (1/m4 - 1)*x + (m1/m4)*r + const, where
    # const = 0.5/m4 + 0.5*m1 + m2 - m1*m5/m4 (det of the rotation is 1).
    # The r term + const go into the per-row base (constant along lanes);
    # the guard -4 absorbs the +-2 slack of the ya-ceil/floor linearization
    # so the residual stays in [0, kh].
    base = jnp.floor(
        (m1 / m4) * rr[:, 0:1]
        + (0.5 / m4 + 0.5 * m1 + m2 - m1 * m5 / m4)
        - 4.0
    ).astype(jnp.int32)
    xpix = jnp.floor(xc - 0.5)  # integer pixel index per lane, [1, wc]
    resa = xxa.astype(jnp.int32) - xpix.astype(jnp.int32) - base
    resb = xxb.astype(jnp.int32) - xpix.astype(jnp.int32) - base

    vb = _route_const_axis(v, base + bias_bh, 1, c, bits_bh, bias_bh)
    ta = jnp.zeros_like(vb)
    tb = jnp.zeros_like(vb)
    vk = vb
    for k in range(kh + 1):
        if k:
            vk = _roll_left(vk, c, 1)
        ta = jnp.where(resa == k, vk, ta)
        tb = jnp.where(resb == k, vk, tb)

    # ---- pass 2: vertical routing by dv = YY - y ---------------------------
    # dv ~= (m4-1)*y + m3*xc + 0.5*m4 + m5 with (m4-1)*y in [-(1-m4)*h, 0]:
    # shift the base down by kv-4 so the residual spans [0, kv]
    ybase = jnp.floor(m3 * xc + 0.5 * m4 + m5) - float(kv - 4)  # [1, wc]
    ybase_i = ybase.astype(jnp.int32)
    resv = yy.astype(jnp.int32) - jax.lax.broadcasted_iota(jnp.int32, (h, wc), 0) - ybase_i

    ta = _route_const_axis(ta, ybase_i + bias_bv, 0, 1, bits_bv, bias_bv)
    tb = _route_const_axis(tb, ybase_i + bias_bv, 0, 1, bits_bv, bias_bv)
    outa = jnp.zeros_like(ta)
    outb = jnp.zeros_like(tb)
    tak, tbk = ta, tb
    for k in range(kv + 1):
        if k:
            tak = _roll_left(tak, 1, 0)
            tbk = _roll_left(tbk, 1, 0)
        sel = resv == k
        outa = jnp.where(sel, tak, outa)
        outb = jnp.where(sel, tbk, outb)

    out = jnp.where(is_first, outa, outb)
    out = jnp.where(valid, out, fill)
    o_ref[0] = out.astype(jnp.uint8)


def _budgets(h: int, w: int, max_angle_deg: float):
    """Routing budgets shared by the kernel and its host-side validator —
    ONE owner so tuning a guard constant cannot desynchronize them.
    Returns (kh, kv, bh_max, bits_bh, bv_max, bits_bv)."""
    t = math.radians(max_angle_deg)
    ct, st = math.cos(t), math.sin(t)
    kh = int(math.ceil((1.0 / ct - 1.0) * w)) + 9
    kv = int(math.ceil((1.0 - ct) * h)) + 9
    # pass-1 base magnitude: |m1/m4|*h + |const terms| (m2, m5 are center
    # offsets bounded by (1-cos)*dim/2 + sin*dim/2); generous bound is cheap
    # (each extra bit is one roll+select)
    bh_max = int(math.ceil((st / ct) * (h + 2) + 0.6 * (w + h) + 12))
    bits_bh = max(int(math.ceil(math.log2(2 * bh_max + 1))), 1)
    bv_max = int(math.ceil(st * (1.5 * w + 2) + h + kv + 12))
    bits_bv = max(int(math.ceil(math.log2(2 * bv_max + 1))), 1)
    return kh, kv, bh_max, bits_bh, bv_max, bits_bv


@functools.lru_cache(maxsize=64)
def _host_bounds_check(h: int, w: int, c: int, max_angle_deg: float) -> None:
    """Prove the kernel's linearization margins hold for this (shape, bound).

    The guard constants (-4 slack, +9 on kh/kv, the 0.6*(w+h) base bound)
    are heuristic; a violating (shape, max_angle) combination would make
    unmatched selects silently emit 0-valued pixels inside the valid
    region. This mirrors the kernel's routing EXACTLY in numpy (f32 math,
    cyclic wraps as index mod) over a grid of worst-case angles and asserts
    the routed result equals the direct gather on every valid pixel, plus
    that the biased log-roll amounts fit their bit budgets. Runs once per
    (shape, bound) at trace time; raises ValueError on any violation.
    """
    from imagetransformations_tpu.ops.warp import rotation_matrix

    kh, kv, bh_max, bits_bh, bv_max, bits_bv = _budgets(h, w, max_angle_deg)

    f32 = np.float32
    xc = (np.arange(w, dtype=f32) + f32(0.5)).reshape(1, w)
    yc = (np.arange(h, dtype=f32) + f32(0.5)).reshape(h, 1)
    rr = np.arange(h, dtype=f32).reshape(h, 1)
    rows = np.arange(h).reshape(h, 1)
    cols = np.arange(w).reshape(1, w)
    v = (rows * w + cols).astype(np.int64)  # unique id per source pixel

    angles = np.unique(
        np.concatenate(
            [
                np.linspace(-max_angle_deg, max_angle_deg, 25),
                np.asarray([0.0, max_angle_deg, -max_angle_deg]),
            ]
        )
    )
    for ang in angles:
        m = np.asarray(rotation_matrix(float(ang), w, h), f32).reshape(6)
        m0, m1, m2, m3, m4, m5 = (f32(x) for x in m)
        xx = np.floor(m0 * xc + m1 * yc + m2)
        yy = np.floor(m3 * xc + m4 * yc + m5)
        yym = np.floor(m3 * xc + m4 * (yc - 1) + m5)
        is_first = yy != yym
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)

        ya = np.ceil((rr - m3 * xc - m5) / m4 - f32(0.5)).astype(f32)
        same = np.floor(m3 * xc + m4 * (ya + f32(1.5)) + m5) == rr
        yb = np.where(same, ya + 1, ya).astype(f32)
        xxa = np.floor(m0 * xc + m1 * (ya + f32(0.5)) + m2)
        xxb = np.floor(m0 * xc + m1 * (yb + f32(0.5)) + m2)
        base = np.floor(
            (m1 / m4) * rr + (f32(0.5) / m4 + f32(0.5) * m1 + m2 - m1 * m5 / m4) - 4.0
        ).astype(np.int64)
        xpix = np.floor(xc - f32(0.5)).astype(np.int64)
        resa = xxa.astype(np.int64) - xpix - base
        resb = xxb.astype(np.int64) - xpix - base
        if np.any(base + bh_max < 0) or np.any(base + bh_max >= 2**bits_bh):
            raise ValueError(
                f"rotate_gather base bound violated: shape ({h},{w}), "
                f"max_angle {max_angle_deg}, angle {ang}"
            )

        # pass 1 mirror: ta[r, x] = v[r, (x + base_r + res) % w] if matched;
        # -1 marks an unmatched select (the kernel would emit 0 there)
        src_a = (cols + base + resa) % w
        src_b = (cols + base + resb) % w
        ta = np.where((resa >= 0) & (resa <= kh), np.take_along_axis(v, src_a, 1), -1)
        tb = np.where((resb >= 0) & (resb <= kh), np.take_along_axis(v, src_b, 1), -1)

        ybase = np.floor(m3 * xc + f32(0.5) * m4 + m5) - f32(kv - 4)
        ybase_i = ybase.astype(np.int64)
        if np.any(ybase_i + bv_max < 0) or np.any(ybase_i + bv_max >= 2**bits_bv):
            raise ValueError(
                f"rotate_gather ybase bound violated: shape ({h},{w}), "
                f"max_angle {max_angle_deg}, angle {ang}"
            )
        resv = yy.astype(np.int64) - rows - ybase_i
        src_r = (rows + ybase_i + resv) % h
        ok_v = (resv >= 0) & (resv <= kv)
        outa = np.where(ok_v, np.take_along_axis(ta, src_r, 0), -1)
        outb = np.where(ok_v, np.take_along_axis(tb, src_r, 0), -1)
        out = np.where(is_first, outa, outb)

        exp = v[yy.astype(np.int64).clip(0, h - 1), xx.astype(np.int64).clip(0, w - 1)]
        # a routing-margin violation shows as an UNMATCHED select (-1)
        # inside the valid region — that must never happen. f32 floor/ceil
        # ties at exact pixel boundaries can instead flip to a 1-pixel
        # NEIGHBOR (the kernel's documented <=0.5% parity budget) — allow
        # those, but only neighbors and only a tiny fraction.
        if np.any(valid & (out == -1)):
            n_bad = int((valid & (out == -1)).sum())
            raise ValueError(
                f"rotate_gather routing margin violated ({n_bad} unmatched "
                f"pixels in the valid region): shape ({h},{w}), max_angle "
                f"{max_angle_deg}, angle {ang} — widen the kernel's guard bounds"
            )
        flip = valid & (out != exp)
        if np.any(flip):
            d = np.abs(out[flip] - exp[flip])
            neighbor = (d == 1) | (d == w) | (d == w - 1) | (d == w + 1)
            frac = flip.sum() / max(int(valid.sum()), 1)
            if not bool(neighbor.all()) or frac > 0.01:
                raise ValueError(
                    f"rotate_gather routing produced non-neighbor pixels "
                    f"(or flip fraction {frac:.4f} > 1%): shape ({h},{w}), "
                    f"max_angle {max_angle_deg}, angle {ang}"
                )


@functools.partial(
    jax.jit, static_argnames=("fill", "max_angle_deg")
)
def pil_rotate_nearest_batched(
    img: jnp.ndarray,
    angles_deg: jnp.ndarray,
    fill: int = 0,
    max_angle_deg: float = 45.0,
) -> jnp.ndarray:
    """PIL-parity NEAREST rotation with per-image (traced) angles.

    One executable for any angle vector with |angle| <= max_angle_deg
    (static; sets roll budgets — keep it at the actual grid bound, e.g.
    22.5 for the reference's uncertainty sweeps, for ~2x less VPU work).
    NHWC uint8 -> uint8, black fill. Semantics: transformation.py:198-201.
    """
    from imagetransformations_tpu.ops.warp import rotation_matrix

    n, h, w, c = img.shape
    wc = w * c
    _host_bounds_check(h, w, c, float(max_angle_deg))
    m = jnp.asarray(rotation_matrix(angles_deg, w, h), jnp.float32)
    m = jnp.broadcast_to(m.reshape(-1, 6), (n, 6)).reshape(n, 1, 6)

    kh, kv, bh_max, bits_bh, bv_max, bits_bv = _budgets(h, w, max_angle_deg)
    bias_bh = bh_max  # biased amt in [0, 2*bh_max]
    bias_bv = bv_max

    xcv = (np.arange(wc) // c + 0.5).astype(np.float32).reshape(1, wc)

    out = pl.pallas_call(
        functools.partial(
            _rot_kernel,
            h=h, w=w, wc=wc, c=c, kh=kh, kv=kv,
            bits_bh=bits_bh, bias_bh=bias_bh,
            bits_bv=bits_bv, bias_bv=bias_bv, fill=fill,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
        grid=(n,),
        in_specs=[
            # per-step SMEM block, NOT scalar prefetch: a prefetched [n, 6]
            # operand is lane-padded to n x 128 f32 in SMEM (1 MB limit),
            # which overflowed at n >= ~2k (the 3,178-image sweep cells).
            # [n, 1, 6] so the block's last two dims equal the array's
            # (Mosaic's block-shape rule)
            pl.BlockSpec((1, 1, 6), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(m, img.reshape(n, h, wc), jnp.asarray(xcv))
    return out.reshape(n, h, w, c)
