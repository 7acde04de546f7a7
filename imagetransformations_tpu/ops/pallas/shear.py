"""Per-row fractional shear kernel + 3-shear (Paeth) rotation.

The TPU-native answer to the reference's PIL rotate (transformation.py:198):
XLA lowers 2D gathers to scalar loops (~500 ms per 32x512x512 batch measured
on v5e), but a rotation decomposes into three *row-uniform* fractional shifts
(Paeth '86):   R(theta) = ShearX(a) . ShearY(b) . ShearX(a),
a = -tan(theta/2), b = sin(theta).  A row-uniform shift is a dynamic lane
rotate (tpu.dynamic_rotate) + a 2-tap lerp — pure VPU work. The Y pass runs
as an X-shear on the transposed image (XLA transposes run at HBM bandwidth).

Mosaic constraints honored: lane offsets must be 128-aligned for vector
loads, so the shift is a dynamic ROLL (cyclic lane permute, any amount) of
the f32-cast slab followed by an aligned [:, :wc] slice; the lane-padded
width is sized so rolled-in wraparound never lands in the kept region.

Layout: one image row index per grid step across ALL images ([N, WCpad]
slab) — full sublane utilization for shared-angle batches (the benchmark
and apply_all cases).

Semantics (CPU oracle: oracle/fast_warp.py): uint8 in/out per pass, lerp
``a + f*(b-a)`` in f32, truncation to uint8, ``fill`` padding at borders.
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


def _shear_kernel(k_ref, f_ref, x_ref, o_ref, *, wc: int, c: int):
    h = pl.program_id(0)
    k = k_ref[h]
    f = f_ref[h]
    xf = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [N, WCpad]
    total = xf.shape[1]
    # pltpu.roll requires non-negative shift; left-shift by k == roll by total-k
    a_full = pltpu.roll(xf, total - k, axis=1)
    b_full = pltpu.roll(a_full, total - c, axis=1)
    a = a_full[:, :wc]
    b = b_full[:, :wc]
    out = a + f * (b - a)
    o_ref[0] = jnp.clip(jnp.trunc(out), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def shear_rows(
    img: jnp.ndarray,
    shifts: jnp.ndarray,
    fill: int = 0,
    pad_px: int | None = None,
) -> jnp.ndarray:
    """Shift each row y of an NHWC batch horizontally by ``shifts[y]`` pixels
    (shared across the batch), bilinear along x, ``fill`` outside.

    out[n, y, x] = lerp(in[n, y, x + floor(s_y)], in[n, y, x+floor(s_y)+1],
    frac(s_y)). shifts: [H] f32 (or np). pad_px: static max |shift| bound.
    """
    n, h, w, c = img.shape
    wc = w * c
    if pad_px is None:
        if isinstance(shifts, np.ndarray):
            pad_px = int(np.ceil(np.abs(shifts).max())) + 1
        else:
            pad_px = int(np.ceil(float(jnp.max(jnp.abs(shifts))))) + 1
    pad_px = max(pad_px, 1)
    shifts = jnp.asarray(shifts, jnp.float32)
    pc = pad_px * c
    wc_keep = _round_up(wc, 128)
    # lane layout: [left pad pc][row wc][right pad]; sized so a roll by up to
    # kmax = 2*pc (+c for the lerp partner) never wraps into the kept region
    total = _round_up(wc_keep + 2 * pc + 2 * c, 128)
    x2 = img.reshape(n, h, wc)
    xp = jnp.pad(
        x2, [(0, 0), (0, 0), (pc, total - wc - pc)], constant_values=fill
    )
    k = (jnp.floor(shifts) + pad_px).astype(jnp.int32) * c
    f = (shifts - jnp.floor(shifts)).astype(jnp.float32)

    xt = xp.transpose(1, 0, 2)  # [H, N, total]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, n, total), lambda i, k, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, wc_keep), lambda i, k, f: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_shear_kernel, wc=wc_keep, c=c),
        out_shape=jax.ShapeDtypeStruct((h, n, wc_keep), jnp.uint8),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(k, f, xt)
    return out[:, :, :wc].transpose(1, 0, 2).reshape(n, h, w, c)


def _paeth_params(angle_deg: float) -> tuple[float, float]:
    # negated so rotate_3shear(img, a) matches the reference's
    # apply_rotation(img, a) == PIL rotate(-a) sign convention
    t = math.radians(-angle_deg)
    return -math.tan(t / 2.0), math.sin(t)


def _row_shifts(size: int, slope: float, center: float) -> np.ndarray:
    y = np.arange(size, dtype=np.float64) + 0.5
    return (slope * (y - center)).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("angle_deg", "fill"))
def rotate_3shear(img: jnp.ndarray, angle_deg: float, fill: int = 0) -> jnp.ndarray:
    """Rotate an NHWC uint8 batch by ``angle_deg`` (reference apply_rotation
    sign convention) via three shears. Best for |angle| <= 45 deg (the
    reference grid is +-22.5, transformation.py:97).

    Exact CPU oracle: oracle/fast_warp.rotate_3shear.
    """
    n, h, w, c = img.shape
    a, b = _paeth_params(float(angle_deg))
    sx1 = _row_shifts(h, a, h / 2.0)
    x1 = shear_rows(img, sx1, fill)
    xt = x1.transpose(0, 2, 1, 3)  # [N, W, H, C]
    sy = _row_shifts(w, b, w / 2.0)
    x2 = shear_rows(xt, sy, fill)
    x3 = x2.transpose(0, 2, 1, 3)
    return shear_rows(x3, sx1, fill)
