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


def _grayscale_lanes(xi: jnp.ndarray) -> jnp.ndarray:
    """PIL L24 luma on an interleaved-RGB lane layout, via lane rolls.

    xi: f32 integer pixel values, lanes = ...RGBRGB... . All intermediates
    are integers < 2^24, exactly representable in f32, so this matches the
    fixed-point formula (r*19595 + g*38470 + b*7471 + 0x8000) >> 16 exactly.
    """
    lanes = xi.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, xi.shape, xi.ndim - 1)
    mod = jnp.mod(lane, 3)
    cv = jnp.where(mod == 0, 19595.0, jnp.where(mod == 1, 38470.0, 7471.0))
    p = xi * cv
    # pixel sum lands on the center (G) lane: p[l-1] + p[l] + p[l+1]
    sum3 = p + pltpu.roll(p, 1, axis=1) + pltpu.roll(p, lanes - 1, axis=1)
    luma = jnp.floor((sum3 + 32768.0) * (1.0 / 65536.0))
    return (
        jnp.where(mod == 1, luma, 0.0)
        + jnp.where(mod == 0, pltpu.roll(luma, lanes - 1, axis=1), 0.0)
        + jnp.where(mod == 2, pltpu.roll(luma, 1, axis=1), 0.0)
    )


def _shear_kernel(
    k_ref, f_ref, x_ref, o_ref, *, wc: int, c: int, postop: str | None,
    rows: int, batch_major_out: bool = False,
):
    i = pl.program_id(0)
    for r in range(rows):  # static unroll: fewer grid steps, same vector work
        h = i * rows + r
        k = k_ref[h]
        f = f_ref[h]
        xf = x_ref[r].astype(jnp.int32).astype(jnp.float32)  # [N, WCpad]
        total = xf.shape[1]
        # rolls commute with elementwise ops, so lerp FIRST with one cheap
        # static roll (+c neighbor), then apply the row shift with a single
        # dynamic rotate — dynamic rotates are the dominant cost here.
        nbr = pltpu.roll(xf, total - c, axis=1)
        lerped = xf + f * (nbr - xf)
        # pltpu.roll needs non-negative shift; left-shift k == roll total-k
        out = pltpu.roll(lerped, total - k, axis=1)[:, :wc]
        out = jnp.clip(jnp.trunc(out), 0.0, 255.0)
        if postop == "grayscale":
            out = _grayscale_lanes(out)
        val = out.astype(jnp.int32).astype(jnp.uint8)
        if batch_major_out:
            o_ref[:, r, :] = val  # emits NHWC directly (no final transpose)
        else:
            o_ref[r] = val


def _shear_pad_params(shifts, wc: int, c: int, pad_px: int | None):
    if pad_px is None:
        if isinstance(shifts, np.ndarray):
            pad_px = int(np.ceil(np.abs(shifts).max())) + 1
        else:
            pad_px = int(np.ceil(float(jnp.max(jnp.abs(shifts))))) + 1
    pad_px = max(pad_px, 1)
    pc = pad_px * c
    wc_keep = _round_up(wc, 128)
    # lane layout: [left pad pc][row wc][right pad]; sized so a roll by up to
    # kmax = 2*pc (+c for the lerp partner) never wraps into the kept region
    total = _round_up(wc_keep + 2 * pc + 2 * c, 128)
    return pad_px, pc, wc_keep, total


def _shear_core(
    xt: jnp.ndarray,  # [rows, N, total] fill-padded lanes
    shifts: jnp.ndarray,
    pad_px: int,
    wc_keep: int,
    c: int,
    postop: str | None,
    batch_major_out: bool = False,
) -> jnp.ndarray:
    """The pallas call on pre-padded row-major data.

    Returns [rows, N, wc_keep], or [N, rows, wc_keep] (batch-major — the
    NHWC layout, skipping the final transpose) when ``batch_major_out``.
    """
    rows, n, total = xt.shape
    shifts = jnp.asarray(shifts, jnp.float32)
    k = (jnp.floor(shifts) + pad_px).astype(jnp.int32) * c
    f = (shifts - jnp.floor(shifts)).astype(jnp.float32)
    rps = 8 if rows % 8 == 0 else 1  # rows per grid step
    if batch_major_out:
        out_shape = jax.ShapeDtypeStruct((n, rows, wc_keep), jnp.uint8)
        out_spec = pl.BlockSpec((n, rps, wc_keep), lambda i, k, f: (0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((rows, n, wc_keep), jnp.uint8)
        out_spec = pl.BlockSpec((rps, n, wc_keep), lambda i, k, f: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows // rps,),
        in_specs=[
            pl.BlockSpec((rps, n, total), lambda i, k, f: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        functools.partial(
            _shear_kernel, wc=wc_keep, c=c, postop=postop, rows=rps,
            batch_major_out=batch_major_out,
        ),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(k, f, xt)


def shear_rows(
    img: jnp.ndarray,
    shifts: jnp.ndarray,
    fill: int = 0,
    pad_px: int | None = None,
    postop: str | None = None,
) -> jnp.ndarray:
    """Shift each row y of an NHWC batch horizontally by ``shifts[y]`` pixels
    (shared across the batch), bilinear along x, ``fill`` outside.

    out[n, y, x] = lerp(in[n, y, x + floor(s_y)], in[n, y, x+floor(s_y)+1],
    frac(s_y)). shifts: [H] f32 (or np). pad_px: static max |shift| bound.
    """
    n, h, w, c = img.shape
    wc = w * c
    pad_px, pc, wc_keep, total = _shear_pad_params(shifts, wc, c, pad_px)
    x2 = img.reshape(n, h, wc)
    xp = jnp.pad(
        x2, [(0, 0), (0, 0), (pc, total - wc - pc)], constant_values=fill
    )
    xt = xp.transpose(1, 0, 2)  # [H, N, total]
    out = _shear_core(xt, shifts, pad_px, wc_keep, c, postop)
    return out[:, :, :wc].transpose(1, 0, 2).reshape(n, h, w, c)


def _shear_kernel_per_image(
    k_ref, x_ref, f_ref, o_ref, *, wc: int, c: int, rows: int, n_imgs: int
):
    """Per-(image,row) shifts: vectorized lerp across images, then one
    dynamic roll per image sublane. ~8x the shared-shift kernel's work but
    ~40x faster than the XLA gather warp."""
    i = pl.program_id(0)
    for r in range(rows):
        h = i * rows + r
        xf = x_ref[r].astype(jnp.int32).astype(jnp.float32)  # [N, total]
        total = xf.shape[1]
        nbr = pltpu.roll(xf, total - c, axis=1)
        fv = f_ref[r][:, :1]  # [N, 1] per-image fracs for this row
        lerped = xf + fv * (nbr - xf)
        for n in range(n_imgs):
            k = k_ref[h * n_imgs + n]
            out = pltpu.roll(lerped[n : n + 1, :], total - k, axis=1)[:, :wc]
            o_ref[r, n : n + 1, :] = (
                jnp.clip(jnp.trunc(out), 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
            )


def shear_rows_per_image(
    img: jnp.ndarray,
    shifts: jnp.ndarray,  # [N, H] f32 (per image, per row)
    fill: int = 0,
    pad_px: int | None = None,
) -> jnp.ndarray:
    """Per-image row shifts (each image its own shear slope).

    Same semantics as shear_rows but shifts[n, y]; used by the batched
    per-image-angle rotation. pad_px must be a static bound on |shift|.
    """
    n, h, w, c = img.shape
    wc = w * c
    if pad_px is None:
        if isinstance(shifts, np.ndarray):
            pad_px = int(np.ceil(np.abs(shifts).max())) + 1
        else:
            raise ValueError("traced shifts need a static pad_px bound")
    pad_px = max(int(pad_px), 1)
    shifts = jnp.asarray(shifts, jnp.float32)
    pc = pad_px * c
    wc_keep = _round_up(wc, 128)
    total = _round_up(wc_keep + 2 * pc + 2 * c, 128)
    x2 = img.reshape(n, h, wc)
    xp = jnp.pad(x2, [(0, 0), (0, 0), (pc, total - wc - pc)], constant_values=fill)
    xt = xp.transpose(1, 0, 2)  # [H, N, total]
    # saturate integer shifts at the declared pad budget: a shift beyond
    # pad_px would make the biased roll amount negative / beyond the slab
    # and wrap rolled content back into the kept lanes (same guard as
    # shear_rows_logrouted / rotate_3shear_batched)
    ki = jnp.clip(jnp.floor(shifts), -pad_px, pad_px)
    k = ((ki + pad_px).astype(jnp.int32) * c).T.reshape(-1)  # [H*N]
    f = (shifts - jnp.floor(shifts)).astype(jnp.float32).T  # [H, N]
    # frac values ride as a VMEM input broadcast across lanes
    f_in = jnp.broadcast_to(f[:, :, None], (h, n, 128))
    rps = 8 if h % 8 == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // rps,),
        in_specs=[
            pl.BlockSpec((rps, n, total), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rps, n, 128), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rps, n, wc_keep), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _shear_kernel_per_image, wc=wc_keep, c=c, rows=rps, n_imgs=n
        ),
        out_shape=jax.ShapeDtypeStruct((h, n, wc_keep), jnp.uint8),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(k, xt, f_in)
    return out[:, :, :wc].transpose(1, 0, 2).reshape(n, h, w, c)


def rotate_3shear_batched(
    img: jnp.ndarray, angles_deg: jnp.ndarray, fill: int = 0,
    max_angle_deg: float = 45.0,
) -> jnp.ndarray:
    """Per-image rotation angles [N] via per-image 3-shear passes.

    One compiled executable for ANY angle vector (|angle| <= max_angle_deg,
    which sets the static padding bound). Replaces the XLA gather warp for
    the traced-angles apply_rotation path (~40x faster).

    Concrete angle vectors beyond the budget raise ValueError; tracer
    angles from an enclosing jit are CLAMPED to +-max_angle_deg — a shift
    beyond the static padding would otherwise silently wrap rolled content
    back into the kept region (the same guard as fused_blur_rotate_batched).
    """
    # unjitted wrapper so the budget check sees concrete values; the jitted
    # body below only ever sees tracers
    if not isinstance(angles_deg, jax.core.Tracer):
        amax = float(np.abs(np.asarray(angles_deg)).max())
        if amax > float(max_angle_deg) + 1e-6:
            raise ValueError(
                f"rotate_3shear_batched: max |angle| {amax} exceeds the "
                f"static padding budget max_angle_deg={max_angle_deg}; "
                f"raise the budget or use the exact warp"
            )
    # delegate to the traced megakernel at radius=0: identical per-pass
    # u8-trunc semantics (oracle fast_warp.rotate_3shear), but the whole
    # 3-shear chain stays VMEM-resident with grouped dynamic_rotate routing
    # — the previous 3x shear_rows_per_image path paid two HBM round-trips,
    # two XLA u8 transposes, and one-sublane-per-dynamic-roll VPU
    # utilization (import here: megakernel imports this module at top)
    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    return fused_blur_rotate_batched(
        img, 0.0, angles_deg, fill=fill, grayscale_out=False, stream=False,
        max_angle_deg=float(max_angle_deg),
    )


def _paeth_params(angle_deg: float) -> tuple[float, float]:
    # negated so rotate_3shear(img, a) matches the reference's
    # apply_rotation(img, a) == PIL rotate(-a) sign convention
    t = math.radians(-angle_deg)
    return -math.tan(t / 2.0), math.sin(t)


def _row_shifts(size: int, slope: float, center: float) -> np.ndarray:
    y = np.arange(size, dtype=np.float64) + 0.5
    return (slope * (y - center)).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("radius", "angle_deg", "fill", "grayscale_out")
)
def blur_rotate_fused(
    img: jnp.ndarray,
    radius: float,
    angle_deg: float,
    fill: int = 0,
    grayscale_out: bool = False,
) -> jnp.ndarray:
    """Fully fused blur -> 3-shear rotation (-> grayscale) pipeline.

    Structural fusion: the blur kernel EMITS shear pass 1's fill-padded
    row-major layout (a different output BlockSpec — zero extra traffic),
    and the last shear pass emits NHWC batch-major directly; only the two
    inter-orientation transposes remain as XLA copies. Bit-identical to
    blur_separable -> rotate_3shear (-> grayscale) and to the CPU oracle.
    """
    from imagetransformations_tpu.ops.pallas.blur import blur_to_sheared_rows

    n, h, w, c = img.shape
    a, b = _paeth_params(float(angle_deg))
    sx = _row_shifts(h, a, h / 2.0)
    sy = _row_shifts(w, b, w / 2.0)
    px_x, pc_x, keep_x, tot_x = _shear_pad_params(sx, w * c, c, None)
    px_y, pc_y, keep_y, tot_y = _shear_pad_params(sy, h * c, c, None)

    def pad_lanes(arr, wc, pc, total):
        return jnp.pad(arr, [(0, 0), (0, 0), (pc, total - wc - pc)],
                       constant_values=fill)

    x1in = blur_to_sheared_rows(img, float(radius), pc_x, tot_x, fill)
    y1 = _shear_core(x1in, sx, px_x, keep_x, c, None)  # [H, N, keep_x]
    y1v = y1[:, :, : w * c].reshape(h, n, w, c)
    yt = pad_lanes(y1v.transpose(2, 1, 0, 3).reshape(w, n, h * c), h * c, pc_y, tot_y)
    y2 = _shear_core(yt, sy, px_y, keep_y, c, None)  # [W, N, keep_y]
    y2v = y2[:, :, : h * c].reshape(w, n, h, c)
    zt = pad_lanes(y2v.transpose(2, 1, 0, 3).reshape(h, n, w * c), w * c, pc_x, tot_x)
    # note: batch_major_out would skip the final transpose, but its strided
    # sublane stores cost ~4x the XLA transpose (measured) — keep row-major
    y3 = _shear_core(
        zt, sx, px_x, keep_x, c, "grayscale" if grayscale_out else None
    )  # [H, N, keep_x]
    return y3[:, :, : w * c].transpose(1, 0, 2).reshape(n, h, w, c)


@functools.partial(jax.jit, static_argnames=("angle_deg", "fill", "grayscale_out"))
def rotate_3shear(
    img: jnp.ndarray, angle_deg: float, fill: int = 0, grayscale_out: bool = False
) -> jnp.ndarray:
    """Rotate an NHWC uint8 batch by ``angle_deg`` (reference apply_rotation
    sign convention) via three shears. Best for |angle| <= 45 deg (the
    reference grid is +-22.5, transformation.py:97).

    Exact CPU oracle: oracle/fast_warp.rotate_3shear.
    """
    n, h, w, c = img.shape
    a, b = _paeth_params(float(angle_deg))
    sx = _row_shifts(h, a, h / 2.0)
    sy = _row_shifts(w, b, w / 2.0)
    px_x, pc_x, keep_x, tot_x = _shear_pad_params(sx, w * c, c, None)
    px_y, pc_y, keep_y, tot_y = _shear_pad_params(sy, h * c, c, None)

    def pad_lanes(arr, wc, pc, total):
        return jnp.pad(arr, [(0, 0), (0, 0), (pc, total - wc - pc)],
                       constant_values=fill)

    # pass 1 (shear X): rows = H. One fused transpose+pad into [H,N,W*C+pad].
    xt = pad_lanes(img.transpose(1, 0, 2, 3).reshape(h, n, w * c), w * c, pc_x, tot_x)
    y1 = _shear_core(xt, sx, px_x, keep_x, c, None)  # [H, N, keep_x]
    # pass 2 (shear Y as X on transpose): rows = W. [H,N,W,C] -> [W,N,H*C].
    y1v = y1[:, :, : w * c].reshape(h, n, w, c)
    yt = pad_lanes(y1v.transpose(2, 1, 0, 3).reshape(w, n, h * c), h * c, pc_y, tot_y)
    y2 = _shear_core(yt, sy, px_y, keep_y, c, None)  # [W, N, keep_y]
    # pass 3 (shear X again): rows = H. [W,N,H,C] -> [H,N,W*C].
    y2v = y2[:, :, : h * c].reshape(w, n, h, c)
    zt = pad_lanes(y2v.transpose(2, 1, 0, 3).reshape(h, n, w * c), w * c, pc_x, tot_x)
    y3 = _shear_core(
        zt, sx, px_x, keep_x, c, "grayscale" if grayscale_out else None
    )
    return y3[:, :, : w * c].transpose(1, 0, 2).reshape(n, h, w, c)


@functools.partial(jax.jit, static_argnames=("fill", "max_shift_px"))
def shear_rows_logrouted(
    img: jnp.ndarray,
    shifts: jnp.ndarray,  # [N, H] f32, traced OK
    fill: int = 0,
    max_shift_px: int | None = None,
) -> jnp.ndarray:
    """Per-(image, row) fractional shifts via exact log-routing — ONE
    executable for any traced shift matrix, with no shift-sized padding.

    out[n,y,x] = lerp(in[n,y,x+k], in[n,y,x+k+1], frac) like shear_rows, but
    the integer shift is applied with ~log2(max_shift) static rolls +
    per-row masked selects: the shift is CONSTANT ALONG THE ROUTED (lane)
    axis, so destination-indexed log routing is exact (see
    rotate_gather._route_const_axis). A single c-lane fill pad plus the
    cyclic wrap reproduces the border fill-lerps (megakernel analysis), and
    positions with both lerp endpoints outside the canvas are masked to
    ``fill``. Replaces both the per-row dynamic rotates (poor per-image
    sublane utilization) and the grid-value sweep (measured 49 s/batch at
    32x512x512 for the shear grid: each swept value padded the slab for
    shifts up to v*H).

    max_shift_px: static bound on |shifts| (required for traced shifts).
    """
    from imagetransformations_tpu.ops.pallas.rotate_gather import (
        _roll_left as _rl,
        _route_const_axis,
    )

    n, h, w, c = img.shape
    wc = w * c
    if max_shift_px is None:
        if isinstance(shifts, np.ndarray):
            max_shift_px = int(np.ceil(np.abs(shifts).max())) + 1
        else:
            raise ValueError("traced shifts need a static max_shift_px bound")
    b_px = min(int(max_shift_px) + 1, w + 2)
    ls = _round_up(wc + c, 128)
    nbits = max(int(math.ceil(math.log2(2 * b_px * c + 1))), 1)
    fillf = float(fill)

    sb = jnp.broadcast_to(
        jnp.asarray(shifts, jnp.float32)[:, :, None], (n, h, 128)
    )
    xpix = np.minimum(np.arange(ls) // c, w + 1).astype(np.int32)
    xpix_in = jnp.broadcast_to(jnp.asarray(xpix)[None, :], (8, ls))

    def kernel(x_ref, s_ref, xp_ref, o_ref):
        s = s_ref[0][:, :1]  # [h, 1]
        k = jnp.floor(s)
        f = s - k
        # clamp integer shifts to the declared routing budget: the biased
        # route amount (ki + b_px)*c must stay in [0, 2*b_px*c] or its
        # two's-complement bits select wrong rolls at positions the keep
        # mask doesn't cover. Beyond-budget rows therefore SATURATE at
        # +-b_px (a contract violation degrades to a clamped shear, never
        # to garbage); b_px caps at w+2, where the mask is all-fill anyway
        ki = jnp.clip(k.astype(jnp.int32), -b_px, b_px)
        xf = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [h, wc]
        v = jnp.concatenate(
            [xf, jnp.full((h, ls - wc), fillf)], axis=1
        )  # [h, ls]
        nbr = _rl(v, c, 1)
        ler = v + f * (nbr - v)
        routed = _route_const_axis(
            ler, (ki + b_px) * c, axis=1, unit=1, nbits=nbits, bias=b_px * c
        )
        xp = xp_ref[0:1, :]  # [1, ls] pixel index per lane
        keep = ((xp + ki) >= -1) & ((xp + ki) <= w - 1)
        out = jnp.where(keep, jnp.trunc(routed), fillf)
        o_ref[0] = out[:, :wc].astype(jnp.int32).astype(jnp.uint8)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ls), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(img.reshape(n, h, wc), sb, xpix_in)
    return out.reshape(n, h, w, c)
