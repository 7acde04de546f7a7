"""Whole-pipeline-per-image mega-kernels: blur -> 3-shear rotate -> grayscale.

Round-1 profiling showed the fused pipeline was dominated not by compute but
by the XLA u8 transposes between shear orientations (~0.43 ms each at
~140 GB/s, 3 per batch) and by HBM round-trips between stages. These kernels
keep ONE image resident in VMEM for the entire chain:

  u8 load -> reflect-101 pad in u8 (sublane concats) -> one f32 cast
           -> vertical blur taps (sublane slices, symmetric pairs)
           -> horizontal blur taps (sublane slices on the in-VMEM transpose)
           -> [quantize] -> shear X (per-run static lane rolls + f32 lerp)
           -> [quantize] -> in-VMEM f32 transpose -> shear Y -> [quantize]
           -> transpose back -> shear X -> [quantize]
           -> optional PIL-exact grayscale -> u8 store

Four variants share this structure:
- ``stream=False`` (default): the [quantize] steps are the reference's
  per-op uint8 rounding — bit-identical to gaussian_blur ->
  oracle rotate_3shear (-> grayscale) image-at-a-time semantics.
- ``stream=True``: f32 streaming, ONE final quantization (the fast-mode
  chain contract; oracle fast_warp.fused_stream_chain) — fewer VPU passes
  and unbiased rounding. With ``grayscale_out`` the kernel further
  COMMUTES grayscale to the FRONT of the chain (blur and shears are all
  linear): exact integer luma from the raw uint8 input, then blur AND the
  three shears on a single luma plane — 1/3 the data
  (``_mega_gray1_kernel`` / ``_luma_blur_front``; 14.0 Gpix/s on v5e at
  512x512, parity 0 LSB).
- ``fused_blur_rotate_batched``: per-image TRACED angles — per-run static
  rolls become a -bias pre-roll + log2(shift range) roll+select pairs,
  one executable for any angle vector (with the same gray1 variant).

Shear slabs carry a single RIGHT fill pad: the cyclic roll wraps negative
source positions into the pad (= fill), and the lerp-partner roll wraps
source pixel -1's partner onto content pixel 0 — exactly the oracle's
lerp(fill, v[0], f) at the left border. No left margin, no 128-alignment
bookkeeping, ~10-20% narrower slabs.

HBM traffic is exactly one u8 read + one u8 write per image; orientation
changes are Mosaic-internal f32 relayouts. Integer shear shifts are static
per compiled (angle, shape), so rows sharing floor(shift) are processed as
one sublane slice with a single static roll; the fractional lerp uses a
per-row f32 vector computed host-side in f64 (bit-identical to the CPU
oracle oracle/fast_warp.py). The kernel is written dataflow-style (values +
one concatenate per stage, no scratch read-modify-write) — per-segment
in-place ref updates measured ~5x slower due to store/load serialization.

Semantics (differential-tested):
- blur: cv2.GaussianBlur (oracle/stencil.gaussian_blur), rint quantization
- rotation: oracle/fast_warp.rotate_3shear (u8-trunc between passes)
- grayscale: PIL convert('L') L24 fixed point, replicated to 3 channels

Mosaic constraints honored: kept slices start at lane 0; uint8<->f32 casts
bridge via int32; pltpu.roll shifts are non-negative; no fan-out roll
chains on full slabs (sublane slices instead — full-slab roll fan-out
crashes the TPU compiler backend); concat pieces must be non-empty.

Reference behavior being rebuilt: pipenline/cifar_image_transformations.py
(blur), transformation.py:198 (rotate), transformation.py:254 (grayscale).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize, gaussian_taps


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Relayout micro-opt flags, default False until validated on the real chip
# (tools/probe_unaligned_luma.py — Mosaic acceptance can't be checked in
# interpret mode; parity of both settings IS interpret-tested).
# _UNALIGNED_LUMA_U8: unaligned shapes (224x224, 32x32) sublane-pad and keep
# the gray1 input transpose/split in u8 (1/4 relayout bytes) instead of the
# cast-to-i32-first route. See _luma_blur_front docstring.
# _U8_OUTPUT_STORE: cast i32 -> u8 BEFORE the gray1 output transpose so the
# [wc, h] relayout moves u8 bytes.
_UNALIGNED_LUMA_U8 = False
_U8_OUTPUT_STORE = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# the angle -> shear-shift math must stay bit-identical to the CPU oracle
# AND the standalone shear kernels — one owner (shear.py), no copies
from imagetransformations_tpu.ops.pallas.shear import (  # noqa: E402
    _paeth_params,
    _row_shifts,
)


def _gray_constants(wc: int) -> np.ndarray:
    """[3, wc] grayscale kernel constants (see _grayscale_rows): row 0 =
    per-lane L24 weights, row 1 = center-lane scale, row 2 = center-lane
    bias. Host-side numpy (jnp.asarray constants can't be captured in
    kernels — passed as an input)."""
    lane_mod = np.arange(wc) % 3
    gv = np.zeros((3, wc), np.float32)
    gv[0] = np.choose(lane_mod, [19595.0, 38470.0, 7471.0])
    center = (lane_mod == 1).astype(np.float32)
    gv[1] = center * np.float32(1.0 / 65536.0)
    gv[2] = center * np.float32(0.5)
    return gv


def _runs(k: np.ndarray) -> list[tuple[int, int, int]]:
    """Maximal (start, end, k) row segments of equal integer shift."""
    out: list[tuple[int, int, int]] = []
    i, n = 0, len(k)
    while i < n:
        j = i + 1
        while j < n and k[j] == k[i]:
            j += 1
        out.append((i, j, int(k[i])))
        i = j
    return out


def _roll_left(x: jnp.ndarray, m: int, axis: int = 1) -> jnp.ndarray:
    """out[i] = x[i + m] (cyclic); pltpu.roll wants a non-negative shift."""
    size = x.shape[axis]
    s = (size - m) % size
    return x if s == 0 else pltpu.roll(x, s, axis=axis)


def _store_lane_interleaved(o_ref, vi: jnp.ndarray) -> None:
    """Final gray1 store: transpose the [wc, h] i32 channel-replicated slab
    back to row-major and store as u8. With _U8_OUTPUT_STORE the cast
    happens BEFORE the transpose (u8 relayout = 1/4 the bytes)."""
    if _U8_OUTPUT_STORE:
        o_ref[0] = jnp.swapaxes(vi.astype(jnp.uint8), 0, 1)
    else:
        o_ref[0] = jnp.swapaxes(vi, 0, 1).astype(jnp.uint8)


def _grayscale_rows(xi: jnp.ndarray, cv: jnp.ndarray, cs: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """PIL L24 luma on interleaved-RGB lanes (all intermediates < 2^24,
    exact in f32). The per-lane weight vector ``cv`` ([1, lanes]:
    19595/38470/7471 by lane%3), the center-lane scale ``cs`` (1/65536 at
    lane%3==1, else 0) and bias ``cb`` (0.5 at lane%3==1, else 0) arrive as
    kernel inputs — recomputing them from iota costs ~0.2 ms/batch.

    11-op formulation (vs 14 for the mask-distribute version): the scaled
    luma ``s`` is nonzero ONLY at center lanes, so distributing it to all
    three channel lanes is ``s + roll(s, +-1)`` — the rolled neighbors of a
    non-center lane are exactly one center lane and one zero. Division by
    2^16 and the +0.5 bias are exact in f32 (sum3 is an integer < 2^24), so
    s == (sum3 + 32768) / 65536 bit-for-bit at center lanes; the final
    astype(int32) truncation applies PIL's floor (values are >= 0)."""
    lanes = xi.shape[-1]
    q = xi * cv
    sum3 = q + pltpu.roll(q, 1, axis=1) + pltpu.roll(q, lanes - 1, axis=1)
    s = sum3 * cs + cb
    return s + pltpu.roll(s, 1, axis=1) + pltpu.roll(s, lanes - 1, axis=1)


def _quant_trunc(x: jnp.ndarray) -> jnp.ndarray:
    # lerp output (1-f)*a + f*b of values in [0, 255] stays in [0, 255]
    # (worst-case f32 rounding gives -0.0 / 255.00002, both truncating to
    # the oracle's clipped value), so the oracle's clip is a no-op here —
    # skipping it saves a full VPU slab pass per shear.
    return jnp.trunc(x)


def _shear_pass(v, runs, f_col, lane_unit, quantize=True):
    """One X-style shear on a margin-padded slab value.

    v: [rows, ls] f32, fill margins in place. out[r, l] =
    lerp(v[r, l + k_r*lane_unit], v[r, l + (k_r+1)*lane_unit], f_r),
    truncation-quantized unless ``quantize=False`` (f32 streaming mode).
    Integer shifts are static per row segment.
    """
    nbr = _roll_left(v, lane_unit)
    ler = v + f_col * (nbr - v)
    parts = [_roll_left(ler[r0:r1], k * lane_unit) for r0, r1, k in runs]
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return _quant_trunc(out) if quantize else out


def _mega_kernel(
    x_ref,
    f1_ref,  # [h, 128] f32 lerp fracs, pass 1/3 (lane column 0)
    f2_ref,  # [wc, 128] f32 lerp fracs, pass 2
    g_ref,  # [3, wc] f32: row 0 = L24 lane weights, row 1 = center-lane
            # scale (1/65536), row 2 = center-lane bias (0.5)
    o_ref,
    *,
    h: int,
    wc: int,
    c: int,
    ls1: int,  # pass-1/3 slab lanes (wc + right fill pad, 128-mult)
    ls2: int,  # pass-2 slab lanes (h + right fill pad, 128-mult)
    taps: tuple[float, ...],
    runs1: tuple[tuple[int, int, int], ...],
    runs2: tuple[tuple[int, int, int], ...],
    fill: int,
    grayscale_out: bool,
    identity_rot: bool,
    stream: bool,
):
    fillf = float(fill)
    w = wc // c
    # ---- blur (or plain cast when radius == 0) ----------------------------
    p = (len(taps) - 1) // 2
    if p:
        # reflect-101 padding is built IN KERNEL from sublane slices (the
        # XLA jnp.pad(reflect) + reshape pre-pass cost 0.42 ms/batch of HBM
        # round-trips — a third of the whole chain). Vertical reflection is
        # a sublane concat here; horizontal reflection becomes a sublane
        # concat of per-pixel c-row strips after the transpose.
        # pad in uint8 (1/4 the concat bytes), ONE cast of the padded slab
        xu = x_ref[0]
        xpadv = jnp.concatenate(
            [xu[i : i + 1, :] for i in range(p, 0, -1)]
            + [xu]
            + [xu[h - 2 - i : h - 1 - i, :] for i in range(p)],
            axis=0,
        ).astype(jnp.int32).astype(jnp.float32)  # [h + 2p, wc]

        # Gaussian taps are symmetric: pair mirrored slices with one add
        # before the multiply (k taps -> (k+1)/2 multiplies). Every full-slab
        # VPU op costs ~0.9 us/image, so the pass count is the benchmark.
        def tap_sum(src, unit):
            def at(t):
                return src[t * unit : t * unit + (h if unit == 1 else wc), :]

            acc = taps[p] * at(p)
            for t in range(p):
                acc = acc + taps[t] * (at(t) + at(2 * p - t))
            return acc

        accv = tap_sum(xpadv, 1)  # [h, wc]
        # horizontal taps on the transpose: lane offsets t*c become sublane
        # slice offsets (unrestricted, cheap) instead of lane rolls (~0.5 ms
        # per batch for a 9-tap kernel); transposes cost ~0.08 ms each
        acct = jnp.swapaxes(accv, 0, 1)  # [wc, h]
        acctp = jnp.concatenate(
            [acct[c * i : c * i + c, :] for i in range(p, 0, -1)]
            + [acct]
            + [acct[c * (w - 2 - i) : c * (w - 2 - i) + c, :] for i in range(p)],
            axis=0,
        )  # [(w + 2p) * c, h]
        acch = tap_sum(acctp, c)  # [wc, h]
        # positive taps summing to 1: a convex combination of [0,255] values
        # needs no clip after rint. Stream mode keeps f32 (one quantization
        # at the very end), saving a full VPU pass here and one per shear.
        maybe_rint = (lambda v: v) if stream else jnp.rint
        if identity_rot:
            content = maybe_rint(jnp.swapaxes(acch, 0, 1))
        else:
            # fold pass-1's fill margins into the blur-output transpose:
            # concat the (small) fill block on SUBLANES pre-transpose so the
            # transpose materializes the widened [h, ls1] slab directly — a
            # post-transpose with_margins concat copies the whole slab again
            # (~1 full VPU pass); this copies only the ~10% margin block
            accw = jnp.concatenate(
                [acch, jnp.full((ls1 - wc, h), fillf)], axis=0
            )  # [ls1, h]
            content = maybe_rint(jnp.swapaxes(accw, 0, 1))  # [h, ls1]
    else:
        content = x_ref[0].astype(jnp.int32).astype(jnp.float32)

    def with_margins(mid, left, total):
        # zero-width pieces crash the Mosaic vectorizer — emit only nonempty
        rows = mid.shape[0]
        parts = []
        if left:
            parts.append(jnp.full((rows, left), fillf))
        parts.append(mid)
        if total - left - mid.shape[1]:
            parts.append(jnp.full((rows, total - left - mid.shape[1]), fillf))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    if identity_rot:
        # angle == 0: every shear is the identity (k=0, f=0) — skip the
        # three passes; blur(+grayscale) alone beats blur_separable by ~30%
        out = content
        if grayscale_out:
            out = _grayscale_rows(out, g_ref[0:1, :], g_ref[1:2, :], g_ref[2:3, :])
        elif stream:
            out = jnp.rint(out)  # stream blur-only: single final quantize
        o_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)
        return

    f1c = f1_ref[:, :1]
    f2c = f2_ref[:, :1]

    # A single RIGHT fill pad serves both shear directions: the cyclic roll
    # wraps negative source positions into the pad (= fill), and the wrap of
    # the lerp-partner roll maps source pixel -1's partner onto content
    # pixel 0 — exactly the oracle's lerp(fill, v[0], f) at the left edge.
    # No 128-aligned left margin means every slab is ~10-20% narrower and
    # all kept slices start at lane 0. Between passes, the fill margins are
    # rebuilt by concatenating the small fill block on SUBLANES *before*
    # each transpose (the transpose then materializes the widened slab for
    # free) — a post-transpose with_margins copies the full slab, ~1 VPU
    # pass each, 3x per image.

    # ---- pass 1: shear X ---------------------------------------------------
    c1 = content if content.shape[1] == ls1 else with_margins(content, 0, ls1)
    s1 = _shear_pass(c1, runs1, f1c, c, quantize=not stream)

    # ---- pass 2: shear Y on the in-VMEM transpose --------------------------
    s1w = jnp.concatenate(
        [s1[:, :wc], jnp.full((ls2 - h, wc), fillf)], axis=0
    )  # [ls2, wc]
    s2 = _shear_pass(jnp.swapaxes(s1w, 0, 1), runs2, f2c, 1, quantize=not stream)

    # ---- pass 3: shear X, fused grayscale, u8 store -------------------------
    s2w = jnp.concatenate(
        [s2[:, :h], jnp.full((ls1 - wc, h), fillf)], axis=0
    )  # [ls1, h]
    # stream mode: grayscale's final floor IS the single quantization (the
    # L24 luma of f32 values stays < 2^24, exact); without grayscale the
    # pass-3 trunc is the single quantization
    s3 = _shear_pass(
        jnp.swapaxes(s2w, 0, 1), runs1, f1c, c,
        quantize=(not stream) or (not grayscale_out),
    )
    out = s3[:, :wc]
    if grayscale_out:
        out = _grayscale_rows(out, g_ref[0:1, :], g_ref[1:2, :], g_ref[2:3, :])
    o_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)


def _luma_blur_front(x_ref, h: int, wc: int, c: int, lsx: int,
                     taps: tuple[float, ...], fillf: float) -> jnp.ndarray:
    """Shared front half of the gray1 kernels: EXACT integer luma from the
    raw uint8 input, then the separable blur on the single luma plane.

    Grayscale commutes with the whole linear chain (blur AND shears), so
    the u8 input is transposed (1/4-cost u8 relayout), reshape-split into
    channel planes, and reduced to luma BEFORE anything else — the blur
    and every later stage run on 1/3 the data. The integer L24 dot product
    is exact in int32 and its f32 conversion is exact (< 2^24), so this
    luma is MORE precise than rounding three f32 products.

    Blur runs X-pass first (sublane taps in [w, h]) then, after the
    transpose that also folds in the shear fill margins, Y-pass in
    [h, lsx] (the 0-fill margin lanes blur to 0 = fill). Returns the
    blurred luma [h, lsx] ready for shear pass 1.

    The uint8 reshape-split needs int8-tileable layouts: the lane dim must
    be a 128-multiple or Mosaic rejects the shape cast
    ("infer-vector-layout: unsupported shape cast" on 672x224 i8, found
    at 224x224 — the TRANSPOSE itself accepts unaligned lanes; only the
    split does not). Unaligned shapes therefore sublane-pad the u8 rows to
    a 128-multiple BEFORE the transpose, so the transposed slab's lanes
    are aligned for the split; the pad lanes (zeros) ride along and are
    sliced off after the post-blur transpose. This keeps the big relayout
    in u8 (1/4 the bytes of the i32-first route). Gated by
    `_UNALIGNED_LUMA_U8` until Mosaic acceptance is proven on-chip
    (tools/probe_unaligned_luma.py); False = the i32-first route.
    """
    w = wc // c
    aligned = h % 128 == 0 and wc % 128 == 0
    if aligned or _UNALIGNED_LUMA_U8:
        hl = h if aligned else _round_up(h, 128)
        xu = x_ref[0]
        if hl != h:
            xu = jnp.concatenate(
                [xu, jnp.zeros((hl - h, wc), jnp.uint8)], axis=0
            )
        xt = jnp.swapaxes(xu, 0, 1)  # [wc, hl] u8 (1/4-cost relayout)
        xr = xt.reshape(w, c, hl)
        r_i = xr[:, 0, :].astype(jnp.int32)
        g_i = xr[:, 1, :].astype(jnp.int32)
        b_i = xr[:, 2, :].astype(jnp.int32)
    else:
        hl = h
        xi = jnp.swapaxes(x_ref[0].astype(jnp.int32), 0, 1)  # [wc, h] i32
        xr = xi.reshape(w, c, h)
        r_i, g_i, b_i = xr[:, 0, :], xr[:, 1, :], xr[:, 2, :]
    lum_i = (g_i * 38470 + r_i * 19595) + b_i * 7471
    lum = lum_i.astype(jnp.float32) * jnp.float32(1.0 / 65536.0)  # [w, hl]

    p = (len(taps) - 1) // 2

    def tap_sum(src, rows):
        def at(t):
            return src[t : t + rows, :]

        acc = taps[p] * at(p)
        for t in range(p):
            acc = acc + taps[t] * (at(t) + at(2 * p - t))
        return acc

    if p:
        xpadh = jnp.concatenate(
            [lum[i : i + 1, :] for i in range(p, 0, -1)]
            + [lum]
            + [lum[w - 2 - i : w - 1 - i, :] for i in range(p)],
            axis=0,
        )
        bx = tap_sum(xpadh, w)  # [w, hl]
    else:
        bx = lum
    bxw = jnp.concatenate([bx, jnp.full((lsx - w, hl), fillf)], axis=0)
    t1 = jnp.swapaxes(bxw, 0, 1)  # [hl, lsx]
    if hl != h:
        t1 = t1[:h, :]  # drop the alignment-pad lanes (sublane slice, free)
    if not p:
        return t1
    xpadv = jnp.concatenate(
        [t1[i : i + 1, :] for i in range(p, 0, -1)]
        + [t1]
        + [t1[h - 2 - i : h - 1 - i, :] for i in range(p)],
        axis=0,
    )
    bv = tap_sum(xpadv, h)  # [h, lsx]
    if fillf != 0.0:
        # the margin lanes rode through the Y blur and now hold
        # fill * sum(f32 taps) != exactly fill (the non-gray kernels concat
        # margins AFTER the blur and don't have this); restore the exact
        # fill the shear-pass oracle pads with. One extra VPU pass, only on
        # the cold fill != 0 path (chain.py always uses fill=0, where the
        # blurred margin is exactly 0).
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, lsx), 1)
        bv = jnp.where(lane < w, bv, fillf)
    return bv


def _mega_gray1_kernel(
    x_ref,
    f1_ref,   # [h, 128] f32 pass-1/3 lerp fracs
    f2p_ref,  # [w, 128] f32 pass-2 PIXEL lerp fracs (not c-replicated)
    o_ref,
    *,
    h: int,
    wc: int,
    c: int,
    lsx: int,  # single-channel pass-1/3 lane width (w + margin, 128-mult)
    ls2: int,  # pass-2 lane width (h + margin, 128-mult)
    taps: tuple[float, ...],
    runs1: tuple[tuple[int, int, int], ...],
    runs2p: tuple[tuple[int, int, int], ...],
    fill: int,
):
    """Stream-mode GRAYSCALE -> blur -> 3-shear rotate, ALL on a single
    luma plane (see _luma_blur_front): grayscale commutes with every
    linear stage, so the whole chain runs on 1/3 the data. The final
    channel replication is a sublane stack+reshape (supported by Mosaic;
    lane interleave is not). Bit-exact oracle:
    fast_warp.fused_stream_chain (gray-first order)."""
    fillf = float(fill)
    w = wc // c
    bv = _luma_blur_front(x_ref, h, wc, c, lsx, taps, fillf)  # [h, lsx]

    # ---- 3 shears on the luma plane (1/3 the data) ------------------------
    s1 = _shear_pass(bv, runs1, f1_ref[:, :1], 1, quantize=False)
    s1w = jnp.concatenate([s1[:, :w], jnp.full((ls2 - h, w), fillf)], axis=0)
    s2 = _shear_pass(jnp.swapaxes(s1w, 0, 1), runs2p, f2p_ref[:, :1], 1, quantize=False)
    s2w = jnp.concatenate([s2[:, :h], jnp.full((lsx - w, h), fillf)], axis=0)
    s3 = _shear_pass(jnp.swapaxes(s2w, 0, 1), runs1, f1_ref[:, :1], 1, quantize=False)

    # single final quantization: floor(v + 0.5) via the int cast (v >= 0)
    v = (s3[:, :w] + 0.5).astype(jnp.int32)
    vt = jnp.swapaxes(v, 0, 1)  # [w, h]
    vi = jnp.stack([vt, vt, vt], axis=1).reshape(wc, h)
    _store_lane_interleaved(o_ref, vi)


def _pack_factors(n: int, h: int, w: int) -> tuple[int, int]:
    """(lane_pack, sublane_pack) for the packed gray1 kernel.

    Probe-driven (tools/probe_lane_tiles.py + probe_packed_gray1.py on
    v5e, rounds 4-5): a full-slab VPU pass at 224 lanes (1.75 tiles)
    costs 6.20 us/Mpix vs 2.40 at 896 lanes (7 exact tiles) — tiny
    per-image slabs are per-op-overhead bound, and packing amortizes
    every full-slab op across P images. End-to-end at 32x32 the packed
    kernel measured 0.81 (unpacked) -> 4.8-5.0 Gpix/s (round-4 geometry,
    bench.py gpix_32_cifar at batch 4096 with >=2x-RPC-floor windows; an
    earlier 227 Gpix/s reading at batch 256 x k=24 was a sub-floor scan-
    window artifact and was purged). At 224x224 and up packing is a WASH
    or a loss end-to-end, so it is scoped to h < 128:

    - 224 (batch 128, stable ~60 ms windows, tools/probe_packed_224.py
      round 4): packed per-run 12.09 vs unpacked 12.13 Gpix/s. The stage
      bisect (tools/probe_224_bisect.py) predicted a packed win (shears
      2.53 -> 0.60 us/image), but pass 2's per-run rolls multiply by P_l
      and the pack/unpack concats eat the rest.
    - 512: packed (2,1) 12.46 / (4,1) 12.72 vs unpacked ~14 (probe
      round 4) — the alignment win doesn't exist (512 is already exact
      tiles) and the concats only cost.

    Round 5 replaced the per-image 128-lane compartments (csz was
    round_up(w+px+2, 128) = 128 at w=32 — 3.2x lane waste) with SUB-128
    strides csz = round_up(w+px+2, 128//packl): the slab total stays an
    exact 128-multiple while each image occupies only its content +
    shear margin. Pack factors must divide 128 for that rounding. Deeper
    packs also amortize per-grid-step overhead; the chooser takes the
    densest candidate that divides the batch.
    """
    if h >= 128:
        return 1, 1
    for pl, ps in ((16, 16), (16, 8), (8, 8), (8, 4), (4, 4), (4, 2), (2, 2), (2, 1)):
        if ps * h <= 1024 and n % (pl * ps) == 0:
            return pl, ps
    return 1, 1


def _mega_gray1_packed_kernel(
    x_ref,
    f1_ref,   # [P_s*h, 128] f32 pass-1/3 lerp fracs (tiled per sub-image)
    f2p_ref,  # [P_l*csz, 128] f32 pass-2 PIXEL fracs (csz-padded, tiled)
    o_ref,    # [P_s*h, P_l*csz] u8 PACKED luma slab (XLA unpacks/replicates)
    *,
    h: int,
    wc: int,
    c: int,
    packl: int,  # images packed along lanes
    packs: int,  # images packed along sublanes
    csz: int,   # x-compartment lane stride (>= w + px + 2; P_l*csz 128-mult)
    csz_y: int, # y-compartment lane stride (>= h + py + 2; P_s*csz_y 128-mult)
    taps: tuple[float, ...],
    runs1: tuple[tuple[int, int, int], ...],  # tiled per js (stride h)
    runs2: tuple[tuple[int, int, int], ...],  # tiled per jl (stride csz,
                                              # last run extended to csz)
    fill: int,
    front: str = "u8packed",  # "u8packed" | "i32perimg" — see below
):
    """Multi-image-packed variant of _mega_gray1_kernel: P = packl*packs images
    share ONE slab per stage — image jl occupies lanes [jl*csz, jl*csz+w)
    (x direction) and image js rows [js*h, (js+1)*h) (y direction), with
    per-compartment fill margins. The TOTAL slab lane width is an exact
    128-multiple (killing the misaligned-lane penalty at 224/32-class
    shapes) while each compartment is only content + margin wide —
    round 5 shrank csz from round_up(w+px+2, 128) (= 128 lanes per
    32-pixel image, 3.2x waste, the round-4 CIFAR-32 cap) to
    round_up(w+px+2, 128//packl) (= 40 at w=32, packl=16). Each VPU op
    covers P images (per-op overhead amortized). The kernel emits the
    PACKED quantized luma slab; per-image unpacking + channel replication
    happen in XLA (per-image in-kernel stores would need 128-aligned lane
    offsets, which sub-128 strides cannot give; the u8 unpack moves 1/12
    of the f32 slab bytes and also deletes the two in-kernel channel-
    replication transposes the round-4 kernel paid).

    Bit-exact per image vs _mega_gray1_kernel / the stream oracle: the
    compartment-cyclic roll wrap reproduces the single-image pad semantics
    — a negative-shift wrap lands in the PREVIOUS compartment's fill
    margin, and that margin's lerp partner is THIS compartment's first
    content lane, which is exactly the oracle's lerp(fill, v[0], f) left
    edge. Margin widths (>= px+2 / py+2 by construction of csz/csz_y)
    guarantee shear reads never touch the one wrap-lerp-polluted lane at
    each compartment boundary (same +2 slack the single-image slabs rely
    on), and the per-pass margin scrubs restore fill between shears.
    """
    fillf = float(fill)
    w = wc // c
    p = (len(taps) - 1) // 2

    def tap_sum_x(lum_img):
        # per-image X blur, reflect-101 pads (sublane slices)
        if not p:
            return lum_img
        rows = lum_img.shape[0]
        xpad = jnp.concatenate(
            [lum_img[i : i + 1] for i in range(p, 0, -1)]
            + [lum_img]
            + [lum_img[rows - 2 - i : rows - 1 - i] for i in range(p)],
            axis=0,
        )
        acc = taps[p] * xpad[p : p + rows]
        for t in range(p):
            acc = acc + taps[t] * (
                xpad[t : t + rows] + xpad[2 * p - t : 2 * p - t + rows]
            )
        return acc

    if front == "i32perimg":
        # Per-image i32 front, packed only from the shear slab on: the 224
        # bisect (tools/probe_224_bisect.py) measured the per-image
        # cast->transpose->split->luma->X-blur front at 0.40 us/image vs
        # 2.9-3.2 for the u8-packed-transpose front — Mosaic's 32-bit
        # transpose is fast even at misaligned lanes, while the u8
        # transpose+split is emulated expensively. Packing still wins the
        # shear half 4.2x (rolls ARE misalignment/overhead-bound), so pack
        # at the bxw concat, one transpose materializes the packed slab.
        assert packs == 1, "i32perimg front is the h >= 128 path"
        parts = []
        for jl in range(packl):
            xi = jnp.swapaxes(x_ref[jl].astype(jnp.int32), 0, 1)  # [wc, h]
            xr = xi.reshape(w, c, h)
            lum_i = (xr[:, 1, :] * 38470 + xr[:, 0, :] * 19595) + xr[:, 2, :] * 7471
            lum = lum_i.astype(jnp.float32) * jnp.float32(1.0 / 65536.0)
            parts.append(tap_sum_x(lum))  # [w, h]
            parts.append(jnp.full((csz - w, h), fillf))
        bxw = jnp.concatenate(parts, axis=0)  # [packl*csz, h]
        ta = jnp.swapaxes(bxw, 0, 1)  # [h, packl*csz]
        hp0 = h
    else:
        # ---- pack input (lanes per jl, rows per js), ONE u8 transpose ----
        rows_u8 = []
        for js in range(packs):
            if packl > 1:
                rows_u8.append(
                    jnp.concatenate(
                        [x_ref[js * packl + jl] for jl in range(packl)], axis=1
                    )
                )
            else:
                rows_u8.append(x_ref[js])
        xu = jnp.concatenate(rows_u8, axis=0) if packs > 1 else rows_u8[0]
        hp0 = _round_up(packs * h, 128)
        if hp0 != packs * h:
            xu = jnp.concatenate(
                [xu, jnp.zeros((hp0 - packs * h, packl * wc), jnp.uint8)], axis=0
            )
        xt = jnp.swapaxes(xu, 0, 1)  # [packl*wc, hp0] u8 (1/4-cost relayout)
        xr = xt.reshape(packl * w, c, hp0)  # lanes hp0 128-mult BY CONSTRUCTION
        r_i = xr[:, 0, :].astype(jnp.int32)
        g_i = xr[:, 1, :].astype(jnp.int32)
        b_i = xr[:, 2, :].astype(jnp.int32)
        lum_i = (g_i * 38470 + r_i * 19595) + b_i * 7471
        lum = lum_i.astype(jnp.float32) * jnp.float32(1.0 / 65536.0)  # [packl*w, hp0]

        # ---- X blur (sublane taps, per-jl reflect pads, stride trick) ----
        if p:
            stride = w + 2 * p
            pieces = []
            for jl in range(packl):
                b0 = jl * w
                pieces += [lum[b0 + i : b0 + i + 1] for i in range(p, 0, -1)]
                pieces.append(lum[b0 : b0 + w])
                pieces += [lum[b0 + w - 2 - i : b0 + w - 1 - i] for i in range(p)]
            xpadh = jnp.concatenate(pieces, axis=0)  # [packl*stride, hp0]
            ln = packl * stride - 2 * p

            def at(t):
                return xpadh[t : t + ln]

            acc = taps[p] * at(p)
            for t in range(p):
                acc = acc + taps[t] * (at(t) + at(2 * p - t))
            src, sstride = acc, stride  # content rows at jl*stride + [0, w)
        else:
            src, sstride = lum, w

        # ---- layout A (rows=(js,y), lanes=(jl,x)), fresh x-margins -------
        parts = []
        for jl in range(packl):
            parts.append(src[jl * sstride : jl * sstride + w])
            parts.append(jnp.full((csz - w, hp0), fillf))
        bxw = jnp.concatenate(parts, axis=0)  # [packl*csz, hp0]
        ta = jnp.swapaxes(bxw, 0, 1)  # [hp0, packl*csz]
        if hp0 != packs * h:
            ta = ta[: packs * h]

    # ---- Y blur (sublane taps, per-js reflect pads) ------------------------
    if p:
        pieces = []
        for js in range(packs):
            b0 = js * h
            pieces += [ta[b0 + i : b0 + i + 1] for i in range(p, 0, -1)]
            pieces.append(ta[b0 : b0 + h])
            pieces += [ta[b0 + h - 2 - i : b0 + h - 1 - i] for i in range(p)]
        xpadv = jnp.concatenate(pieces, axis=0)
        stride2 = h + 2 * p
        ln2 = packs * stride2 - 2 * p

        def at2(t):
            return xpadv[t : t + ln2]

        accv = taps[p] * at2(p)
        for t in range(p):
            accv = accv + taps[t] * (at2(t) + at2(2 * p - t))
        if packs > 1:
            bv = jnp.concatenate(
                [accv[js * stride2 : js * stride2 + h] for js in range(packs)],
                axis=0,
            )
        else:
            bv = accv  # ln2 == h when packs == 1
    else:
        bv = ta
    if fillf != 0.0:
        # blurred margins hold fill*sum(taps) != exactly fill; restore (the
        # fill == 0 fast path blurs margins to exactly 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, packl * csz), 1)
        bv = jnp.where(lane % csz < w, bv, fillf)

    # ---- 3 shears on the packed luma plane --------------------------------
    f1c = f1_ref[:, :1]
    f2c = f2p_ref[:, :1]
    s1 = _shear_pass(bv, runs1, f1c, 1, quantize=False)  # [packs*h, packl*csz]
    if packs > 1 or csz_y != h:
        sparts = []
        for js in range(packs):
            sparts.append(s1[js * h : (js + 1) * h])
            if csz_y - h:
                sparts.append(jnp.full((csz_y - h, packl * csz), fillf))
        s1w = jnp.concatenate(sparts, axis=0)  # [packs*csz_y, packl*csz]
    else:
        s1w = s1
    s2 = _shear_pass(
        jnp.swapaxes(s1w, 0, 1), runs2, f2c, 1, quantize=False
    )  # [packl*csz, packs*csz_y]
    tb = jnp.swapaxes(s2, 0, 1)  # [packs*csz_y, packl*csz]
    if packs > 1:
        tb = jnp.concatenate(
            [tb[js * csz_y : js * csz_y + h] for js in range(packs)], axis=0
        )
    elif csz_y != h:
        tb = tb[:h]
    # passes 1-2 rolled content into the x-margins; scrub back to fill so
    # pass 3's compartment wraps read fill again (the single-image kernel
    # does this by re-concatenating fresh margins each pass)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, packl * csz), 1)
    s3in = jnp.where(lane % csz < w, tb, fillf)
    s3 = _shear_pass(s3in, runs1, f1c, 1, quantize=False)

    # ---- single final quantization, one packed u8 store ---------------------
    # (values are >= 0: content/fill >= 0 and every lerp is convex)
    o_ref[0] = (s3 + 0.5).astype(jnp.int32).astype(jnp.uint8)


def _route_rows(v, amt, unit, nbits):
    """out[r, l] = v[r, l + (amt_r)*unit] (cyclic) where ``amt`` [rows, 1]
    is a NON-NEGATIVE per-row lane shift (< 2**nbits), constant along
    lanes: log2 rolls + per-row selects (rotate_gather's routing recipe —
    masks broadcast along the routed axis, so they never compound)."""
    for bit in range(nbits):
        rolled = _roll_left(v, (1 << bit) * unit)
        v = jnp.where(((amt >> bit) & 1) == 1, rolled, v)
    return v


def _shear_pass_traced(v, kcol, f_col, lane_unit, bias, nbits, quantize):
    """Per-image traced-shift shear: same lerp as _shear_pass, but the
    integer row shifts ``kcol`` [rows, 1] (i32, may be negative) are
    runtime values — applied with a static -bias pre-roll + log routing
    instead of static per-run rolls. Costs ~nbits extra roll+select pairs
    per pass vs the static kernel."""
    nbr = _roll_left(v, lane_unit)
    ler = v + f_col * (nbr - v)
    ler = _roll_left(ler, -bias * lane_unit)
    out = _route_rows(ler, kcol + bias, lane_unit, nbits)
    return _quant_trunc(out) if quantize else out


def _shear_pass_traced_grouped(
    v, res_col, f_col, c_ref, ci, gh, lane_unit, bias_r, nbits_r, quantize
):
    """Grouped traced shear: Mosaic's tpu.dynamic_rotate (pltpu.roll with a
    RUNTIME shift) costs ~1-2 VPU passes, not log2(range) — measured in
    tools/probe_dynamic_rotate.py. So instead of log-routing the full
    per-row shift range (log2(2*budget) roll+select pairs), rows are cut
    into static groups of ``gh``: each group gets ONE dynamic roll by its
    per-image group-center shift (all groups together touch the slab once),
    and only the small within-group residual (<= slope*gh/2 + 2) is
    log-routed — nbits_r ~ log2(slope*gh) levels instead of
    log2(2*slope*rows/2).

    res_col: [rows, 1] i32 residual shifts (kcol - coarse per group).
    c_ref / ci: VMEM ref holding per-group RIGHT-roll lane amounts
    (precomputed in the wrapper as (lane_size - coarse*lane_unit) mod
    lane_size, so they are non-negative) and its leading index.
    """
    nbr = _roll_left(v, lane_unit)
    ler = v + f_col * (nbr - v)
    rows = ler.shape[0]
    parts = []
    for gi, g0 in enumerate(range(0, rows, gh)):
        g1 = min(g0 + gh, rows)
        parts.append(pltpu.roll(ler[g0:g1, :], c_ref[ci, gi, 0], axis=1))
    ler = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    # the static -bias_r pre-roll is FOLDED into the per-group roll amounts
    # by every caller (cr = (L - (coarse - bias_r)*unit) % L), saving one
    # full slab pass per shear; the residual route still adds bias_r so its
    # shifts stay non-negative
    out = _route_rows(ler, res_col + bias_r, lane_unit, nbits_r)
    return _quant_trunc(out) if quantize else out


#: row-group height for the grouped traced shears (see
#: _shear_pass_traced_grouped). 0 = AUTO: the largest group whose
#: one-sided residual still fits a 1-bit route (_auto_group_rows) —
#: 6/3 at the 22.5-degree budget. Set >0 to pin a height (A/B probes);
#: set <0 to disable grouping entirely (pure log routing).
#: Round-5 change: the coarse shift is the per-group MINIMUM (one-sided
#: residual in [0, range], range = floor(slope*(gh-1))+1) instead of the
#: group-center value (symmetric +-(floor(slope*gh/2)+1)); paying the
#: floor-slack +1 once instead of twice doubles the group height at the
#: same route depth — half the dynamic-roll slices per shear, which the
#: round-4 gh probe showed is the dominant cost (gh=8 beat gh=4 purely
#: on slice count). Real-chip A/B: tools/probe_traced_gh.py.
_TRACED_GROUP_ROWS = 0
_TRACED_GROUP_ROWS2 = 0


def _auto_group_rows(slope_max: float, target_range: int = 1) -> int:
    """Largest group height whose one-sided residual range
    floor(slope*(gh-1))+1 stays <= target_range (1 -> a 1-BIT route, the
    measured optimum: at the 22.5-deg budget this gives gh=(6,3) = 10.3-10.5
    Gpix/s vs 9.8 for the 2-bit (16,8) and the round-4 centered (8,4) in
    same-process A/Bs — two saved route passes per shear beat the extra
    group-roll slices; tools/probe_traced_gh.py round 5)."""
    if slope_max <= 0:
        return 0
    return 1 + int((target_range - 2e-4) // slope_max)


def _grouped_params(rows: int, slope_max: float, gh: int, nbits_full: int):
    """Static residual budget for one-sided grouped routing, or None when
    grouping cannot beat the full log route (tiny slabs / tiny budgets).

    The coarse shift is the per-group MINIMUM of k = floor(sx), so the
    residual is one-sided: 0 <= k_y - min_g k <= max_g k - min_g k <=
    floor(max|sx_y - sx_y'|) + 1 (the floor-difference bound) <=
    floor(smax*(gh-1) + 2*eps) + 1, where eps bounds the f32 rounding of
    each product sx = fl(a*ys) (|a*ys| <= 51.2 at the 22.5-deg budget for
    h <= 512 -> eps <= 3.1e-6; the 1e-4 epsilon below covers h into the
    tens of thousands). One-sided pays the +1 floor slack ONCE (the
    centered formulation paid it on both sides), so the same 2-bit route
    supports ~2x the group height: gh 16/8 instead of 8/4 at 22.5 deg —
    half the dynamic-roll slices (VERDICT r4 item 1)."""
    if gh <= 0 or rows <= gh:
        return None
    rng_k = int(math.floor(slope_max * (gh - 1) + 1e-4)) + 1
    nbits_r = max(int(math.ceil(math.log2(rng_k + 1))), 1)
    if nbits_r >= nbits_full:
        return None
    gidx = np.repeat(
        np.arange((rows + gh - 1) // gh, dtype=np.int32),
        [min(gh, rows - g0) for g0 in range(0, rows, gh)],
    )
    return rng_k, nbits_r, gidx


def _group_min(k: jnp.ndarray, gh: int) -> jnp.ndarray:
    """Per-group minimum of [n, rows] i32 shifts over static contiguous
    groups of ``gh`` rows (ragged tail padded with the last column, which
    never lowers a min below its group's true value)."""
    n, rows = k.shape
    g = (rows + gh - 1) // gh
    pad = g * gh - rows
    if pad:
        k = jnp.concatenate([k, jnp.broadcast_to(k[:, -1:], (n, pad))], axis=1)
    return k.reshape(n, g, gh).min(axis=2)


def _mega_traced_gray1_kernel(
    x_ref,
    k1_ref,   # [1, h, 128] i32 pass-1/3 integer shifts (RESIDUALS when grp)
    f1_ref,   # [1, h, 128] f32 pass-1/3 fracs
    k2p_ref,  # [1, w, 128] i32 pass-2 PIXEL shifts (RESIDUALS when grp)
    f2p_ref,  # [1, w, 128] f32 pass-2 PIXEL fracs
    *rest,    # [c1_ref [1,G1,128], c2_ref [1,G2,128] when grp], o_ref
    h: int,
    wc: int,
    c: int,
    lsx: int,
    ls2: int,
    taps: tuple[float, ...],
    bias1: int,
    nbits1: int,
    bias2: int,
    nbits2: int,
    fill: int,
    grp: tuple[int, int, int, int, int, int] | None = None,
):
    """Traced-angle variant of _mega_gray1_kernel: exact integer luma ->
    stream blur -> 3 log-routed shears, all on the single luma plane.
    Identical structure; shifts/fracs are per-image inputs.

    With ``grp`` = (gh1, gh2, bias_r1, nbits_r1, bias_r2, nbits_r2) the
    shears use grouped routing (_shear_pass_traced_grouped): k1/k2p inputs
    hold the within-group RESIDUAL shifts and c1/c2 the per-group dynamic
    right-roll amounts — cuts the dominant roll+select levels ~2x. The
    group height is PER PASS: pass 2's slope (sin theta) is ~2x pass 1's
    (tan theta/2), so it needs a smaller group for the same route depth."""
    if grp is None:
        (o_ref,) = rest
    else:
        c1_ref, c2_ref, o_ref = rest
        gh1, gh2, bias_r1, nbits_r1, bias_r2, nbits_r2 = grp
    fillf = float(fill)
    w = wc // c
    bv = _luma_blur_front(x_ref, h, wc, c, lsx, taps, fillf)  # [h, lsx]

    k1c = k1_ref[0, :, :1]
    f1c = f1_ref[0, :, :1]
    k2c = k2p_ref[0, :, :1]
    f2c = f2p_ref[0, :, :1]

    if grp is None:
        sp1 = lambda v: _shear_pass_traced(v, k1c, f1c, 1, bias1, nbits1, False)
        sp2 = lambda v: _shear_pass_traced(v, k2c, f2c, 1, bias2, nbits2, False)
    else:
        sp1 = lambda v: _shear_pass_traced_grouped(
            v, k1c, f1c, c1_ref, 0, gh1, 1, bias_r1, nbits_r1, False
        )
        sp2 = lambda v: _shear_pass_traced_grouped(
            v, k2c, f2c, c2_ref, 0, gh2, 1, bias_r2, nbits_r2, False
        )

    s1 = sp1(bv)
    s1w = jnp.concatenate([s1[:, :w], jnp.full((ls2 - h, w), fillf)], axis=0)
    s2 = sp2(jnp.swapaxes(s1w, 0, 1))
    s2w = jnp.concatenate([s2[:, :h], jnp.full((lsx - w, h), fillf)], axis=0)
    s3 = sp1(jnp.swapaxes(s2w, 0, 1))
    v = (s3[:, :w] + 0.5).astype(jnp.int32)
    vt = jnp.swapaxes(v, 0, 1)
    vi = jnp.stack([vt, vt, vt], axis=1).reshape(wc, h)
    _store_lane_interleaved(o_ref, vi)


def _mega_traced_kernel(
    x_ref,
    k1_ref,  # [1, h, 128] i32 pass-1/3 integer shifts (lane col 0)
    f1_ref,  # [1, h, 128] f32 pass-1/3 lerp fracs
    k2_ref,  # [1, wc, 128] i32 pass-2 shifts (per-pixel-row, c-replicated)
    f2_ref,  # [1, wc, 128] f32 pass-2 fracs
    id_ref,  # [1, h, 128] i32 per-image flag: 1 iff angle == 0
    g_ref,  # [3, wc] f32 grayscale constants (see _grayscale_rows)
    *rest,   # [c1_ref [1,G1,128], c2_ref [1,G2,128] when grp], o_ref
    h: int,
    wc: int,
    c: int,
    ls1: int,
    ls2: int,
    taps: tuple[float, ...],
    bias1: int,
    nbits1: int,
    bias2: int,
    nbits2: int,
    fill: int,
    grayscale_out: bool,
    stream: bool,
    grp: tuple[int, int, int, int, int, int] | None = None,
):
    """Traced-per-image-angle variant of _mega_kernel: identical blur /
    margin / transpose structure, shear shifts from per-image inputs.
    With ``grp`` the shears use grouped routing (see
    _shear_pass_traced_grouped); k1/k2 inputs then hold RESIDUAL shifts."""
    if grp is None:
        (o_ref,) = rest
    else:
        c1_ref, c2_ref, o_ref = rest
    fillf = float(fill)
    w = wc // c

    p = (len(taps) - 1) // 2
    if p:
        # pad in uint8 (1/4 the concat bytes), ONE cast of the padded slab
        xu = x_ref[0]
        xpadv = jnp.concatenate(
            [xu[i : i + 1, :] for i in range(p, 0, -1)]
            + [xu]
            + [xu[h - 2 - i : h - 1 - i, :] for i in range(p)],
            axis=0,
        ).astype(jnp.int32).astype(jnp.float32)

        def tap_sum(src, unit):
            def at(t):
                return src[t * unit : t * unit + (h if unit == 1 else wc), :]

            acc = taps[p] * at(p)
            for t in range(p):
                acc = acc + taps[t] * (at(t) + at(2 * p - t))
            return acc

        accv = tap_sum(xpadv, 1)
        acct = jnp.swapaxes(accv, 0, 1)
        acctp = jnp.concatenate(
            [acct[c * i : c * i + c, :] for i in range(p, 0, -1)]
            + [acct]
            + [acct[c * (w - 2 - i) : c * (w - 2 - i) + c, :] for i in range(p)],
            axis=0,
        )
        acch = tap_sum(acctp, c)  # [wc, h]
        maybe_rint = (lambda x: x) if stream else jnp.rint
        accw = jnp.concatenate([acch, jnp.full((ls1 - wc, h), fillf)], axis=0)
        content = maybe_rint(jnp.swapaxes(accw, 0, 1))  # [h, ls1]
    else:
        content = jnp.concatenate(
            [
                x_ref[0].astype(jnp.int32).astype(jnp.float32),
                jnp.full((h, ls1 - wc), fillf),
            ],
            axis=1,
        )

    k1c = k1_ref[0, :, :1]
    f1c = f1_ref[0, :, :1]
    k2c = k2_ref[0, :, :1]
    f2c = f2_ref[0, :, :1]

    if grp is None:
        sp1 = lambda v: _shear_pass_traced(
            v, k1c, f1c, c, bias1, nbits1, not stream
        )
        sp2 = lambda v: _shear_pass_traced(
            v, k2c, f2c, 1, bias2, nbits2, not stream
        )
    else:
        gh1, gh2, bias_r1, nbits_r1, bias_r2, nbits_r2 = grp
        # pass 2 rows are channel-interleaved (c rows per pixel): group at
        # PIXEL granularity -> gh2*c interleaved rows per group
        sp1 = lambda v: _shear_pass_traced_grouped(
            v, k1c, f1c, c1_ref, 0, gh1, c, bias_r1, nbits_r1, not stream
        )
        sp2 = lambda v: _shear_pass_traced_grouped(
            v, k2c, f2c, c2_ref, 0, gh2 * c, 1, bias_r2, nbits_r2, not stream
        )

    s1 = sp1(content)
    s1w = jnp.concatenate([s1[:, :wc], jnp.full((ls2 - h, wc), fillf)], axis=0)
    s2 = sp2(jnp.swapaxes(s1w, 0, 1))
    s2w = jnp.concatenate([s2[:, :h], jnp.full((ls1 - wc, h), fillf)], axis=0)
    s3 = sp1(jnp.swapaxes(s2w, 0, 1))
    out = s3[:, :wc]
    if grayscale_out:
        out = _grayscale_rows(out, g_ref[0:1, :], g_ref[1:2, :], g_ref[2:3, :])
    elif stream:
        # single final quantization, PER-IMAGE semantics matching the
        # static kernel / oracle fused_stream_chain: an angle-0 image in
        # the batch streams blur-only and quantizes with rint
        # (fast_warp.py:160); sheared images trunc (:158). The shears are
        # exact identities at angle 0 (v + 0*(nbr - v) == v in f32), so
        # selecting the rounding mode here is all that's needed. The flag
        # rides as an [h, 1] column: lanes-only broadcast (Mosaic rejects
        # a [1, 1] source — "broadcast in both sublanes and lanes").
        ident = id_ref[0][:, :1] != 0  # [h, 1], broadcasts over lanes
        out = jnp.where(ident, jnp.rint(out), jnp.trunc(out))
    o_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)


def fused_blur_rotate_batched(
    img: jnp.ndarray,
    radius: float,
    angles_deg: jnp.ndarray,
    fill: int = 0,
    grayscale_out: bool = False,
    stream: bool = False,
    max_angle_deg: float = 22.5,
) -> jnp.ndarray:
    """Fused blur -> 3-shear rotation (-> grayscale) with PER-IMAGE TRACED
    angles: ONE executable for any angle vector with |angle| <=
    max_angle_deg (static routing budget; the reference's grids sweep
    +-22.5, transformation.py:97). One u8 HBM read + one write per image,
    whole chain VMEM-resident — replaces the blur + rotate_3shear_batched
    two-kernel path (each pass of which round-trips HBM).

    Semantics match fused_blur_rotate_image, including the stream=False
    default (per-op reference-parity quantization); pass stream=True for
    the f32-streaming fast-chain contract. Costs ~2x the static-angle
    kernel (log-routed shifts: ~log2(shift range) roll+select pairs per
    shear instead of static run rolls).

    Concrete angle vectors beyond the budget raise ValueError; tracer
    angles (uninspectable) are CLAMPED to +-max_angle_deg — a shift
    beyond the static routing budget would otherwise silently emit
    unmatched-select garbage (the rotate_gather failure mode ADVICE r2
    flagged).
    """
    # this wrapper is NOT jitted so the budget check sees concrete values
    # (the jitted body below would only ever see tracers); tracer angles
    # from an enclosing jit skip the check and rely on the clamp
    if not isinstance(angles_deg, jax.core.Tracer):
        amax = float(np.abs(np.asarray(angles_deg)).max())
        if amax > float(max_angle_deg) + 1e-6:
            raise ValueError(
                f"fused_blur_rotate_batched: max |angle| {amax} exceeds the "
                f"static routing budget max_angle_deg={max_angle_deg}; raise "
                f"the budget or use the exact warp"
            )
    return _fused_blur_rotate_batched_jit(
        img, radius, jnp.asarray(angles_deg, jnp.float32), fill=fill,
        grayscale_out=grayscale_out, stream=stream, max_angle_deg=max_angle_deg,
    )


@functools.partial(
    jax.jit,
    static_argnames=("radius", "fill", "grayscale_out", "stream", "max_angle_deg"),
)
def _fused_blur_rotate_batched_jit(
    img: jnp.ndarray,
    radius: float,
    angles_deg: jnp.ndarray,
    fill: int,
    grayscale_out: bool,
    stream: bool,
    max_angle_deg: float,
) -> jnp.ndarray:
    n, h, w, c = img.shape
    wc = w * c
    ang = jnp.clip(
        jnp.asarray(angles_deg, jnp.float32), -max_angle_deg, max_angle_deg
    )
    t = jnp.deg2rad(-ang).reshape(-1)
    t = jnp.broadcast_to(t, (n,))
    a = -jnp.tan(t / 2.0)
    b = jnp.sin(t)
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - h / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 - w / 2.0
    sx = a[:, None] * ys[None, :]  # [N, H]
    sy = b[:, None] * xs[None, :]  # [N, W]
    k1 = jnp.floor(sx)
    f1 = sx - k1
    k2px = jnp.floor(sy)
    f2 = jnp.repeat(sy - k2px, c, axis=1)
    k2 = jnp.repeat(k2px.astype(jnp.int32), c, axis=1)

    tm = math.radians(max_angle_deg)
    px = int(math.ceil(math.tan(tm / 2.0) * (h / 2.0 + 0.5))) + 2
    py = int(math.ceil(math.sin(tm) * (w / 2.0 + 0.5))) + 2
    ls1 = _round_up(wc + (px + 2) * c, 128)
    ls2 = _round_up(h + py + 2, 128)
    bias1, bias2 = px, py
    nbits1 = max(int(math.ceil(math.log2(2 * px + 1))), 1)
    nbits2 = max(int(math.ceil(math.log2(2 * py + 1))), 1)

    if radius > 0:
        ksize = cv2_gaussian_ksize(float(radius))
        taps = tuple(float(v) for v in gaussian_taps(ksize, float(radius)))
        p = ksize // 2
        if h < p + 2 or w < p + 2:
            from imagetransformations_tpu.ops.stencil import gaussian_blur

            return fused_blur_rotate_batched(
                gaussian_blur(img, float(radius)), 0.0, angles_deg,
                fill=fill, grayscale_out=grayscale_out, stream=stream,
                max_angle_deg=max_angle_deg,
            )
    else:
        taps = (1.0,)

    if stream and grayscale_out and c == 3:
        # single-luma-channel back half (see _mega_gray1_kernel): the three
        # log-routed shears and their transposes run on 1/3 the data
        lsx = _round_up(w + px + 2, 128)
        slope1, slope2 = math.tan(tm / 2.0), math.sin(tm)
        gh1 = _auto_group_rows(slope1) if _TRACED_GROUP_ROWS == 0 else max(_TRACED_GROUP_ROWS, 0)
        gh2 = _auto_group_rows(slope2) if _TRACED_GROUP_ROWS2 == 0 else max(_TRACED_GROUP_ROWS2, 0)
        g1p = _grouped_params(h, slope1, gh1, nbits1)
        g2p = _grouped_params(w, slope2, gh2, nbits2)
        k1i = k1.astype(jnp.int32)   # [n, h]
        k2i = k2px.astype(jnp.int32)  # [n, w]
        extra_specs, extra_args = [], []
        if g1p is not None and g2p is not None:
            _, nbits_r1, gidx1 = g1p
            _, nbits_r2, gidx2 = g2p
            c1v = _group_min(k1i, gh1)                # [n, G1] coarse shifts
            c2v = _group_min(k2i, gh2)                # [n, G2]
            r1 = k1i - c1v[:, gidx1]                  # one-sided residuals
            r2 = k2i - c2v[:, gidx2]
            # per-group dynamic RIGHT-roll amounts (roll_left by coarse);
            # one-sided residuals need no bias pre-roll (bias_r = 0)
            cr1 = (lsx - c1v) % lsx
            cr2 = (ls2 - c2v) % ls2
            grp = (gh1, gh2, 0, nbits_r1, 0, nbits_r2)
            k1_in, k2_in = r1, r2
            ng1, ng2 = c1v.shape[1], c2v.shape[1]
            extra_specs = [
                pl.BlockSpec((1, ng1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ng2, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            extra_args = [
                jnp.broadcast_to(cr1[:, :, None], (n, ng1, 128)),
                jnp.broadcast_to(cr2[:, :, None], (n, ng2, 128)),
            ]
        else:
            grp = None
            k1_in, k2_in = k1i, k2i
        out = pl.pallas_call(
            functools.partial(
                _mega_traced_gray1_kernel,
                h=h, wc=wc, c=c, lsx=lsx, ls2=ls2, taps=taps,
                bias1=bias1, nbits1=nbits1, bias2=bias2, nbits2=nbits2,
                fill=fill, grp=grp,
            ),
            out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ] + extra_specs,
            out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(
            img.reshape(n, h, wc),
            jnp.broadcast_to(k1_in[:, :, None], (n, h, 128)),
            jnp.broadcast_to(f1[:, :, None], (n, h, 128)),
            jnp.broadcast_to(k2_in[:, :, None], (n, w, 128)),
            jnp.broadcast_to((sy - k2px)[:, :, None], (n, w, 128)),
            *extra_args,
        )
        return out.reshape(n, h, w, c)

    gv = _gray_constants(wc)

    slope1, slope2 = math.tan(tm / 2.0), math.sin(tm)
    gh1 = _auto_group_rows(slope1) if _TRACED_GROUP_ROWS == 0 else max(_TRACED_GROUP_ROWS, 0)
    gh2 = _auto_group_rows(slope2) if _TRACED_GROUP_ROWS2 == 0 else max(_TRACED_GROUP_ROWS2, 0)
    g1p = _grouped_params(h, slope1, gh1, nbits1)
    g2p = _grouped_params(w, slope2, gh2, nbits2)
    k1i = k1.astype(jnp.int32)    # [n, h]
    k2pxi = k2px.astype(jnp.int32)  # [n, w] pixel shifts
    extra_specs, extra_args = [], []
    if g1p is not None and g2p is not None:
        _, nbits_r1, gidx1 = g1p
        _, nbits_r2, gidx2 = g2p
        c1v = _group_min(k1i, gh1)             # [n, G1] coarse pixel shifts
        c2v = _group_min(k2pxi, gh2)           # [n, G2]
        k1_in = k1i - c1v[:, gidx1]            # [n, h] one-sided residuals
        k2_in = jnp.repeat(k2pxi - c2v[:, gidx2], c, axis=1)  # [n, wc]
        # right-roll lanes (unit=c for pass 1); one-sided -> bias_r = 0
        cr1 = (ls1 - c1v * c) % ls1
        cr2 = (ls2 - c2v) % ls2
        grp = (gh1, gh2, 0, nbits_r1, 0, nbits_r2)
        ng1, ng2 = c1v.shape[1], c2v.shape[1]
        extra_specs = [
            pl.BlockSpec((1, ng1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ng2, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        extra_args = [
            jnp.broadcast_to(cr1[:, :, None], (n, ng1, 128)),
            jnp.broadcast_to(cr2[:, :, None], (n, ng2, 128)),
        ]
    else:
        grp = None
        k1_in, k2_in = k1i, k2

    k1b = jnp.broadcast_to(k1_in[:, :, None], (n, h, 128))
    f1b = jnp.broadcast_to(f1[:, :, None], (n, h, 128))
    k2b = jnp.broadcast_to(k2_in[:, :, None], (n, wc, 128))
    f2b = jnp.broadcast_to(f2[:, :, None], (n, wc, 128))
    idb = jnp.broadcast_to(
        (t == 0.0).astype(jnp.int32)[:, None, None], (n, h, 128)
    )
    out = pl.pallas_call(
        functools.partial(
            _mega_traced_kernel,
            h=h, wc=wc, c=c, ls1=ls1, ls2=ls2, taps=taps,
            bias1=bias1, nbits1=nbits1, bias2=bias2, nbits2=nbits2,
            fill=fill, grayscale_out=grayscale_out, stream=stream, grp=grp,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + extra_specs,
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(img.reshape(n, h, wc), k1b, f1b, k2b, f2b, idb, jnp.asarray(gv),
      *extra_args)
    return out.reshape(n, h, w, c)


@functools.partial(
    jax.jit, static_argnames=("radius", "angle_deg", "fill", "grayscale_out", "stream")
)
def fused_blur_rotate_image(
    img: jnp.ndarray,
    radius: float,
    angle_deg: float,
    fill: int = 0,
    grayscale_out: bool = False,
    stream: bool = False,
) -> jnp.ndarray:
    """Fused blur -> 3-shear rotation (-> grayscale), one image per grid step,
    whole chain VMEM-resident. NHWC uint8 -> NHWC uint8.

    ``stream=False``: per-op uint8 quantization — bit-identical to
    gaussian_blur -> oracle rotate_3shear (-> grayscale), the reference's
    image-at-a-time semantics. ``stream=True``: f32 streaming with ONE
    final quantization (the chain contract of build_chain_fn's fast mode)
    — higher quality (no intermediate rounding) and ~4 fewer VPU passes;
    bit-identical to oracle/fast_warp.fused_stream_chain.
    Works for any H, W (pads internally); |angle_deg| <= 45.
    """
    n, h, w, c = img.shape
    wc = w * c
    a, b = _paeth_params(float(angle_deg))
    sx = _row_shifts(h, a, h / 2.0)
    sy = _row_shifts(w, b, w / 2.0)
    k1 = np.floor(sx).astype(np.int64)
    f1 = (sx - np.floor(sx)).astype(np.float32)
    k2px = np.floor(sy).astype(np.int64)
    f2 = np.repeat((sy - np.floor(sy)).astype(np.float32), c)
    runs1 = tuple(_runs(k1))
    runs2 = tuple(_runs(np.repeat(k2px, c)))

    px = max(int(np.ceil(np.abs(sx).max())) + 1, 1)  # pass-1/3 shift bound, px
    py = max(int(np.ceil(np.abs(sy).max())) + 1, 1)  # pass-2 shift bound, px
    ls1 = _round_up(wc + (px + 2) * c, 128)
    ls2 = _round_up(h + py + 2, 128)

    if radius > 0:
        ksize = cv2_gaussian_ksize(float(radius))
        taps = tuple(float(t) for t in gaussian_taps(ksize, float(radius)))
        p = ksize // 2
        if h < p + 2 or w < p + 2:
            # reflect-101 slices need dim > p+1; tiny images blur in XLA
            from imagetransformations_tpu.ops.stencil import gaussian_blur

            # (tiny-image fallback blurs via the quantized XLA op, so the
            # blur stage is u8-quantized even in stream mode there)
            return fused_blur_rotate_image(
                gaussian_blur(img, float(radius)), 0.0, angle_deg,
                fill=fill, grayscale_out=grayscale_out, stream=stream,
            )
    else:
        taps, p = (1.0,), 0
    xp = img.reshape(n, h, wc)

    if stream and grayscale_out and c == 3 and (
        float(angle_deg) != 0.0 or radius > 0
    ):
        # angle == 0 still routes here: the k=0/f=0 shear passes are exact
        # identities (v + 0*(nbr-v) == v in f32), so blur+gray chains get
        # the single-luma-plane fast path too
        # grayscale commutes with the linear shears: extract luma after the
        # blur and run all three shear passes (and both inter-shear
        # transposes) on ONE channel — 1/3 the data for the whole back half
        runs2p = tuple(_runs(k2px))
        f2p = (sy - np.floor(sy)).astype(np.float32)
        lsx = _round_up(w + px + 2, 128)

        pkl, pks = _pack_factors(n, h, w)
        npack = pkl * pks
        if npack > 1 and n % npack == 0:
            # multi-image packed kernel: npack images share each slab with
            # per-compartment margins — compartments are content + margin
            # wide (csz = round_up(w+px+2, 128//packl)) and only the slab
            # TOTAL is an exact 128-multiple (see _mega_gray1_packed_kernel)
            csz = _round_up(w + px + 2, 128 // pkl)
            csz_y = _round_up(h + py + 2, 128 // pks)
            runs1_t = tuple(
                (js * h + r0, js * h + r1, k)
                for js in range(pks)
                for (r0, r1, k) in runs1
            )
            # extend each jl's last run over the x-margin junk rows (their
            # value is irrelevant; they are scrubbed back to fill pre-pass-3)
            r2ext = list(runs2p)
            r2ext[-1] = (r2ext[-1][0], csz, r2ext[-1][2])
            runs2_t = tuple(
                (jl * csz + r0, jl * csz + r1, k)
                for jl in range(pkl)
                for (r0, r1, k) in r2ext
            )
            f1_t = np.tile(f1, pks)  # [pks*h]
            f2_pad = np.zeros(csz, np.float32)
            f2_pad[:w] = f2p
            f2_t = np.tile(f2_pad, pkl)  # [pkl*csz]
            ng = n // npack
            out = pl.pallas_call(
                functools.partial(
                    _mega_gray1_packed_kernel,
                    h=h, wc=wc, c=c, packl=pkl, packs=pks, csz=csz, csz_y=csz_y,
                    taps=taps, runs1=runs1_t, runs2=runs2_t, fill=fill,
                    front="i32perimg" if pks == 1 and h >= 128 else "u8packed",
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (ng, pks * h, pkl * csz), jnp.uint8
                ),
                grid=(ng,),
                in_specs=[
                    pl.BlockSpec(
                        (npack, h, wc), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (pks * h, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (pkl * csz, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, pks * h, pkl * csz), lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                ),
                interpret=_interpret(),
            )(
                xp,
                jnp.broadcast_to(jnp.asarray(f1_t)[:, None], (pks * h, 128)),
                jnp.broadcast_to(jnp.asarray(f2_t)[:, None], (pkl * csz, 128)),
            )
            # XLA unpack: packed slab rows are (js, y), lanes (jl, x-in-csz);
            # margin lanes are sliced off BEFORE the transpose so the u8
            # relayout moves content bytes only, then channels replicate
            o = out.reshape(ng, pks, h, pkl, csz)[:, :, :, :, :w]
            o = o.transpose(0, 1, 3, 2, 4).reshape(n, h, w)
            return jnp.broadcast_to(o[:, :, :, None], (n, h, w, c))
        out = pl.pallas_call(
            functools.partial(
                _mega_gray1_kernel,
                h=h, wc=wc, c=c, lsx=lsx, ls2=ls2, taps=taps,
                runs1=runs1, runs2p=runs2p, fill=fill,
            ),
            out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((w, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(
            xp,
            jnp.broadcast_to(jnp.asarray(f1)[:, None], (h, 128)),
            jnp.broadcast_to(jnp.asarray(f2p)[:, None], (w, 128)),
        )
        return out.reshape(n, h, w, c)

    f1b = jnp.broadcast_to(jnp.asarray(f1)[:, None], (h, 128))
    f2b = jnp.broadcast_to(jnp.asarray(f2)[:, None], (wc, 128))
    gvb = jnp.asarray(_gray_constants(wc))
    out = pl.pallas_call(
        functools.partial(
            _mega_kernel,
            h=h, wc=wc, c=c, ls1=ls1, ls2=ls2,
            taps=taps, runs1=runs1, runs2=runs2,
            fill=fill, grayscale_out=grayscale_out,
            identity_rot=(float(angle_deg) == 0.0),
            stream=stream,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), jnp.uint8),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # the dataflow body keeps ~4 f32 slabs live; v5e has 128 MiB of
        # physical VMEM — raise the default 16 MiB scoped cap
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, f1b, f2b, gvb)
    return out.reshape(n, h, w, c)
