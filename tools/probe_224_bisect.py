"""Bisect the 224x224 gray1 kernel: where does packed lose to unpacked?

probe_packed_gray1/probe_packed_224 measured block-packed 9.2-9.9 Gpix/s
vs unpacked 11.0 at 224x224 even though every packed slab is lane-aligned
(the lane-tiles probe says misaligned passes cost 2.6x). This probe times
the pipeline STAGES in isolation, packed vs unpacked, each as its own
Pallas kernel at batch 128:

- front: u8 input -> luma -> separable blur -> store f32 luma slab
- shears: f32 luma slab -> 3 static shear passes -> store f32 slab
- output: f32 slab -> quantize -> channel-interleave -> u8 store

Run: python tools/probe_224_bisect.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import imagetransformations_tpu.ops.pallas.megakernel as mk
from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize, gaussian_taps
from imagetransformations_tpu.ops.pallas.shear import _paeth_params, _row_shifts
from imagetransformations_tpu.utils.profiling import op_throughput

H = W = 224
C = 3
WC = W * C
N = 128
PK = 4
ANGLE, RADIUS = 15.0, 1.5
LSX = 256  # unpacked single-luma lane width at 224 (= packed csz)
LS2 = 256


def _taps():
    ks = cv2_gaussian_ksize(RADIUS)
    return tuple(float(t) for t in gaussian_taps(ks, RADIUS))


def _shear_tables():
    a, b = _paeth_params(ANGLE)
    sx = _row_shifts(H, a, H / 2.0)
    sy = _row_shifts(W, b, W / 2.0)
    k1 = np.floor(sx).astype(np.int64)
    f1 = (sx - np.floor(sx)).astype(np.float32)
    k2 = np.floor(sy).astype(np.int64)
    f2 = (sy - np.floor(sy)).astype(np.float32)
    return tuple(mk._runs(k1)), f1, tuple(mk._runs(k2)), f2


# ---------------------------------------------------------------- fronts


def front_unpacked_kernel(x_ref, o_ref, *, taps):
    o_ref[0] = mk._luma_blur_front(x_ref, H, WC, C, LSX, taps, 0.0)


def front_packed_kernel(x_ref, o_ref, *, taps):
    p = (len(taps) - 1) // 2
    xu = jnp.concatenate([x_ref[j] for j in range(PK)], axis=1)
    hp0 = mk._round_up(H, 128)
    xu = jnp.concatenate(
        [xu, jnp.zeros((hp0 - H, PK * WC), jnp.uint8)], axis=0
    )
    xt = jnp.swapaxes(xu, 0, 1)
    xr = xt.reshape(PK * W, C, hp0)
    lum_i = (
        xr[:, 1, :].astype(jnp.int32) * 38470
        + xr[:, 0, :].astype(jnp.int32) * 19595
        + xr[:, 2, :].astype(jnp.int32) * 7471
    )
    lum = lum_i.astype(jnp.float32) * jnp.float32(1.0 / 65536.0)
    stride = W + 2 * p
    pieces = []
    for jl in range(PK):
        b0 = jl * W
        pieces += [lum[b0 + i : b0 + i + 1] for i in range(p, 0, -1)]
        pieces.append(lum[b0 : b0 + W])
        pieces += [lum[b0 + W - 2 - i : b0 + W - 1 - i] for i in range(p)]
    xpadh = jnp.concatenate(pieces, axis=0)
    ln = PK * stride - 2 * p
    acc = taps[p] * xpadh[p : p + ln]
    for t in range(p):
        acc = acc + taps[t] * (xpadh[t : t + ln] + xpadh[2 * p - t : 2 * p - t + ln])
    parts = []
    for jl in range(PK):
        parts.append(acc[jl * stride : jl * stride + W])
        parts.append(jnp.zeros((LSX - W, hp0), jnp.float32))
    bxw = jnp.concatenate(parts, axis=0)
    ta = jnp.swapaxes(bxw, 0, 1)[:H]
    xpadv = jnp.concatenate(
        [ta[i : i + 1, :] for i in range(p, 0, -1)]
        + [ta]
        + [ta[H - 2 - i : H - 1 - i, :] for i in range(p)],
        axis=0,
    )
    accv = taps[p] * xpadv[p : p + H]
    for t in range(p):
        accv = accv + taps[t] * (xpadv[t : t + H] + xpadv[2 * p - t : 2 * p - t + H])
    o_ref[0] = accv


# ---------------------------------------------------------------- shears


def shears_unpacked_kernel(x_ref, f1_ref, f2_ref, o_ref, *, runs1, runs2):
    bv = x_ref[0]
    s1 = mk._shear_pass(bv, runs1, f1_ref[:, :1], 1, quantize=False)
    s1w = jnp.concatenate(
        [s1[:, :W], jnp.zeros((LS2 - H, W), jnp.float32)], axis=0
    )
    s2 = mk._shear_pass(jnp.swapaxes(s1w, 0, 1), runs2, f2_ref[:, :1], 1, quantize=False)
    s2w = jnp.concatenate(
        [s2[:, :H], jnp.zeros((LSX - W, H), jnp.float32)], axis=0
    )
    o_ref[0] = mk._shear_pass(jnp.swapaxes(s2w, 0, 1), runs1, f1_ref[:, :1], 1, quantize=False)


def shears_packed_kernel(x_ref, f1_ref, f2_ref, o_ref, *, runs1, runs2):
    bv = x_ref[0]  # [H, PK*LSX]
    s1 = mk._shear_pass(bv, runs1, f1_ref[:, :1], 1, quantize=False)
    s1w = jnp.concatenate(
        [s1, jnp.zeros((LS2 - H, PK * LSX), jnp.float32)], axis=0
    )
    s2 = mk._shear_pass(jnp.swapaxes(s1w, 0, 1), runs2, f2_ref[:, :1], 1, quantize=False)
    tb = jnp.swapaxes(s2, 0, 1)[:H]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PK * LSX), 1)
    s3in = jnp.where(lane % LSX < W, tb, 0.0)
    o_ref[0] = mk._shear_pass(s3in, runs1, f1_ref[:, :1], 1, quantize=False)


# ---------------------------------------------------------------- outputs


def out_unpacked_kernel(x_ref, o_ref):
    v = (x_ref[0][:, :W] + 0.5).astype(jnp.int32)
    vt = jnp.swapaxes(v, 0, 1)
    vi = jnp.stack([vt, vt, vt], axis=1).reshape(WC, H)
    o_ref[0] = jnp.swapaxes(vi, 0, 1).astype(jnp.uint8)


def out_packed_kernel(x_ref, o_ref):
    v = (x_ref[0] + 0.5).astype(jnp.int32)  # [H, PK*LSX]
    hp2 = mk._round_up(H, 128)
    v = jnp.concatenate(
        [v, jnp.zeros((hp2 - H, PK * LSX), jnp.int32)], axis=0
    )
    tv = jnp.swapaxes(v, 0, 1)
    vi = jnp.stack([tv, tv, tv], axis=1).reshape(3 * PK * LSX, hp2)
    big = jnp.swapaxes(vi, 0, 1)
    for jl in range(PK):
        o_ref[jl] = big[:H, jl * 3 * LSX : jl * 3 * LSX + WC].astype(jnp.uint8)


def out_unpacked_padded_kernel(x_ref, o_ref):
    # aligned variant of the unpacked output path: quantize the FULL slab,
    # pad rows so the two transposes stay 128-aligned
    v = (x_ref[0] + 0.5).astype(jnp.int32)  # [H, LSX]
    hp2 = mk._round_up(H, 128)
    v = jnp.concatenate([v, jnp.zeros((hp2 - H, LSX), jnp.int32)], axis=0)
    tv = jnp.swapaxes(v, 0, 1)  # [LSX, hp2]
    vi = jnp.stack([tv, tv, tv], axis=1).reshape(3 * LSX, hp2)
    big = jnp.swapaxes(vi, 0, 1)  # [hp2, 3*LSX]
    o_ref[0] = big[:H, :WC].astype(jnp.uint8)


def run(name, kernel, in_shapes, out_shape, extra=(), images_per_block=1, **kw):
    grid = N // images_per_block
    specs = [
        pl.BlockSpec(s, (lambda i, _n=len(s): (i,) + (0,) * (_n - 1)),
                     memory_space=pltpu.VMEM)
        for s in in_shapes
    ] + [
        pl.BlockSpec(s, (lambda i, _n=len(s): (0,) * _n),
                     memory_space=pltpu.VMEM)
        for s in [e.shape for e in extra]
    ]
    fn = lambda *args: pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(grid,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            out_shape, (lambda i: (i,) + (0,) * (len(out_shape) - 1)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid * out_shape[0],) + out_shape[1:],
            jnp.uint8 if name.startswith("out") else jnp.float32,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=mk._interpret(),
    )(*args)
    rng = np.random.default_rng(0)
    args = []
    for s in in_shapes:
        full = (grid * s[0],) + s[1:]
        if name.startswith("front"):
            args.append(jnp.asarray(rng.integers(0, 256, full, dtype=np.uint8)))
        else:
            args.append(jnp.asarray(rng.random(full, dtype=np.float32) * 255.0))
    args += [jnp.asarray(e) for e in extra]
    # extras are globals (index 0) — wrap fn to close over them
    g = lambda x: fn(x, *args[1:])
    ms = _time_shape_changing(g, args[0])
    us_img = ms * 1e3 / N
    print(f"{name}: {us_img:.3f} us/image ({ms:.3f} ms/call)")
    return round(us_img, 3)


def _time_shape_changing(g, x, k1: int = 4, k2: int = 16, reps: int = 8) -> float:
    """ms per g(x) call for ops that change shape/dtype (op_throughput needs
    a shape-preserving carry). A fori_loop re-invokes g on a per-iteration
    perturbed input (defeats CSE/hoisting) and folds a scalar out."""
    import time

    def make(k):
        @jax.jit
        def loop(x):
            def body(i, acc):
                xi = x.at[0, 0, 0].set((i % 2).astype(x.dtype))
                y = g(xi)
                return acc + y[0, 0, :8].astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return loop

    def wall(fn):
        float(fn(x))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = wall(make(k1)), wall(make(k2))
    return max((t2 - t1) / (k2 - k1), 1e-9) * 1e3


def main() -> None:
    taps = _taps()
    runs1, f1, runs2p, f2 = _shear_tables()
    res = {}

    f1b = np.broadcast_to(f1[:, None], (H, 128)).copy()
    f2pad = np.zeros(LSX, np.float32)
    f2pad[:W] = f2
    f2b_unp = np.broadcast_to(f2[:, None], (W, 128)).copy()
    f2b_pk = np.broadcast_to(np.tile(f2pad, PK)[:, None], (PK * LSX, 128)).copy()

    r2ext = list(runs2p)
    r2ext[-1] = (r2ext[-1][0], LSX, r2ext[-1][2])
    runs2_pk = tuple(
        (jl * LSX + r0, jl * LSX + r1, k) for jl in range(PK) for (r0, r1, k) in r2ext
    )

    res["front_unpacked_i32"] = run(
        "front_unpacked_i32", front_unpacked_kernel, [(1, H, WC)],
        (1, H, LSX), taps=taps,
    )
    mk._UNALIGNED_LUMA_U8 = True
    res["front_unpacked_u8pad"] = run(
        "front_unpacked_u8pad", front_unpacked_kernel, [(1, H, WC)],
        (1, H, LSX), taps=taps,
    )
    mk._UNALIGNED_LUMA_U8 = False
    res["front_packed"] = run(
        "front_packed", front_packed_kernel, [(PK, H, WC)],
        (1, H, PK * LSX), images_per_block=PK, taps=taps,
    )
    res["shears_unpacked"] = run(
        "shears_unpacked", shears_unpacked_kernel, [(1, H, LSX)],
        (1, H, LSX), extra=(f1b, f2b_unp), runs1=runs1, runs2=runs2p,
    )
    res["shears_packed"] = run(
        "shears_packed", shears_packed_kernel, [(1, H, PK * LSX)],
        (1, H, PK * LSX), extra=(f1b, f2b_pk), images_per_block=PK,
        runs1=runs1, runs2=runs2_pk,
    )
    res["out_unpacked"] = run(
        "out_unpacked", out_unpacked_kernel, [(1, H, LSX)], (1, H, WC)
    )
    res["out_unpacked_padded"] = run(
        "out_unpacked_padded", out_unpacked_padded_kernel, [(1, H, LSX)],
        (1, H, WC),
    )
    res["out_packed"] = run(
        "out_packed", out_packed_kernel, [(1, H, PK * LSX)], (PK, H, WC),
        images_per_block=PK,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
