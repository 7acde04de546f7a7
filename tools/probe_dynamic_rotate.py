"""Probe: is Mosaic's tpu.dynamic_rotate (pltpu.roll with a TRACED shift)
cheap enough to replace log-routing levels in the traced-angle shears?

Context (PERF.md traced-band note): the traced megakernel pays
~log2(range) roll+select pairs per shear because per-row integer shifts
are runtime values. pltpu.roll lowers to tpu.dynamic_rotate, which takes a
runtime scalar shift — if that costs ~1-2 slab passes (hardware lane
permute) instead of an internal log-shift chain, a row-group decomposition
(per-group dynamic roll + tiny residual routing) cuts the traced routing
cost by ~2x. If it costs ~log2 passes internally, the current design is
already optimal and this probe documents the negative result.

Run on the real chip: python tools/probe_dynamic_rotate.py
Semantics check (CPU interpret): JAX_PLATFORM_NAME=cpu python tools/probe_dynamic_rotate.py --semantics
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

H, LS = 512, 640  # the luma working slab per image (f32)
N = 32
R = 16  # rolls chained per kernel call


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- kernels
def _static_kernel(x_ref, o_ref):
    v = x_ref[0]
    for j in range(R):
        v = pltpu.roll(v, 1 + 2 * j, axis=1)
    o_ref[0] = v


def _dynamic_kernel(s_ref, x_ref, o_ref):
    v = x_ref[0]
    s = s_ref[0, 0, 0]
    for j in range(R):
        v = pltpu.roll(v, s + j, axis=1)
    o_ref[0] = v


def _dynamic_sublane_kernel(s_ref, x_ref, o_ref):
    v = x_ref[0]
    s = s_ref[0, 0, 0]
    for j in range(R):
        v = pltpu.roll(v, s + j, axis=0)
    o_ref[0] = v


def _stride_kernel(s_ref, x_ref, o_ref):
    # per-row shift = s + 1*row: a unit-slope shear in ONE op
    v = x_ref[0]
    s = s_ref[0, 0, 0]
    for j in range(R):
        v = pltpu.roll(v, s + j, axis=1, stride=1, stride_axis=0)
    o_ref[0] = v


def _group_dynamic_kernel(s_ref, x_ref, o_ref, *, groups: int):
    # slice rows into `groups` static groups, dynamic-roll each by its own
    # per-image scalar, one concat — the coarse stage of a grouped shear
    v = x_ref[0]
    gh = H // groups
    for _ in range(4):  # amortize; 4 group-stages per call
        parts = []
        for g in range(groups):
            sg = s_ref[0, g, 0]
            parts.append(pltpu.roll(v[g * gh : (g + 1) * gh, :], sg, axis=1))
        v = jnp.concatenate(parts, axis=0)
    o_ref[0] = v


def _logroute_kernel(k_ref, x_ref, o_ref, *, nbits: int):
    # one full log-route (per-row amt, nbits levels) per kernel call
    from imagetransformations_tpu.ops.pallas.rotate_gather import (
        _route_const_axis,
    )

    v = x_ref[0]
    amt = k_ref[0][:, :1]  # [H, 1] i32, varies along sublanes only
    for _ in range(R // 8):
        v = _route_const_axis(v, amt, axis=1, unit=1, nbits=nbits, bias=0)
    o_ref[0] = v


def _call(kernel, scalar_rows=None, interpret=None):
    interp = _interpret() if interpret is None else interpret
    in_specs = [pl.BlockSpec((1, H, LS), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
    args = []
    if scalar_rows is not None:
        in_specs.insert(
            0,
            pl.BlockSpec(scalar_rows, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )

    def run(x, *extra):
        return pl.pallas_call(
            kernel,
            grid=(x.shape[0],),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H, LS), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interp,
        )(*extra, x)

    return run


def semantics() -> None:
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, H, LS)).astype(np.float32)

    # dynamic lane roll == np.roll along lanes by +s (toward higher index)
    s = np.asarray([[3], [7]], np.int32)
    sblk = np.broadcast_to(s[:, :, None], (2, 8, 128)).copy()
    run = _call(_dynamic_kernel, scalar_rows=(1, 8, 128))

    def one_dyn(v, sv):
        out = v
        for j in range(R):
            out = np.roll(out, sv + j, axis=1)
        return out

    got = np.asarray(run(jnp.asarray(x), jnp.asarray(sblk)))
    want = np.stack([one_dyn(x[i], int(s[i, 0])) for i in range(2)])
    assert np.array_equal(got, want), "dynamic lane roll semantics mismatch"
    print("dynamic lane roll: np.roll(+s) semantics OK")

    # stride: row y rolls by s + stride*y (expected; verify)
    run = _call(_stride_kernel, scalar_rows=(1, 8, 128))
    got = np.asarray(run(jnp.asarray(x[:1]), jnp.asarray(sblk[:1])))

    def one_stride(v, sv):
        out = v
        for j in range(R):
            out = np.stack(
                [np.roll(out[y], sv + j + y) for y in range(out.shape[0])]
            )
        return out

    want = one_stride(x[0], int(s[0, 0]))[None]
    assert np.array_equal(got, want), "stride roll semantics mismatch"
    print("stride roll: per-row shift = s + stride*row OK")


def perf() -> None:
    from imagetransformations_tpu.utils.profiling import op_throughput

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, LS)).astype(np.float32))
    s = jnp.asarray(np.broadcast_to(
        rng.integers(1, 100, (N, 1, 1)).astype(np.int32), (N, 8, 128)).copy())
    k = jnp.asarray(rng.integers(0, 200, (N, H, 1)).astype(np.int32))
    kb = jnp.broadcast_to(k, (N, H, 128)).copy()

    results = {}

    def measure(name, run, *extra, per_call_ops):
        try:
            fn = lambda a: run(a, *extra)
            r = op_throughput(fn, x, k1=8, k2=72)
        except Exception as e:  # Mosaic rejection is a result, not a crash
            results[name] = f"REJECTED: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: {results[name]}")
            return
        us_per_op = r["ms_per_op"] * 1e3 / per_call_ops / N
        results[name] = round(us_per_op, 4)
        print(f"{name}: {us_per_op:.3f} us/slab-op/image "
              f"({r['ms_per_op']:.3f} ms per call)")

    measure("static_roll", _call(_static_kernel), per_call_ops=R)
    measure("dynamic_roll_lane", _call(_dynamic_kernel, scalar_rows=(1, 8, 128)), s,
            per_call_ops=R)
    measure("dynamic_roll_sublane",
            _call(_dynamic_sublane_kernel, scalar_rows=(1, 8, 128)), s,
            per_call_ops=R)
    if "--stride" in sys.argv:  # segfaults the CPU interpret executor
        measure("stride_roll", _call(_stride_kernel, scalar_rows=(1, 8, 128)), s,
                per_call_ops=R)
    for g in (16, 32, 64):
        sg = jnp.asarray(np.broadcast_to(
            rng.integers(1, 100, (N, g, 1)).astype(np.int32),
            (N, g, 128)).copy())
        measure(f"group{g}_dynamic_stage",
                _call(functools.partial(_group_dynamic_kernel, groups=g),
                      scalar_rows=(1, g, 128)), sg,
                per_call_ops=4)
    # 8-bit log route = 8 roll+select pairs; report per LEVEL (roll+select)
    measure("logroute_8bit_level",
            _call(functools.partial(_logroute_kernel, nbits=8),
                  scalar_rows=(1, H, 128)), kb,
            per_call_ops=(R // 8) * 8)

    print(json.dumps(results))


if __name__ == "__main__":
    if "--semantics" in sys.argv:
        semantics()
    else:
        perf()
