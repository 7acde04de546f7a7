"""Probe: how much VPU throughput does lane-tile quantization cost at
224-wide luma slabs, and would packing images to exact 128-multiples help?

Context (CLAUDE.md round-4 hypotheses): the 224x224 megakernel runs its
luma slab at 224 lanes = 1.75 hardware tiles (v5e lane tile = 128).
Mosaic pads the vector layout to 256 lanes, so every slab pass may waste
~12.5% of lanes — and if per-op overhead is per-SLAB rather than
per-byte, narrow slabs waste more. Packing FOUR images side-by-side
(4*224 = 896 = 7 exact tiles) would amortize both, at the cost of a
margin-accounting restructure of the kernel. This probe measures the raw
per-pixel cost of a chained roll+FMA slab pass across lane widths /
batch splits so the packing upside is known BEFORE any restructure.

Interpretation: if us/Mpix/pass at (224 rows x 224 lanes, N=128) is
within ~10% of (224 x 896, N=32), packing has no upside — record the
negative result and stop. Costs above that bound the win: the fused-chain
is ~21 effective passes, so a 20% slab-pass gap ~= 20% end-to-end.

Run on the real chip: python tools/probe_lane_tiles.py
CPU semantics smoke:   JAX_PLATFORM_NAME=cpu python tools/probe_lane_tiles.py --smoke
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

P = 16  # chained passes per kernel call


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pass_kernel(x_ref, o_ref, *, p: int):
    # one "effective pass" = roll + FMA, the megakernel's dominant op mix.
    # Bounded mix (convex combination): values stay finite across the whole
    # op_throughput scan — the old v + roll(v)*0.5 grew ~1.5x per pass and
    # overflowed to inf partway through the measurement (ADVICE r3).
    v = x_ref[0]
    for j in range(p):
        v = v * 0.5 + pltpu.roll(v, 1 + j, axis=1) * 0.5
    o_ref[0] = v


def _run_shape(n: int, rows: int, lanes: int, interpret: bool):
    spec = pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return lambda x: pl.pallas_call(
        functools.partial(_pass_kernel, p=P),
        grid=(n,),
        out_shape=jax.ShapeDtypeStruct((n, rows, lanes), jnp.float32),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(x)


#: (rows, lanes, n) — equal total pixels per batch (25.7 Mpix) except the
#: 512 reference rows; n chosen so each config moves the same data.
CONFIGS = (
    (224, 224, 512),   # current 224 per-image luma slab shape
    (224, 256, 448),   # padded to 2 exact tiles (same total pixels)
    (224, 448, 256),   # 2-packed
    (224, 896, 128),   # 4-packed: 7 exact tiles
    (512, 512, 98),    # 512 reference (4 exact tiles)
    (512, 640, 78),    # the actual 512 luma+margin slab
)


def main() -> None:
    from imagetransformations_tpu.utils.profiling import op_throughput

    interp = _interpret()
    if "--smoke" in sys.argv:
        # semantics only: the pass chain must equal its numpy mirror
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 256)).astype(np.float32)
        got = np.asarray(_run_shape(2, 16, 256, True)(jnp.asarray(x)))
        want = x.copy()
        for j in range(P):
            want = want * np.float32(0.5) + np.roll(want, 1 + j, axis=2) * np.float32(0.5)
        assert np.allclose(got, want, rtol=1e-6), "pass-chain semantics"
        print("smoke OK")
        return

    results = {}
    for rows, lanes, n in CONFIGS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((n, rows, lanes)).astype(np.float32))
        try:
            r = op_throughput(_run_shape(n, rows, lanes, interp), x, k1=8, k2=40)
        except Exception as e:  # Mosaic rejection is a result, not a crash
            results[f"{rows}x{lanes}xN{n}"] = (
                f"REJECTED: {type(e).__name__}: {str(e)[:160]}"
            )
            continue
        mpix = n * rows * lanes / 1e6
        us_mpix_pass = r["ms_per_op"] * 1e3 / P / mpix
        results[f"{rows}x{lanes}xN{n}"] = round(us_mpix_pass, 4)
        print(f"{rows}x{lanes} N={n}: {us_mpix_pass:.4f} us/Mpix/pass "
              f"({r['ms_per_op']:.3f} ms/call)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
