"""Real-chip A/B of the traced-angle fused chain's group heights.

Round 5 (one-sided group-minimum residuals, megakernel._grouped_params):
the same route depth now supports ~2x the group height — at the
22.5-degree budget the residual needs 2 bits at gh=(16,8) (32+64 roll
slices per shear at 512) or 1 bit at gh=(6,3) (86+171 slices). Measured
round 5 (same process): (16,8) 10.19/10.50 vs round-4 centered (8,4)
9.79 Gpix/s — slice count dominates, matching the round-4 gh probe.

Args: "16:8" pins per-pass heights, "0" = auto (one-sided 2-bit,
default), "-1" = ungrouped pure log route.

Run: python tools/probe_traced_gh.py [gh ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

import imagetransformations_tpu.ops.pallas.megakernel as mk
from bench import timed_gpix
from imagetransformations_tpu.oracle import fast_warp as ofw

BATCH, H, W, K = 32, 512, 512, 48
RADIUS = 1.5


def traced_fn(x):
    ang = jnp.asarray(np.linspace(-22.5, 22.5, x.shape[0], dtype=np.float32))
    return mk.fused_blur_rotate_batched(
        x, RADIUS, ang, grayscale_out=True, stream=True
    )


def _run8(gh):
    # gh semantics match megakernel._TRACED_GROUP_ROWS: tuple = pinned
    # per-pass heights, 0 = auto (_auto_group_rows target_range=1, i.e.
    # the ONE-bit (6,3) route at the 22.5-deg budget), -1 = ungrouped
    # log route
    gh1, gh2 = gh if isinstance(gh, tuple) else (gh, gh)
    mk._TRACED_GROUP_ROWS = gh1
    mk._TRACED_GROUP_ROWS2 = gh2
    mk._fused_blur_rotate_batched_jit.clear_cache()
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    angs = np.linspace(-22.5, 22.5, 8, dtype=np.float32)
    got = np.asarray(
        mk.fused_blur_rotate_batched(
            jnp.asarray(imgs), RADIUS, jnp.asarray(angs),
            grayscale_out=True, stream=True,
        )
    )
    ref = np.stack(
        [
            ofw.fused_stream_chain(imgs[i : i + 1], RADIUS, float(angs[i]),
                                   grayscale_out=True)[0]
            for i in range(8)
        ]
    )
    err = np.abs(got.astype(int) - ref.astype(int))
    return got, int(err.max()), float((err > 0).mean())


def measure(gh, base) -> float:
    got, emax, efrac = _run8(gh)
    # grouped must equal the UNGROUPED log route BITWISE on the chip (the
    # routing is exact); the oracle delta is the device-vs-numpy f32 tan
    # ULP (shared by all gh, reported not gated)
    bit = "bitwise==gh0" if (base is not None and np.array_equal(got, base)) else "DIFFERS"
    g = timed_gpix(BATCH, H, W, k=K, fn=traced_fn)
    print(f"gh={gh}: {g:.3f} Gpix/s (vs oracle max {emax} LSB at {efrac:.2e}; {bit})")
    assert base is None or np.array_equal(got, base), gh
    assert emax <= 1 and efrac <= 1e-4, (gh, emax, efrac)
    return round(g, 3)


def main() -> None:
    # args: "8" (gh1=gh2=8) or "8:4" (per-pass group heights)
    ghs = [
        tuple(int(p) for p in a.split(":")) if ":" in a else int(a)
        for a in sys.argv[1:]
    ] or [(16, 8), (8, 4), (16, 8)]
    base, emax0, efrac0 = _run8(-1)  # ungrouped log route reference
    print(f"gh=-1 (ungrouped): vs oracle max {emax0} LSB at {efrac0:.2e}")
    results = {}
    for i, gh in enumerate(ghs):
        key = f"gh{gh}" if f"gh{gh}" not in results else f"gh{gh}_rep{i}"
        results[key] = measure(gh, base)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
