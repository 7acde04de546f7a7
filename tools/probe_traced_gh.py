"""Real-chip A/B of the traced-angle fused chain's group height after the
round-4 tight residual bound + bias-fold (VERDICT r4 item 2).

With the tight floor-difference bound (+1 instead of +2 slack,
megakernel._grouped_params) the residual route needs:
  gh=16: pass1 3 bits, pass2 4 bits (unchanged vs round 3)
  gh=8:  pass1 2 bits, pass2 3 bits
  gh=4:  pass1 2 bits, pass2 2 bits
and the static -bias_r pre-roll is folded into the per-group dynamic
rolls (one slab pass saved per shear) at every gh. Cost of smaller gh:
more pltpu.roll slices per group pass (128 at gh=4, h=512).

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
    gh1, gh2 = gh if isinstance(gh, tuple) else (gh, gh if gh else 0)
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
    ] or [(8, 4), (8, 8), (8, 4)]
    base, emax0, efrac0 = _run8(0)  # ungrouped log route reference
    print(f"gh=0 (ungrouped): vs oracle max {emax0} LSB at {efrac0:.2e}")
    results = {}
    for i, gh in enumerate(ghs):
        key = f"gh{gh}" if f"gh{gh}" not in results else f"gh{gh}_rep{i}"
        results[key] = measure(gh, base)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
