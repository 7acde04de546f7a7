"""Real-chip pack-factor A/B for the sub-stride packed gray1 kernel at
32x32 (round 5, VERDICT r4 item 2): piece overhead (input concat, per-
sub-image blur pads, tiled run rolls) dominates at this shape, and its
per-image cost scales as (x-pieces/packs + y-pieces/packl), so the
optimum balances the two pack directions.

Run: python tools/probe_pack32.py [pl:ps ...]   (default sweep)
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

ANGLE, RADIUS = 15.0, 1.5
BATCH, H, W, K = 4096, 32, 32, 96


def fn(x):
    return mk.fused_blur_rotate_image(
        x, RADIUS, ANGLE, grayscale_out=True, stream=True
    )


def measure(pl: int, ps: int) -> float:
    orig = mk._pack_factors
    mk._pack_factors = lambda n, h, w: (pl, ps)
    mk.fused_blur_rotate_image.clear_cache()
    try:
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (pl * ps, H, W, 3), dtype=np.uint8)
        got = np.asarray(fn(jnp.asarray(imgs)))
        ref = ofw.fused_stream_chain(imgs, RADIUS, ANGLE, grayscale_out=True)
        err = int(np.abs(got.astype(int) - ref.astype(int)).max())
        g = timed_gpix(BATCH, H, W, k=K, fn=fn)
        print(f"({pl},{ps}): {g:.3f} Gpix/s (parity {err} LSB)")
        assert err == 0, (pl, ps)
        return round(g, 3)
    finally:
        mk._pack_factors = orig
        mk.fused_blur_rotate_image.clear_cache()


def main() -> None:
    pairs = [tuple(int(p) for p in a.split(":")) for a in sys.argv[1:]] or [
        (16, 16), (32, 8), (8, 16), (32, 16), (16, 16),
    ]
    results = {f"{pl}x{ps}" + ("_rep" if i and (pl, ps) in pairs[:i] else ""): measure(pl, ps)
               for i, (pl, ps) in enumerate(pairs)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
