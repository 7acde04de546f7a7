"""Real-chip A/B at 224x224: unpacked vs block-packed gray1 kernel.

Context (round 4): probe_packed_gray1 measured block-packed 9.18 vs
unpacked 11.53 at 224 — the pass-2 per-run roll list multiplies by the
lane-pack factor and eats the alignment win; a grouped-pass-2 variant
(one roll per 16-row group + exact static residual route) measured
11.07/11.77 vs 12.09 per-run / 12.13 unpacked and was REMOVED in round 5
(negative result recorded in megakernel._pack_factors). Packing stays
scoped to h < 128; this probe force-enables it at 224 to re-check that
scoping whenever the packed geometry changes.

Run: python tools/probe_packed_224.py
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
# K=96: at batch 128 a 224 call is only ~6.4 Mpix (~0.6 ms) — a k=24
# window (~14 ms) sits BELOW the ~30 ms RPC floor, and floor jitter swung
# earlier readings 11 -> 21 Gpix/s on identical configs. ~60 ms windows
# are stable.
BATCH, H, W, K = 128, 224, 224, 96


def fn(x):
    return mk.fused_blur_rotate_image(
        x, RADIUS, ANGLE, grayscale_out=True, stream=True
    )


def measure(label: str) -> float:
    mk.fused_blur_rotate_image.clear_cache()
    # parity first (real chip)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, H, W, 3), dtype=np.uint8)
    got = np.asarray(fn(jnp.asarray(imgs)))
    ref = ofw.fused_stream_chain(imgs, RADIUS, ANGLE, grayscale_out=True)
    err = int(np.abs(got.astype(int) - ref.astype(int)).max())
    g = timed_gpix(BATCH, H, W, k=K, fn=fn)
    print(f"{label}: {g:.3f} Gpix/s (parity {err} LSB)")
    assert err == 0, label
    return round(g, 3)


def main() -> None:
    results = {}
    orig = mk._pack_factors
    pack4 = lambda n, h, w: (4, 1) if h >= 128 else orig(n, h, w)

    mk._pack_factors = pack4
    results["packed_runs"] = measure("packed runs (per-run pass 2)")

    mk._pack_factors = orig
    results["unpacked"] = measure("unpacked")

    # second packed sample (same process) to bracket variance
    mk._pack_factors = pack4
    results["packed_runs_b"] = measure("packed runs (repeat)")
    mk._pack_factors = orig
    mk.fused_blur_rotate_image.clear_cache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
