"""Real-chip A/B at 224x224: unpacked vs block-packed (per-run pass 2)
vs block-packed with grouped pass 2 (one roll per 16-row group + exact
static residual route).

Context: probe_packed_gray1 measured block-packed 9.18 vs unpacked 11.53
at 224 — the pass-2 per-run roll list multiplies by the lane-pack factor
(4x ~60 tiny rolls) and eats the alignment win. The grouped variant
replaces ~240 run rolls with 64 group rolls + ~6 route passes.

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
    mk._PACKED_PASS2_GROUPED = True
    results["packed_grp2"] = measure("packed grp2 (grouped pass 2)")

    mk._PACKED_PASS2_GROUPED = False
    results["packed_runs"] = measure("packed runs (per-run pass 2)")

    mk._pack_factors = orig
    results["unpacked"] = measure("unpacked")

    # second grp2 sample (same process) to bracket variance
    mk._pack_factors = pack4
    mk._PACKED_PASS2_GROUPED = True
    results["packed_grp2_b"] = measure("packed grp2 (repeat)")
    mk._pack_factors = orig
    mk._PACKED_PASS2_GROUPED = False
    mk.fused_blur_rotate_image.clear_cache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
