"""Real-chip A/B of the multi-image-packed gray1 megakernel (round 4).

Measures the static stream gray1 chain packed vs unpacked at the shapes
the packing targets (224x224 ImageNet, 32x32 CIFAR, 64x64) plus the 512
control, with the bench-style scan-K timing. Also the first Mosaic
acceptance check for _mega_gray1_packed_kernel (interpret mode cannot
validate Mosaic layout constraints).

Run: python tools/probe_packed_gray1.py
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

#: (batch, h, w, scan_k) — 512 is omitted: _pack_factors returns (1,1)
#: there, so packed == unpacked by construction. Windows are sized so
#: batch*k*pix is >= 2x the ~30 ms RPC floor (the round-4 lesson: k=24 at
#: these tiny shapes reads 25%+ jitter; bench.py uses k=96 too).
SHAPES = [
    (128, 224, 224, 96),
    (4096, 32, 32, 96),
    (512, 64, 64, 96),
]


def run(label: str, shapes=SHAPES) -> dict:
    out = {}
    for batch, h, w, k in shapes:
        pkl, pks = mk._pack_factors(batch, h, w)

        def fn(x):
            return mk.fused_blur_rotate_image(
                x, RADIUS, ANGLE, grayscale_out=True, stream=True
            )

        try:
            g = timed_gpix(batch, h, w, k=k, fn=fn)
        except Exception as e:  # Mosaic rejection is a result
            out[f"{h}x{w}"] = f"REJECTED: {type(e).__name__}: {str(e)[:200]}"
            print(f"{label} {h}x{w}: REJECTED {e!r}"[:300])
            continue
        out[f"{h}x{w}"] = round(g, 3)
        print(f"{label} {h}x{w} pack=({pkl},{pks}): {g:.3f} Gpix/s")
    return out


def parity() -> int:
    rng = np.random.default_rng(0)
    worst = 0
    for n, h, w in [(8, 224, 224), (32, 32, 32), (256, 32, 32)]:
        imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
        got = np.asarray(
            mk.fused_blur_rotate_image(
                jnp.asarray(imgs), RADIUS, ANGLE, grayscale_out=True, stream=True
            )
        )
        ref = ofw.fused_stream_chain(imgs, RADIUS, ANGLE, grayscale_out=True)
        worst = max(worst, int(np.abs(got.astype(int) - ref.astype(int)).max()))
    return worst


def main() -> None:
    err = parity()
    print(f"parity (packed, real chip): {err} LSB")
    packed = run("packed")
    orig = mk._pack_factors
    mk._pack_factors = lambda *a: (1, 1)
    # the @jax.jit wrapper caches by (static args, avals) — identical for
    # both variants, so the cache must be dropped or the "unpacked" run
    # would reuse the packed executable
    mk.fused_blur_rotate_image.clear_cache()
    try:
        unpacked = run("unpacked")
    finally:
        mk._pack_factors = orig
        mk.fused_blur_rotate_image.clear_cache()
    print(json.dumps({"parity_lsb": err, "packed": packed, "unpacked": unpacked}))


if __name__ == "__main__":
    main()
