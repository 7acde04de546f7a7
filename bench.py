#!/usr/bin/env python
"""Headline benchmark: fused blur+rotate+grayscale over 512x512 RGB batches.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gpixel/s", "vs_baseline": N/10}

- metric matches BASELINE.json: Gpixels/s/chip on the fused filter+warp
  pipeline at 512x512 RGB, with a <=1-LSB parity gate vs the CPU oracle.
- vs_baseline is measured / 10 (the 10 Gpix/s/chip north-star target).
- Parity is checked in strict mode (per-op uint8 quantization, PIL/cv2
  semantics) on a small batch before timing the fused fast path.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.oracle import elementwise as oe
from imagetransformations_tpu.oracle import stencil as ost
from imagetransformations_tpu.oracle import warp as ow
from imagetransformations_tpu.pipeline.chain import OpSpec, build_chain_fn

ANGLE = 15.0
RADIUS = 1.5
H = W = 512
BATCH = 32
TARGET_GPIX = 10.0


def parity_check() -> float:
    """Strict chain (blur -> rotate -> grayscale) vs CPU oracle; max |err| LSB."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    chain = [
        OpSpec("blur", {"radius": RADIUS}),
        OpSpec("rotation", {"angle": ANGLE}),
        OpSpec("grayscale"),
    ]
    fn = build_chain_fn(chain, strict_parity=True)
    out = np.asarray(fn(jnp.asarray(imgs)))
    max_err = 0
    for i in range(imgs.shape[0]):
        ref = ost.gaussian_blur(imgs[i], RADIUS)
        ref = ow.apply_rotation(ref, ANGLE)
        ref = oe.grayscale_rgb(ref)
        max_err = max(max_err, int(np.abs(out[i].astype(int) - ref.astype(int)).max()))
    return max_err


def timed_gpix() -> float:
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    chain = [
        OpSpec("blur", {"radius": RADIUS}),
        OpSpec("rotation", {"angle": ANGLE}),
        OpSpec("grayscale"),
    ]
    fn = build_chain_fn(chain)
    jax.block_until_ready(fn(imgs))  # compile
    # warm + measure: median over repeated timed windows for tunnel robustness
    times = []
    for _ in range(5):
        n_iter = 20
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn(imgs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n_iter)
    dt = float(np.median(times))
    return BATCH * H * W / dt / 1e9


def main() -> None:
    max_err = parity_check()
    gpix = timed_gpix()
    result = {
        "metric": "fused blur+rotate+grayscale Gpixels/s/chip (512x512 RGB)",
        "value": round(gpix, 3),
        "unit": "Gpixel/s",
        "vs_baseline": round(gpix / TARGET_GPIX, 3),
        "parity_max_lsb_err": max_err,
        "parity_ok": bool(max_err <= 1),
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
