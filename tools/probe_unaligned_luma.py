"""Real-TPU probe for the unaligned-shape (224x224) megakernel luma front.

Run on the real chip (NOT under the CPU conftest):

    timeout 900 python tools/probe_unaligned_luma.py

Validates, in order:
1. Mosaic ACCEPTS the sublane-padded u8 transpose + reshape-split at
   224x224 (megakernel._UNALIGNED_LUMA_U8 = True path) for both the
   static-angle and traced-angle gray1 kernels — the shape cast was the
   op Mosaic rejected pre-padding ("unsupported shape cast" on 672x224 i8).
2. On-chip parity vs oracle/fast_warp.fused_stream_chain (expect 0 LSB:
   the VPU does not FMA-contract).
3. Throughput at 224x224 and 512x512 vs the CLAUDE.md round-3 anchors
   (8.77 / 14.04 Gpix/s) — the padded u8 front and the u8-before-transpose
   output store should only remove relayout bytes.

If (1) fails with a Mosaic lowering error, set
ops/pallas/megakernel._UNALIGNED_LUMA_U8 = False (one-line rollback).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import timed_gpix  # flat-carry scan timing, comparable to anchors
from imagetransformations_tpu.ops.pallas import megakernel as mk
from imagetransformations_tpu.oracle import fast_warp as ofw


def parity(shape, radius, angle, traced):
    n, h, w = shape
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    if traced:
        angles = np.linspace(-angle, angle, n).astype(np.float32)
        out = np.asarray(
            mk.fused_blur_rotate_batched(
                jnp.asarray(imgs), radius, jnp.asarray(angles),
                grayscale_out=True, stream=True,
            )
        )
        ref = np.concatenate(
            [
                ofw.fused_stream_chain(
                    imgs[i : i + 1], radius, float(a), grayscale_out=True
                )
                for i, a in enumerate(angles)
            ]
        )
    else:
        out = np.asarray(
            mk.fused_blur_rotate_image(
                jnp.asarray(imgs), radius, angle, grayscale_out=True, stream=True
            )
        )
        ref = ofw.fused_stream_chain(imgs, radius, angle, grayscale_out=True)
    err = np.abs(out.astype(int) - ref.astype(int))
    return int(err.max()), float((err > 0).mean())


def set_flags(on: bool) -> None:
    mk._UNALIGNED_LUMA_U8 = on
    mk._U8_OUTPUT_STORE = on
    # the flags are read at kernel-trace time; the jit caches key on static
    # args only, so stale executables must be dropped between settings
    mk.fused_blur_rotate_image.clear_cache()
    mk._fused_blur_rotate_batched_jit.clear_cache()


def main():
    dev = jax.devices()[0]
    print(f"backend: {jax.default_backend()} device: {dev}", flush=True)
    assert jax.default_backend() == "tpu", "probe must run on the real chip"
    results = {}

    for flag in (False, True):
        set_flags(flag)
        tag = "u8opt" if flag else "base"
        # parity / Mosaic-acceptance gates (the True setting is the probe's
        # whole point: Mosaic rejections surface here as compile errors)
        for name, shape, traced in [
            ("static32", (16, 32, 32), False),   # CIFAR: wc=96 < a lane tile
            ("static224", (8, 224, 224), False),
            ("traced224", (8, 224, 224), True),
            ("static512", (4, 512, 512), False),
        ]:
            t0 = time.time()
            mx, frac = parity(shape, 1.5, 15.0, traced)
            # traced-angle budget is <=1 LSB (device f32 shift floor() can
            # flip measure-zero truncation boundaries — the same gate
            # bench_kernels and test_megakernel apply); static is 0 LSB
            results[f"{tag}.{name}"] = {
                "max_lsb": mx,
                "flip_frac": round(frac, 6),
                "wall_s": round(time.time() - t0, 1),
                "ok": mx <= (1 if traced else 0),
            }
            print(f"{tag}.{name}: {results[f'{tag}.{name}']}", flush=True)

        # throughput via bench.timed_gpix (flat [N,H,W*C] scan carry + RPC
        # floor subtraction — the SAME methodology as the CLAUDE.md anchors;
        # an NHWC carry adds two relayout copies and reads ~30% low at 512).
        # Tunnel variance is +-10% — only a consistent win justifies a flip.
        def fn(v):
            return mk.fused_blur_rotate_image(
                v, 1.5, 15.0, grayscale_out=True, stream=True
            )

        for name, (h, w, bs, k) in [
            ("gpix224", (224, 224, 128, 24)),  # batch 128 = bench.py's anchor
            ("gpix512", (512, 512, 32, 32)),
        ]:
            best = max(timed_gpix(bs, h, w, k=k, fn=fn) for _ in range(3))
            results[f"{tag}.{name}"] = round(best, 3)
            print(f"{tag}.{name}: {results[f'{tag}.{name}']} Gpix/s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
