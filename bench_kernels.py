#!/usr/bin/env python
"""Per-kernel on-device parity gates (VERDICT round-1, weak #7).

Runs every Pallas kernel individually on the REAL TPU against its CPU
oracle and prints ONE JSON line per kernel:

  {"kernel": ..., "max_lsb_err": N, "flip_frac": F, "ok": true}

Gates: max |err| <= 1 LSB for oracle-defined kernels; flip fraction
<= 0.5% for the PIL-NEAREST kernel (f32 device coords vs PIL's f64 flip
floor() on measure-zero boundary pixels — same budget as tests/test_warp.py).

bench.py stays the single-JSON-line headline benchmark; this file is the
kernel-level differential gate (run by .claude/skills/verify).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax.numpy as jnp

from imagetransformations_tpu.oracle import elementwise as oe
from imagetransformations_tpu.oracle import fast_warp as ofw
from imagetransformations_tpu.oracle import stencil as ost
from imagetransformations_tpu.oracle import warp as ow

H, W, N = 256, 128, 2
ANGLE, RADIUS = 15.0, 1.5


def gate(name, out, ref, max_lsb=1, max_flip=1.0):
    # ``out`` may be a thunk: a compile/runtime failure in ONE kernel then
    # reports as its own {"ok": false, "error": ...} line instead of taking
    # down the remaining gates
    try:
        out = np.asarray(out() if callable(out) else out).astype(int)
    except Exception as e:  # noqa: BLE001 - report per-kernel and continue
        print(json.dumps({
            "kernel": name, "error": repr(e)[:300], "ok": False,
        }), flush=True)
        return False
    ref = np.asarray(ref).astype(int)
    err = int(np.abs(out - ref).max())
    flip = float((out != ref).mean())
    ok = err <= max_lsb and flip <= max_flip
    print(json.dumps({
        "kernel": name, "max_lsb_err": err,
        "flip_frac": round(flip, 6), "ok": bool(ok),
    }), flush=True)
    return ok


def main() -> None:
    from imagetransformations_tpu.ops.pallas.blur import blur_separable
    from imagetransformations_tpu.ops.pallas.megakernel import fused_blur_rotate_image
    from imagetransformations_tpu.ops.pallas.rotate_gather import pil_rotate_nearest_batched
    from imagetransformations_tpu.ops.pallas.shear import (
        blur_rotate_fused,
        rotate_3shear,
        rotate_3shear_batched,
        shear_rows,
    )

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8)
    x = jnp.asarray(imgs)
    ok = True

    blur_ref = np.stack([ost.gaussian_blur(im, RADIUS) for im in imgs])
    ok &= gate("blur_separable", lambda: blur_separable(x, RADIUS), blur_ref)

    shifts = (0.3 * (np.arange(H) - H / 2)).astype(np.float32)
    ok &= gate("shear_rows", lambda: shear_rows(x, jnp.asarray(shifts)),
               ofw.shear_rows(imgs, shifts), max_lsb=0)

    rot_ref = ofw.rotate_3shear(imgs, ANGLE)
    ok &= gate("rotate_3shear", lambda: rotate_3shear(x, ANGLE), rot_ref, max_lsb=0)

    angles = np.asarray([-12.0, 22.5], np.float32)
    batched_ref = np.concatenate(
        [ofw.rotate_3shear(imgs[i : i + 1], float(a)) for i, a in enumerate(angles)]
    )
    ok &= gate("rotate_3shear_batched",
               lambda: rotate_3shear_batched(x, jnp.asarray(angles)), batched_ref,
               max_lsb=0)

    chain_in = np.stack([oe.grayscale_rgb(im) for im in ofw.rotate_3shear(blur_ref, ANGLE)])
    ok &= gate("blur_rotate_fused",
               lambda: blur_rotate_fused(x, RADIUS, ANGLE, grayscale_out=True), chain_in)
    ok &= gate("megakernel",
               lambda: fused_blur_rotate_image(x, RADIUS, ANGLE, grayscale_out=True),
               chain_in)

    from PIL import Image
    pil_ref = np.stack([
        np.asarray(Image.fromarray(imgs[i]).rotate(-float(a), fillcolor=(0, 0, 0)))
        for i, a in enumerate(angles)
    ])
    ok &= gate("pil_rotate_nearest_batched",
               lambda: pil_rotate_nearest_batched(x, jnp.asarray(angles)), pil_ref,
               max_lsb=255, max_flip=0.005)

    # ---- round-2 traced-parameter kernels (VERDICT r2 item 4) -------------
    from imagetransformations_tpu.ops.pallas.resample import (
        shear_bicubic_batched,
        zoom_bilinear_batched,
    )
    from imagetransformations_tpu.ops.pallas.shear import shear_rows_logrouted
    from imagetransformations_tpu.ops.warp import apply_scale_batched

    fs = np.asarray([0.93, 1.27], np.float32)

    def zoom_ref(im, f):
        h, w = im.shape[:2]
        inv = 1.0 / f
        m = (inv, 0.0, w / 2 - inv * w / 2, 0.0, inv, h / 2 - inv * h / 2)
        return ow.affine_bilinear(im, m, fill=0)

    # device f32 lerp vs numpy f64 oracle: 0.5-boundary pixels may flip 1 LSB
    ok &= gate("zoom_bilinear_batched",
               lambda: zoom_bilinear_batched(x, jnp.asarray(fs)),
               np.stack([zoom_ref(imgs[i], float(f)) for i, f in enumerate(fs)]),
               max_lsb=1, max_flip=0.01)

    facs = np.asarray([0.35, 0.8], np.float32)
    shear_ref = np.stack(
        [ow.apply_shear(imgs[i], float(v))[:, :W] for i, v in enumerate(facs)]
    )
    # the numpy oracle runs the two cubic Horner passes in f64; the TPU VPU
    # (no FMA contraction) rounds each f32 op, flipping ~1.6% of pixels by
    # exactly 1 LSB at truncation boundaries (measured on v5e). The kernel
    # is bit-exact vs the f32 XLA op (tests/test_pallas_kernels.py).
    ok &= gate("shear_bicubic_batched",
               lambda: shear_bicubic_batched(x, jnp.asarray(facs)), shear_ref,
               max_lsb=1, max_flip=0.025)

    pshifts = rng.uniform(-18, 18, (N, H)).astype(np.float32)
    log_ref = np.concatenate(
        [ofw.shear_rows(imgs[i : i + 1], pshifts[i], fill=255) for i in range(N)]
    )
    ok &= gate("shear_rows_logrouted",
               lambda: shear_rows_logrouted(x, jnp.asarray(pshifts), fill=255,
                                    max_shift_px=20),
               log_ref, max_lsb=0)

    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    tangles = np.asarray([9.0, -21.0], np.float32)
    tref = np.concatenate(
        [
            ofw.fused_stream_chain(imgs[i : i + 1], RADIUS, float(a), grayscale_out=True)
            for i, a in enumerate(tangles)
        ]
    )
    # device f32 shift computation can flip floor() at exact boundaries
    # (<=1 LSB through the continuous bilinear chain)
    ok &= gate("fused_blur_rotate_batched",
               lambda: fused_blur_rotate_batched(x, RADIUS, jnp.asarray(tangles),
                                         grayscale_out=True, stream=True),
               tref, max_lsb=1, max_flip=0.01)

    grid = (0.9, 1.0, 1.1, 1.2, 1.3, 1.4)
    svals = np.asarray([1.3, 0.9], np.float32)
    scale_ref = np.stack(
        [ow.apply_scale(imgs[i], float(v)) for i, v in enumerate(svals)]
    )
    ok &= gate("apply_scale_batched",
               lambda: apply_scale_batched(x, jnp.asarray(svals), grid), scale_ref,
               max_lsb=0)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
