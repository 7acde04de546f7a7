"""Why does apply_scale_batched take ~134 s to compile? (VERDICT r4 item 5)

apply_all's cold-compile attribution (tools/probe_applyall_compile.py,
round 4) pins 134 s of the 171 s per-op total on the scale op; host-side
matrix precompute is 0.17 s, so the cost is XLA compiling the int32 einsum
pair [N,H,W,C] x [N,O,W] -> [N,H,O,C] at 32x512x512. This probe times
compile (first call) of candidate formulations at the same shape to find a
fast-compiling equivalent. All candidates keep int32 accumulate semantics.

Run (TPU): python tools/probe_scale_compile.py [--n 32] [--h 512]
End-to-end op timing: ``--only apply_scale_{scan,limb,i32}`` (sets
ITT_SCALE_FORM before importing warp). Exactness proof for the 11-bit-limb
f32 recombination vs int64, on the REAL LANCZOS canvas matrices:
``--cpu-check`` (run with JAX_PLATFORMS=cpu).

CAUTION (measured): in-process ordering contaminates the comparison — the
FIRST executable of a fresh process pays server-side warmup (41.7 s for the
int32 einsum run first; the int32 pair compiled 3.4 s right after). Use
``--only NAME`` and a fresh process per candidate for clean numbers.

FINDINGS (round 4, 32x512x512): the einsum pair is NOT the compile hog —
the [G,size,size][idx] batched GATHER is (86 s to jit `mats[idx]` alone;
isolated einsums <=42 s). Hence apply_scale_batched's default "scan" form:
lax.scan over images + dynamic_index_in_dim, no gather, no batched einsum.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 32
    h = int(sys.argv[sys.argv.index("--h") + 1]) if "--h" in sys.argv else 512
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (n, h, h, 3), dtype=np.int32))
    m = jnp.asarray(rng.integers(-(1 << 21), 1 << 21, (n, h, h), dtype=np.int32))

    if only in ("apply_scale_scan", "apply_scale_limb", "apply_scale_i32"):
        # the REAL op, end to end, in a fresh process
        os.environ["ITT_SCALE_FORM"] = only.rsplit("_", 1)[1]
        from imagetransformations_tpu.ops import warp as wp

        xu = jnp.asarray(rng.integers(0, 256, (n, h, h, 3), dtype=np.uint8))
        f = jnp.asarray(rng.uniform(0.9, 1.4, n).astype(np.float32))
        grid = (0.9, 1.0, 1.1, 1.2, 1.3, 1.4)
        t0 = time.time()
        r = wp.apply_scale_batched(xu, f, grid)
        float(jnp.sum(r[:1, :4, :4].astype(jnp.float32)))
        print(json.dumps({only: round(time.time() - t0, 1), "h": h}))
        return

    if "--cpu-check" in sys.argv:
        # limb-recombination exactness vs int64, on the REAL canvas matrices
        from imagetransformations_tpu.ops import warp as wp

        grid = (0.9, 1.0, 1.1, 1.2, 1.3, 1.4)
        for size in (h, 224):
            mats = wp._scale_canvas_matrices(size, grid)  # [G, size, size]
            a = rng.integers(0, 256, (size, size, 3), dtype=np.int64)
            for g, mm in enumerate(mats):
                ref = np.einsum("hwc,ow->hoc", a, mm.astype(np.int64))
                hi = np.floor_divide(mm, 1 << 11).astype(np.float32)
                lo = np.remainder(mm, 1 << 11).astype(np.float32)
                af = a.astype(np.float32)
                got = (np.einsum("hwc,ow->hoc", af, hi).astype(np.int64)
                       << 11) + np.einsum("hwc,ow->hoc", af, lo).astype(
                           np.int64)
                assert np.array_equal(ref, got), (size, g)
                assert np.abs(ref).max() < (1 << 31), (size, g)
            print(f"size={size}: limb f32 == int64 for all {len(mats)} "
                  "grid matrices; accumulates fit int32")
        return

    def timed(name, fn, *args):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        float(jnp.sum(jnp.asarray(r)[:1, :4, :4].astype(jnp.float32)))
        dt = time.time() - t0
        print(f"{name}: first call {dt:.1f} s")
        return round(dt, 1)

    out = {}

    # 1. the current formulation: one int32 einsum (H pass only)
    out["einsum_i32_h"] = timed(
        "einsum_i32_h",
        jax.jit(lambda a, mm: jnp.einsum(
            "nhwc,now->nhoc", a, mm, preferred_element_type=jnp.int32)),
        x, m,
    )
    # 2. both passes (what apply_scale_batched compiles)
    out["einsum_i32_hv"] = timed(
        "einsum_i32_hv",
        jax.jit(lambda a, mm: jnp.einsum(
            "nhwc,noh->nowc",
            jnp.einsum("nhwc,now->nhoc", a, mm,
                       preferred_element_type=jnp.int32),
            mm, preferred_element_type=jnp.int32)),
        x, m,
    )
    # 3. f32 einsum at the same shape (is int32 the problem, or the shape?)
    xf, mf = x.astype(jnp.float32), m.astype(jnp.float32)
    out["einsum_f32_h"] = timed(
        "einsum_f32_h",
        jax.jit(lambda a, mm: jnp.einsum("nhwc,now->nhoc", a, mm)),
        xf, mf,
    )
    # 4. int32 dot via vmapped 2D matmul (collapse h*c into one dim)
    def vmm(a, mm):
        # a: [h, w, c] -> [w, h*c]; mm: [o, w];  mm @ a -> [o, h*c]
        hh, ww, cc = a.shape
        a2 = a.transpose(1, 0, 2).reshape(ww, hh * cc)
        return jax.lax.dot(mm, a2, preferred_element_type=jnp.int32).reshape(
            hh, hh, cc)

    out["vmap_dot_i32"] = timed(
        "vmap_dot_i32", jax.jit(jax.vmap(vmm)), x, m,
    )
    # 5. limb-split f32 MXU pair: coef = hi*2^11 + lo (11-bit limbs), pixel
    #    8-bit: every product < 2^19, per-tap row support ~7 so partial sums
    #    stay < 2^24 -> exact f32; recombine in int32
    def limb(a, mm):
        hi = jnp.floor_divide(mm, 1 << 11).astype(jnp.float32)
        lo = jnp.remainder(mm, 1 << 11).astype(jnp.float32)
        af = a.astype(jnp.float32)
        phi = jnp.einsum("nhwc,now->nhoc", af, hi)
        plo = jnp.einsum("nhwc,now->nhoc", af, lo)
        return (phi.astype(jnp.int32) << 11) + plo.astype(jnp.int32)

    out["limb_f32_h"] = timed("limb_f32_h", jax.jit(limb), x, m)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
