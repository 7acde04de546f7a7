"""Where do apply_all's 376 s of cold compile go? (VERDICT r3 item 5)

Times the FIRST call (compile + run) of the single-type apply_all
executable for each of the 8 transform types at 32x512x512, then the full
8-type combined executable. PERF.md says the combined compile is roughly
the sum of per-op compiles, so the fix is to attack the dominant ops.

Run: python tools/probe_applyall_compile.py [--h 512]
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

from imagetransformations_tpu.pipeline.batch import apply_all_transformations

TYPES = (
    "scale", "rotation", "lighten_darken", "gaussian_noise",
    "translation", "contrast", "blur", "shear",
)


def main() -> None:
    h = 512
    if "--h" in sys.argv:
        h = int(sys.argv[sys.argv.index("--h") + 1])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (32, h, h, 3), dtype=np.uint8))
    key = jax.random.key(0)
    out = {}
    for t in TYPES:
        t0 = time.time()
        res = apply_all_transformations(imgs, key, types=(t,))
        jax.block_until_ready(res[t][1])
        float(jnp.sum(res[t][1][:1, :8, :8].astype(jnp.float32)))
        dt = time.time() - t0
        out[t] = round(dt, 1)
        print(f"{t}: first call {dt:.1f} s")
    t0 = time.time()
    res = apply_all_transformations(imgs, key)
    float(jnp.sum(res["blur"][1][:1, :8, :8].astype(jnp.float32)))
    out["combined_8type"] = round(time.time() - t0, 1)
    print(f"combined 8-type: first call {out['combined_8type']:.1f} s "
          "(fresh executable; sub-graphs may hit XLA-internal caches "
          "warmed by the per-type calls)")
    print(json.dumps(out))


def main_split_per_op() -> None:
    """Per-type cold timing of the split (fused=False) path — times each
    type's FIRST call through _apply_all_split in isolation so the 233 s
    split cold total can be attributed. Run in a FRESH process:
    python ... --split-per-op [--h 512]"""
    h = 512
    if "--h" in sys.argv:
        h = int(sys.argv[sys.argv.index("--h") + 1])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (32, h, h, 3), dtype=np.uint8))
    key = jax.random.key(0)
    out = {}
    for t in TYPES:
        t0 = time.time()
        res = apply_all_transformations(imgs, key, types=(t,), fused=False)
        float(jnp.sum(res[t][1][:1, :8, :8].astype(jnp.float32)))
        out[t] = round(time.time() - t0, 1)
        print(f"{t}: split first call {out[t]:.1f} s", flush=True)
    print(
        "note: types run sequentially in ONE process, so later types reuse "
        "XLA-internal sub-graph caches warmed by earlier ones — per-op "
        "attribution can under-report shared compile for later types; true "
        "isolation needs one fresh process per type (ADVICE r4)."
    )
    print(json.dumps(out))


def main_split() -> None:
    """Cold + steady timing of the fused=False escape hatch. Run in a FRESH
    process (no warmed op executables): python ... --split [--h 512]"""
    h = 512
    if "--h" in sys.argv:
        h = int(sys.argv[sys.argv.index("--h") + 1])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (32, h, h, 3), dtype=np.uint8))
    key = jax.random.key(0)
    t0 = time.time()
    res = apply_all_transformations(imgs, key, fused=False)
    float(jnp.sum(res["blur"][1][:1, :8, :8].astype(jnp.float32)))
    cold = time.time() - t0
    t0 = time.time()
    reps = 5
    for i in range(reps):
        res = apply_all_transformations(imgs, jax.random.key(i), fused=False)
    float(jnp.sum(res["blur"][1][:1, :8, :8].astype(jnp.float32)))
    steady = (time.time() - t0) / reps
    print(json.dumps({"split_cold_s": round(cold, 1),
                      "split_steady_s": round(steady, 3), "h": h}))


if __name__ == "__main__" and "--split-per-op" in sys.argv:
    main_split_per_op()
    sys.exit(0)


if __name__ == "__main__" and "--split" in sys.argv:
    main_split()
    sys.exit(0)


if __name__ == "__main__":
    main()
