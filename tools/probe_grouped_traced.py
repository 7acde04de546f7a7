"""Same-process A/B of grouped vs log-only routing in the traced gray1
megakernel (see _shear_pass_traced_grouped). Run on the real chip.

Flag semantics (round 5): _TRACED_GROUP_ROWS{,2} == 0 means AUTO group
height (_auto_group_rows, the 1-bit (6,3) default at the 22.5-deg
budget); -1 disables grouping (pure log route); >0 pins the height.
Each setting here pins BOTH passes (pass 2 at gh//2, the historical
(8,4)/(16,8) pairing); ``0`` rows therefore measure the auto-grouped
config and ``-1`` rows the log-only baseline."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops.pallas import megakernel as mk

N, H, W = 32, 512, 512
K = 48


def bench_setting(gh: int, x, ang) -> dict:
    mk._TRACED_GROUP_ROWS = gh
    mk._TRACED_GROUP_ROWS2 = gh // 2 if gh > 0 else gh
    jax.clear_caches()  # force retrace so the module flags take effect

    def step(c, _):
        return (
            mk.fused_blur_rotate_batched(
                c, 1.5, ang, grayscale_out=True, stream=True
            ),
            None,
        )

    fn = jax.jit(
        lambda a: jnp.sum(
            jax.lax.scan(step, a, None, length=K)[0].astype(jnp.float32)
        )
    )
    t0 = time.perf_counter()
    float(fn(x))  # compile + warm
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    # subtract the RPC floor via a K=1 variant? keep simple: report raw
    per_batch = best / K
    gpix = N * H * W / per_batch / 1e9
    return {"gh": gh, "compile_s": round(compile_s, 1),
            "best_wall_s": round(best, 4), "gpix": round(gpix, 3)}


def main() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (N, H, W, 3), dtype=np.uint8))
    ang = jnp.asarray(np.linspace(-22.5, 22.5, N, dtype=np.float32))
    out = []
    gh_list = (
        tuple(int(g) for g in sys.argv[1:]) if len(sys.argv) > 1
        else (-1, 0, -1, 0, 16)
    )
    for gh in gh_list:
        r = bench_setting(gh, x, ang)
        print(json.dumps(r))
        out.append(r)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
