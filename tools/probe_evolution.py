"""One real evolutionary_search run on-device (VERDICT r3 item 9).

population 15 x 3 generations with the reference's pretrained ResNet-56
on a CIFAR-shaped batch (reference imagenette images at 32x32), mirroring
pipenline/cifar_image_transformations.py:232-289. Reports wall-clock,
distinct-genome compile count, and a warm re-run (same process, caches
hot) to split compile latency from eval throughput.

Run (TPU): python tools/probe_evolution.py [--pop 15] [--gens 3] [--n 256]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    pop = int(sys.argv[sys.argv.index("--pop") + 1]) if "--pop" in sys.argv else 15
    gens = int(sys.argv[sys.argv.index("--gens") + 1]) if "--gens" in sys.argv else 3
    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 256

    import jax
    import jax.numpy as jnp

    from imagetransformations_tpu.adapt import evolution
    from tools.full_severity_sweep import load_dataset, load_model

    model_fn, to_model_space = load_model()[:2]
    imgs = jnp.asarray(load_dataset(limit=(n + 1) // 2)[:n])

    def run(seed):
        t0 = time.time()
        best = evolution.evolutionary_search(
            model_fn, to_model_space, imgs,
            population_size=pop, generations=gens, seed=seed,
        )
        return time.time() - t0, best

    cold_s, best = run(0)
    warm_s, _ = run(0)  # identical genome sequence, every executable cached
    out = {
        "pop": pop, "gens": gens, "batch": n,
        "cold_s": round(cold_s, 1),
        "warm_s": round(warm_s, 1),
        "best_fitness": round(float(best.fitness), 4),
        "best_genome": [[op, val] for op, val in best.genome],
        "device": str(jax.devices()[0]),
        # universal switch executables (one per genome length) vs per-genome
        # fallback compiles — the round-5 fix target was 33 per-genome
        # compiles = 358.9 s cold; universal = 1 compile
        "universal_executables": len(evolution._UNIVERSAL_CACHE._data),
        "per_genome_compiles": len(evolution._FITNESS_CACHE._data),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
