#!/usr/bin/env python
"""TENT_Pipelines equivalent: corruption x severity x protocol sweep."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.utils.config import TentConfig
from imagetransformations_tpu.workflows import tent_sweep

if __name__ == "__main__":
    cfg = TentConfig.from_cli()
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, variables, model = get_model(xtr, ytr)

    def apply_bn_train(params, x):
        # BN in batch-statistics mode, stats not persisted (TENT behavior)
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"],
        )
        return out

    res = tent_sweep(
        apply_bn_train, variables["params"], ("gaussian_noise", "brightness"),
        (1, 3, 5), jnp.asarray(xte), jnp.asarray(yte), to_model,
        jax.random.key(0), lr=cfg.lr,
        protocols=("baseline", cfg.protocol) if cfg.protocol != "baseline" else ("baseline",),
    )
    for corr, sevmap in res.items():
        for sev, row in sevmap.items():
            print(f"{corr:16s} sev={sev}  " + "  ".join(f"{k}={v:.3f}" for k, v in row.items()))
