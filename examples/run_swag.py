#!/usr/bin/env python
"""cifar_swag equivalent: SWAG collection -> BMA uncertainty."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.utils.config import SwagConfig
from imagetransformations_tpu.workflows import swag_pipeline

if __name__ == "__main__":
    cfg = SwagConfig.from_cli()
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, variables, model = get_model(xtr, ytr)
    xb = to_model(jnp.asarray(xtr)); yb = jnp.asarray(ytr)
    batches = [(xb[i:i+128], yb[i:i+128]) for i in range(0, len(yb), 128)]
    out = swag_pipeline(
        model.apply,
        lambda v, x, train, mutable: model.apply(v, x, train, mutable=mutable),
        variables["params"], variables["batch_stats"],
        lambda: batches, to_model(jnp.asarray(xte[:64])), jax.random.key(0),
        num_weight_samples=min(cfg.weight_samples, 8),
        eval_mc_samples=min(cfg.eval_mc_samples, 4), max_rank=cfg.max_rank,
        lr=cfg.lr,
    )
    import numpy as np
    print("BMA entropy   mean:", float(out["entropy"].mean()))
    print("1-max prob    mean:", float(out["one_minus_max"].mean()))
    print("JSD (BALD)    mean:", float(out["jsd"].mean()))
    print("class var     mean:", float(out["variance"].mean()))
