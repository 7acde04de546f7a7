#!/usr/bin/env python
"""cifar_iterative_* equivalent: flag uncertain inputs, reverse-FGSM refine."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.utils.config import RefineConfig
from imagetransformations_tpu.workflows import refinement_pipeline

if __name__ == "__main__":
    cfg = RefineConfig.from_cli()
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, *_ = get_model(xtr, ytr)
    out = refinement_pipeline(
        model_fn, to_model, jnp.asarray(xte), jnp.asarray(yte),
        eps=cfg.eps, max_iters=cfg.max_iters, msp_stop=cfg.msp_stop,
    )
    print(out)
