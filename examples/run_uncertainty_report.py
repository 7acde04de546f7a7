#!/usr/bin/env python
"""pipeline/metrics equivalents: all metrics + thresholds + histogram PNGs."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.utils.config import FrameworkConfig
from imagetransformations_tpu.workflows import uncertainty_report

if __name__ == "__main__":
    cfg = FrameworkConfig.from_cli()
    xtr, ytr, xte, yte = get_data(cfg)
    model_fn, to_model, *_ = get_model(xtr, ytr)
    rep = uncertainty_report(model_fn, to_model, jnp.asarray(xte), jnp.asarray(yte), out_dir="./plots")
    print(f"accuracy: {rep['accuracy']:.4f}")
    for m, row in rep["thresholds"].items():
        print(f"  {m:18s} thr={row['threshold']:+.4f} auroc={row['auroc']:.3f} flagged={row['n_flagged']}")
