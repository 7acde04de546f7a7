#!/usr/bin/env python
"""FINAL_cifar_corrupted equivalent: corruption x severity x metric sweep."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.utils.config import SweepConfig
from imagetransformations_tpu.evalx import corruption_sweep
from imagetransformations_tpu.evalx.report import plot_severity_aucs, summary_table

if __name__ == "__main__":
    cfg = SweepConfig.from_cli()
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, *_ = get_model(xtr, ytr)
    mesh = None
    if cfg.data_parallel and len(jax.devices()) > 1:
        # each (corruption, severity) cell = one GSPMD dispatch over all chips
        from imagetransformations_tpu.pipeline.sharding import data_mesh
        mesh = data_mesh()
        print(f"data-parallel sweep over {mesh.shape['data']} devices")
    sweep = corruption_sweep(
        model_fn, to_model, jnp.asarray(xte), jnp.asarray(yte), jax.random.key(0),
        severities=tuple(range(1, cfg.severities + 1)),
        metric_names=tuple(cfg.metrics.split(",")),
        batch_size=cfg.batch_size,
        mesh=mesh,
    )
    df = summary_table(sweep)
    print(df.to_string(index=False))
    os.makedirs(cfg.out_dir, exist_ok=True)
    for m in cfg.metrics.split(","):
        plot_severity_aucs(sweep, m, os.path.join(cfg.out_dir, f"auc_{m}.png"))
    print(f"plots in {cfg.out_dir}")
