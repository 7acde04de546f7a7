#!/usr/bin/env python
"""cifar_image_transformations driver equivalent: evolutionary transform search."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from _common import get_data, get_model
from imagetransformations_tpu.adapt.evolution import evolutionary_search

if __name__ == "__main__":
    xtr, ytr, xte, yte = get_data(type("C", (), {"data_root": "./data"})())
    model_fn, to_model, *_ = get_model(xtr, ytr)
    best = evolutionary_search(model_fn, to_model, jnp.asarray(xte[:64]),
                               population_size=12, generations=3)
    print("best fitness:", best.fitness)
    print("best chain:", best.genome)
