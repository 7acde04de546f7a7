"""ODIN & Generalized-ODIN: temperature scaling + input preprocessing.

Parity:
- attacks/uncertainty/uncertainty_metrics.py:69-94 (calculate_odin) and
  cifar_odin_uncertin.py:175-176 — T=1000, eps=0.0014: one signed-gradient
  step that INCREASES the max softmax score, then rescored at temperature T.
- fall_2025/generalizedOdin2.py:29-56 — eps* grid search maximizing mean MSP.

TPU-first: the per-batch gradient step is one jax.grad call; the eps grid
search is a vmap over eps (single compiled executable).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def odin_score(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    temperature: float = 1000.0,
    eps: float = 0.0014,
) -> jnp.ndarray:
    """ODIN max-softmax score after input preprocessing -> [B] (higher=ID)."""

    def neg_score(xi):
        logits = model_fn(xi) / temperature
        return -jnp.sum(jnp.max(jax.nn.log_softmax(logits, axis=-1), axis=-1))

    g = jax.grad(neg_score)(x)
    x_pre = x - eps * jnp.sign(g)
    logits = model_fn(x_pre) / temperature
    return jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)


def odin_uncertainty(model_fn, x, temperature: float = 1000.0, eps: float = 0.0014):
    """1 - ODIN score (higher = more uncertain)."""
    return 1.0 - odin_score(model_fn, x, temperature, eps)


def generalized_odin_search(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x_val: jnp.ndarray,
    eps_grid=(0.0025, 0.005, 0.01, 0.02, 0.04, 0.08),
    temperature: float = 1000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick eps* maximizing mean perturbed MSP on validation data.

    Returns (eps_star, mean_scores_per_eps). generalizedOdin2.py:29-56.
    """
    eps_arr = jnp.asarray(eps_grid, jnp.float32)

    def mean_score(eps):
        return jnp.mean(odin_score(model_fn, x_val, temperature, eps))

    scores = jnp.stack([mean_score(e) for e in eps_arr])
    return eps_arr[jnp.argmax(scores)], scores
