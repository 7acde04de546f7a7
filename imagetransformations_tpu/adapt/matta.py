"""MATTA/VATTA-style per-policy weighted TTA + rho bisection.

Parity with fall_2025/mata_initial_aaryaa_02.py:
- apply_matta / apply_vatta (:205-214): mix per-policy prob vectors with a
  learned weight MATRIX (per policy x class for MATTA; per policy scalar for
  VATTA), renormalized.
- find_optimal_rho (:82-92): bisection on the mixing coefficient rho between
  the original and augmented predictive distributions targeting a
  calibration criterion.
- evaluation on Brier / NLL / ECE (:94-105) -> uq.calibration.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.uq.calibration import ece


def apply_vatta(view_probs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """[V,B,C] probs + per-policy scalar weights [V] -> mixed [B,C]."""
    w = jax.nn.softmax(weights)
    return jnp.einsum("v,vbc->bc", w, view_probs)


def apply_matta(view_probs: jnp.ndarray, weight_matrix: jnp.ndarray) -> jnp.ndarray:
    """[V,B,C] probs + per-(policy,class) weights [V,C] -> mixed [B,C]."""
    w = jax.nn.softmax(weight_matrix, axis=0)  # normalize across policies per class
    mixed = jnp.einsum("vc,vbc->bc", w, view_probs)
    return mixed / jnp.maximum(jnp.sum(mixed, axis=-1, keepdims=True), 1e-12)


def find_optimal_rho(
    probs_orig: jnp.ndarray,
    probs_aug: jnp.ndarray,
    labels: jnp.ndarray,
    criterion: Callable | None = None,
    iters: int = 20,
) -> float:
    """Bisection over rho in [0,1] minimizing ECE of
    rho*orig + (1-rho)*aug (mata_initial_aaryaa_02.py:82-92)."""
    crit = criterion or (lambda p: float(ece(p, labels)))

    def value(r):
        return crit(r * probs_orig + (1.0 - r) * probs_aug)

    lo, hi = 0.0, 1.0
    for _ in range(iters):
        m1 = lo + (hi - lo) / 3
        m2 = hi - (hi - lo) / 3
        if value(m1) < value(m2):
            hi = m2
        else:
            lo = m1
    return (lo + hi) / 2


def fit_matta_weights(
    view_probs: jnp.ndarray, labels: jnp.ndarray, steps: int = 200, lr: float = 0.05,
    per_class: bool = True,
) -> np.ndarray:
    """Learn MATTA ([V,C]) or VATTA ([V]) weights by NLL descent."""
    import optax

    v, b, c = view_probs.shape
    w = jnp.zeros((v, c) if per_class else (v,))
    mix = apply_matta if per_class else apply_vatta

    def loss(w):
        p = mix(view_probs, w)
        lp = jnp.log(jnp.clip(p, 1e-12, 1.0))
        return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=1))

    tx = optax.adam(lr)
    state = tx.init(w)

    @jax.jit
    def step(carry, _):
        w, st = carry
        g = jax.grad(loss)(w)
        updates, st = tx.update(g, st)
        return (w + updates, st), None

    (w, _), _ = jax.lax.scan(step, (w, state), None, length=steps)
    return np.asarray(w)
