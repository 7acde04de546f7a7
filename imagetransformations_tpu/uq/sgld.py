"""SGLD (stochastic gradient Langevin dynamics) posterior sampling.

Parity with pipeline/metrics/sgsc.py:28-57: SGD update plus Gaussian noise
with std sqrt(2 * lr * temperature); weight snapshots collected every K
steps; predictive entropy over the snapshot ensemble (:103-135).

TPU-first: the optimizer is an optax GradientTransformation; snapshots are a
stacked pytree so the S-sample predictive pass is one vmap (the reference
runs one forward per sample per image in Python).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGLDState(NamedTuple):
    key: jax.Array


def sgld(learning_rate: float, temperature: float = 1.0, seed: int = 0):
    """optax transformation: grad step + N(0, sqrt(2*lr*T)) noise."""

    def init_fn(params):
        return SGLDState(key=jax.random.key(seed))

    def update_fn(grads, state, params=None):
        key, sub = jax.random.split(state.key)
        noise_std = jnp.sqrt(2.0 * learning_rate * temperature)
        leaves, treedef = jax.tree_util.tree_flatten(grads)
        keys = list(jax.random.split(sub, len(leaves)))
        updates = [
            -learning_rate * g + noise_std * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(leaves, keys)
        ]
        return jax.tree_util.tree_unflatten(treedef, updates), SGLDState(key)

    return optax.GradientTransformation(init_fn, update_fn)


def stack_snapshots(snapshots: list):
    """List of param pytrees -> one stacked pytree (leading sample axis)."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *snapshots)


def predictive_logits(apply_fn, stacked_params, x: jnp.ndarray) -> jnp.ndarray:
    """[S, B, C] logits over SGLD weight samples — one vmapped call."""
    return jax.vmap(lambda p: apply_fn(p, x))(stacked_params)
