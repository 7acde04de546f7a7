"""SWAG (SWA-Gaussian) posterior — functional pytree state, vmapped sampling.

TPU-native redesign of the reference's SWAGWrapper subsystem
(attacks/cifar10-unvertainty/swag/swag_wrapper.py):

- ``SwagState`` holds the running SWA mean, second moment, and a max-rank
  low-rank deviation ring buffer *as stacked pytrees* (swag_wrapper.py:403-447
  keeps them as per-parameter module buffers on CPU).
- ``update`` is a pure (state, params) -> state step (update_stats parity,
  swag_wrapper.py:227-266).
- ``sample`` draws theta = mean + sigma_diag/sqrt(2) * z1 +
  D z2 / sqrt(2(K-1)) (swag_wrapper.py:333-383, reference scaling; the
  diagonal sqrt(2) tempering applies only with the low-rank half). Drawing
  S samples is a vmap inside ONE jitted dispatch, not a Python loop; the
  scale factors ride as runtime operands so tempering sweeps never
  retrace.
- ``refresh_batch_stats`` re-estimates BatchNorm statistics with a scanned
  forward pass (swag_wrapper.py:484-533's full train-loader pass).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SwagState:
    mean: Any  # pytree like params
    sq_mean: Any  # pytree like params
    deviations: Any  # pytree with leading [max_rank] axis (ring buffer)
    n_models: jnp.ndarray  # scalar int32
    max_rank: int = 20

    def tree_flatten(self):
        return (self.mean, self.sq_mean, self.deviations, self.n_models), (self.max_rank,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, max_rank=aux[0])


jax.tree_util.register_pytree_node(
    SwagState, SwagState.tree_flatten, SwagState.tree_unflatten
)


def init(params, max_rank: int = 20) -> SwagState:
    zeros_like = lambda p: jnp.zeros_like(p)
    dev = jax.tree_util.tree_map(
        lambda p: jnp.zeros((max_rank,) + p.shape, p.dtype), params
    )
    return SwagState(
        mean=jax.tree_util.tree_map(jnp.array, params),
        sq_mean=jax.tree_util.tree_map(lambda p: p * p, params),
        deviations=dev,
        n_models=jnp.int32(0),
        max_rank=max_rank,
    )


def update(state: SwagState, params) -> SwagState:
    """One collection step: running moments + push deviation column."""
    n = state.n_models.astype(jnp.float32)
    new_mean = jax.tree_util.tree_map(
        lambda m, p: (m * n + p) / (n + 1.0), state.mean, params
    )
    new_sq = jax.tree_util.tree_map(
        lambda s, p: (s * n + p * p) / (n + 1.0), state.sq_mean, params
    )
    slot = jnp.mod(state.n_models, state.max_rank)
    new_dev = jax.tree_util.tree_map(
        lambda d, p, m: jax.lax.dynamic_update_index_in_dim(d, p - m, slot, 0),
        state.deviations,
        params,
        new_mean,
    )
    return SwagState(new_mean, new_sq, new_dev, state.n_models + 1, state.max_rank)


def _resolve_diag_scale(diag_scale, use_lowrank: bool) -> np.float32:
    """Reference scaling (swag_wrapper.py:362-374): the diagonal term is
    ``std * z`` divided by sqrt(2) ONLY when the low-rank half is used (so
    each half contributes half the posterior variance), and unscaled
    without it. An explicit float tempers the diagonal instead. Returned
    as a numpy scalar so the jitted entry points take it as a runtime
    operand (no retrace per value)."""
    if diag_scale is None:
        diag_scale = 1.0 / math.sqrt(2.0) if use_lowrank else 1.0
    return np.float32(diag_scale)


def _sample_impl(
    state: SwagState,
    key: jax.Array,
    diag_scale,
    lowrank_scale,
    use_lowrank: bool,
):
    k1, k2 = jax.random.split(key)
    leaves, treedef = jax.tree_util.tree_flatten(state.mean)
    keys1 = list(jax.random.split(k1, len(leaves)))
    rank_eff = jnp.minimum(state.n_models, state.max_rank).astype(jnp.float32)
    z2 = jax.random.normal(k2, (state.max_rank,))
    # mask unfilled ring-buffer slots
    mask = (jnp.arange(state.max_rank) < jnp.minimum(state.n_models, state.max_rank)).astype(
        jnp.float32
    )
    z2 = z2 * mask
    denom = jnp.sqrt(2.0 * jnp.maximum(rank_eff - 1.0, 1.0))

    def sample_leaf(mean, sq, dev, k):
        var = jnp.clip(sq - mean * mean, 1e-30, None)
        diag_term = jnp.sqrt(var) * jax.random.normal(k, mean.shape)
        low = jnp.tensordot(z2, dev, axes=1) / denom if use_lowrank else 0.0
        return mean + diag_scale * diag_term + lowrank_scale * low

    sq_leaves = jax.tree_util.tree_leaves(state.sq_mean)
    dev_leaves = jax.tree_util.tree_leaves(state.deviations)
    out = [
        sample_leaf(m, s, d, k)
        for m, s, d, k in zip(leaves, sq_leaves, dev_leaves, keys1)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


_sample_jit = functools.partial(jax.jit, static_argnames=("use_lowrank",))(
    _sample_impl
)


@functools.partial(jax.jit, static_argnames=("num_samples", "use_lowrank"))
def _sample_many_jit(state, key, diag_scale, lowrank_scale, num_samples, use_lowrank):
    keys = jax.random.split(key, num_samples)
    return jax.vmap(
        lambda k: _sample_impl(state, k, diag_scale, lowrank_scale, use_lowrank)
    )(keys)


def sample(
    state: SwagState,
    key: jax.Array,
    diag_scale: float | None = None,
    lowrank_scale: float = 1.0,
    use_lowrank: bool = True,
):
    """Draw one weight sample theta from the SWAG posterior (jitted; the
    scale factors ride as runtime operands, see ``_resolve_diag_scale``)."""
    return _sample_jit(
        state,
        key,
        _resolve_diag_scale(diag_scale, use_lowrank),
        np.float32(lowrank_scale),
        use_lowrank=use_lowrank,
    )


def sample_many(
    state: SwagState,
    key: jax.Array,
    num_samples: int,
    diag_scale: float | None = None,
    lowrank_scale: float = 1.0,
    use_lowrank: bool = True,
):
    """Stacked pytree of S samples (leading axis) — ONE jitted vmapped
    dispatch (a Python loop of eager draws would pay ~40 ms per op per
    leaf on the tunneled runtime)."""
    return _sample_many_jit(
        state,
        key,
        _resolve_diag_scale(diag_scale, use_lowrank),
        np.float32(lowrank_scale),
        num_samples=int(num_samples),
        use_lowrank=use_lowrank,
    )


def refresh_batch_stats(
    apply_train: Callable[[Any, jnp.ndarray], Any],
    params,
    init_batch_stats,
    batches: jnp.ndarray,
):
    """Re-estimate BN running stats for sampled weights over [S?, B, H, W, C].

    ``apply_train(variables, x)`` must run the model with
    ``use_running_average=False`` and ``mutable=['batch_stats']`` returning
    (out, {'batch_stats': ...}). Scanned over the batch axis.
    """

    def body(stats, x):
        _, upd = apply_train({"params": params, "batch_stats": stats}, x)
        return upd["batch_stats"], None

    stats, _ = jax.lax.scan(body, init_batch_stats, batches)
    return stats


def bma_logits(
    apply_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """[S, B, C] logits over S stacked weight samples (forward parity,
    swag_wrapper.py:63-96 returns {'logit': [B,S,C]})."""
    return jax.vmap(lambda p: apply_fn(p, x))(stacked_params)
