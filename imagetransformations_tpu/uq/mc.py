"""Monte-Carlo sampling uncertainty: MC-dropout, BALD, layer uncertainty,
ensembles — vmapped over the sample axis (one compiled call, no Python loops).

Parity:
- mutual_info.py:35-88 — dropout p=0.5 after activations, T=50, MI = BALD
- cifar_iterative_mc.py:20,41-78 — T=50 predictive entropy; layer uncertainty
  = feature variance across stochastic forward passes
- ensemble.py:49-123 — deep-ensemble variance of the predicted-class prob
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from imagetransformations_tpu.uq.metrics import probs_of


def mc_sample_logits(
    stochastic_fn: Callable[[jax.Array, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    num_samples: int = 50,
) -> jnp.ndarray:
    """Stack T stochastic forward passes -> [T, B, C] logits.

    ``stochastic_fn(key, x)`` is any randomized forward (dropout rng, BNN
    weight sample, SWAG draw, ...).
    """
    keys = jax.random.split(key, num_samples)
    return jax.vmap(lambda k: stochastic_fn(k, x))(keys)


def dropout_fn(model_apply, variables, rate: float = 0.5):
    """Wrap a flax apply into a dropout-stochastic forward (MC-dropout).

    The model must accept a 'dropout' rng (our models insert dropout when
    ``deterministic=False`` is supported); for models without dropout layers
    use ``feature_noise_fn``.
    """

    def fn(key, x):
        return model_apply(variables, x, rngs={"dropout": key})

    return fn


def predictive_entropy(mc_logits: jnp.ndarray, base2: bool = True) -> jnp.ndarray:
    """H[ mean_t p_t ]  -> [B]."""
    p = jnp.mean(probs_of(mc_logits), axis=0)
    logp = jnp.log(jnp.clip(p, 1e-12, 1.0))
    ent = -jnp.sum(p * logp, axis=-1)
    return ent / jnp.log(2.0) if base2 else ent


def expected_entropy(mc_logits: jnp.ndarray, base2: bool = True) -> jnp.ndarray:
    """mean_t H[p_t]  -> [B]."""
    p = probs_of(mc_logits)
    logp = jnp.log(jnp.clip(p, 1e-12, 1.0))
    ent = -jnp.sum(p * logp, axis=-1)
    ent = jnp.mean(ent, axis=0)
    return ent / jnp.log(2.0) if base2 else ent


def bald(mc_logits: jnp.ndarray, base2: bool = True) -> jnp.ndarray:
    """Mutual information = predictive - expected entropy (mutual_info.py:78-88)."""
    return predictive_entropy(mc_logits, base2) - expected_entropy(mc_logits, base2)


def mc_variance(mc_logits: jnp.ndarray) -> jnp.ndarray:
    """Variance of the BMA-predicted-class probability across samples.

    cifar_swag.py:216-241 'expected variance' / ensemble.py:109-123.
    """
    p = probs_of(mc_logits)  # [T,B,C]
    mean_p = jnp.mean(p, axis=0)
    pred = jnp.argmax(mean_p, axis=-1)  # [B]
    p_cls = jnp.take_along_axis(p, pred[None, :, None], axis=-1)[..., 0]  # [T,B]
    return jnp.var(p_cls, axis=0)


def jensen_shannon(mc_logits: jnp.ndarray) -> jnp.ndarray:
    """Generalized JSD across samples == BALD in nats (cifar_swag.py:231)."""
    return bald(mc_logits, base2=False)


def layer_uncertainty(mc_features: jnp.ndarray) -> jnp.ndarray:
    """Mean feature variance across stochastic passes (cifar_iterative_mc.py:41-78).

    mc_features: [T, B, D] penultimate features -> [B].
    """
    return jnp.mean(jnp.var(mc_features, axis=0), axis=-1)


def ensemble_logits(apply_fn, variables_list, x) -> jnp.ndarray:
    """Stack member logits [M, B, C]; members share architecture.

    TPU-first: if the variable pytrees are stacked (leading member axis) this
    becomes a single vmapped call.
    """
    try:
        stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *variables_list)
        return jax.vmap(lambda v: apply_fn(v, x))(stacked)
    except Exception:
        return jnp.stack([apply_fn(v, x) for v in variables_list])
