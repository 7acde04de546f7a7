"""Last-layer diagonal Laplace approximation (no external `laplace` package).

Parity with pipeline/metrics/laplace_metric.py:39-68: fit a diagonal Gaussian
posterior over the LAST layer's weights (precision = prior + diagonal GGN
accumulated over the train set), score test samples by the predictive
variance of sampled-head logits.

TPU-first: the GGN diagonal for a softmax head has the closed form
  H_diag[w_{dc}] = sum_n phi_nd^2 * p_nc (1 - p_nc)
— one einsum over the feature/prob batch; predictive sampling is a vmap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class LaplaceState:
    w_mean: jnp.ndarray  # [D, C]
    b_mean: jnp.ndarray  # [C]
    w_var: jnp.ndarray  # [D, C] posterior variance
    b_var: jnp.ndarray  # [C]


def fit(
    features: jnp.ndarray,  # [N, D] penultimate features (train set)
    w: jnp.ndarray,  # [D, C] trained head weights
    b: jnp.ndarray,  # [C]
    prior_precision: float = 1.0,
) -> LaplaceState:
    logits = features @ w + b
    p = jax.nn.softmax(logits, axis=-1)
    h = p * (1.0 - p)  # [N, C] per-class GGN factor
    w_prec = prior_precision + jnp.einsum("nd,nc->dc", features**2, h)
    b_prec = prior_precision + jnp.sum(h, axis=0)
    return LaplaceState(w, b, 1.0 / w_prec, 1.0 / b_prec)


def predictive(
    state: LaplaceState,
    features: jnp.ndarray,  # [B, D]
    key: jax.Array,
    num_samples: int = 30,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean probs [B,C], predictive variance [B]) via weight sampling."""

    def one(k):
        kw, kb = jax.random.split(k)
        w = state.w_mean + jnp.sqrt(state.w_var) * jax.random.normal(
            kw, state.w_mean.shape
        )
        b = state.b_mean + jnp.sqrt(state.b_var) * jax.random.normal(
            kb, state.b_mean.shape
        )
        return jax.nn.softmax(features @ w + b, axis=-1)

    probs = jax.vmap(one)(jax.random.split(key, num_samples))  # [S, B, C]
    mean_p = jnp.mean(probs, axis=0)
    pred = jnp.argmax(mean_p, axis=-1)
    var = jnp.var(
        jnp.take_along_axis(probs, pred[None, :, None], axis=-1)[..., 0], axis=0
    )
    return mean_p, var


def closed_form_variance(state: LaplaceState, features: jnp.ndarray) -> jnp.ndarray:
    """Analytic logit variance sum (laplace_metric.py predictive variance)."""
    v = jnp.einsum("bd,dc->bc", features**2, state.w_var) + state.b_var
    return jnp.sum(v, axis=-1)
