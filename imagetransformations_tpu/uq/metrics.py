"""Vectorized uncertainty scores over [B, C] logits (higher = more uncertain
unless noted). One fused pass per metric; everything composes under jit/vmap.

Parity map (reference -> here):
- shannon_entropy.py:53            -> shannon_entropy (log2)
- attacks/uncertainty/FINAL_cifar_corrupted.py:69-114
                                   -> msp/least_confidence/margin/ratio/
                                      doctor_alpha/doctor_beta/max_logit/energy
- pipeline/metrics/energy.py:36    -> energy_score (-logsumexp)
- pipeline/metrics/trellis_rey.py:25-31 -> tsallis_entropy / renyi_entropy
- pipeline/metrics/nll.py:10-76    -> nll_per_sample
- swag/metric.py:323               -> dempster_shafer
- pipeline/metrics/decision_change.py:27-58 -> decision_change
- pipeline/metrics/gradient_based.py:33-69  -> gradient_uncertainty
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def probs_of(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits, axis=-1)


def shannon_entropy(logits: jnp.ndarray, base2: bool = True) -> jnp.ndarray:
    """Predictive entropy -sum p log p (log2 per the reference)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(p * logp, axis=-1)
    return ent / jnp.log(2.0) if base2 else ent


def msp(logits: jnp.ndarray) -> jnp.ndarray:
    """Max softmax probability (higher = more confident)."""
    return jnp.max(probs_of(logits), axis=-1)


def least_confidence(logits: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - msp(logits)


def _top2(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    top = jax.lax.top_k(p, 2)[0]
    return top[..., 0], top[..., 1]


def margin(logits: jnp.ndarray) -> jnp.ndarray:
    """top1 - top2 prob (higher = more confident)."""
    p1, p2 = _top2(probs_of(logits))
    return p1 - p2


def ratio(logits: jnp.ndarray) -> jnp.ndarray:
    """top2 / top1 prob (higher = more uncertain)."""
    p1, p2 = _top2(probs_of(logits))
    return p2 / p1


def max_logit(logits: jnp.ndarray) -> jnp.ndarray:
    """Max raw logit (higher = more confident)."""
    return jnp.max(logits, axis=-1)


def energy_score(logits: jnp.ndarray) -> jnp.ndarray:
    """-logsumexp(logits); higher (closer to 0) = more uncertain."""
    return -jax.scipy.special.logsumexp(logits, axis=-1)


def doctor_alpha(logits: jnp.ndarray) -> jnp.ndarray:
    """(1 - g) / g with g = sum p^2 (Doctor alpha)."""
    g = jnp.sum(probs_of(logits) ** 2, axis=-1)
    return (1.0 - g) / g


def doctor_beta(logits: jnp.ndarray) -> jnp.ndarray:
    """(1 - pmax) / pmax (Doctor beta)."""
    pmax = msp(logits)
    return (1.0 - pmax) / pmax


def tsallis_entropy(logits: jnp.ndarray, q: float = 1.5) -> jnp.ndarray:
    """(1 - sum p^q) / (q - 1)   (trellis_rey.py:25-27)."""
    p = probs_of(logits)
    return (1.0 - jnp.sum(p**q, axis=-1)) / (q - 1.0)


def renyi_entropy(logits: jnp.ndarray, alpha: float = 1.5) -> jnp.ndarray:
    """log(sum p^a) / (1 - a)   (trellis_rey.py:29-31)."""
    p = probs_of(logits)
    return jnp.log(jnp.sum(p**alpha, axis=-1)) / (1.0 - alpha)


def dempster_shafer(logits: jnp.ndarray) -> jnp.ndarray:
    """K / (K + sum exp(logit))  (swag/metric.py:323)."""
    k = logits.shape[-1]
    return k / (k + jnp.sum(jnp.exp(logits), axis=-1))


def nll_per_sample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample negative log likelihood of the true class."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def brier_score(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample multiclass Brier score (swag/metric.py:160-186)."""
    p = probs_of(logits)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    return jnp.sum((p - onehot) ** 2, axis=-1)


# --------------------------------------------------------- model-in-the-loop


def decision_change(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    eps: float = 0.01,
) -> jnp.ndarray:
    """1 - MSP on a Gaussian-perturbed input (decision_change.py:27-58)."""
    noisy = x + eps * jax.random.normal(key, x.shape, x.dtype)
    return least_confidence(model_fn(noisy))


def gradient_uncertainty(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    eps: float = 0.01,
) -> jnp.ndarray:
    """L2 norm of d MSE(logits, logits_perturbed) / d x  (gradient_based.py:33-69).

    Vectorized: one vjp per batch instead of the reference's per-sample loop.
    """
    logits_clean = model_fn(x)
    noisy = x + eps * jax.random.normal(key, x.shape, x.dtype)

    def per_sample_loss(xi, target):
        out = model_fn(xi[None])[0]
        return jnp.mean((out - target) ** 2)

    grads = jax.vmap(jax.grad(per_sample_loss))(noisy, logits_clean)
    return jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1))


#: registry used by the evaluation sweep harness (FINAL_cifar_corrupted parity)
LOGIT_METRICS: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "shannon_entropy": shannon_entropy,
    "msp": msp,
    "least_confidence": least_confidence,
    "margin": margin,
    "ratio": ratio,
    "max_logit": max_logit,
    "energy": energy_score,
    "doctor_alpha": doctor_alpha,
    "doctor_beta": doctor_beta,
    "tsallis": tsallis_entropy,
    "renyi": renyi_entropy,
    "dempster_shafer": dempster_shafer,
}

#: metrics where HIGHER means MORE CONFIDENT (flip for error-detection AUC)
CONFIDENCE_METRICS = {"msp", "margin", "max_logit"}
