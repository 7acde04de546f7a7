"""Mahalanobis-distance uncertainty on penultimate features.

Parity:
- pipeline/metrics/mahalanobis.py:32-80 — class-agnostic: train-feature mean +
  pinv covariance (+1e-4 ridge), per-sample quadratic form.
- pipeline/cifar_iterative_mc.py:80-149 — per-class means with shared
  covariance, min over classes.

TPU-first: the quadratic form is one [B,D] @ [D,D] @ [D,B] matmul chain on the
MXU instead of the reference's per-sample Python loop
(mahalanobis.py:70-80, cifar_iterative_mc.py:143-146).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class MahalanobisState:
    mean: jnp.ndarray  # [D] or [K, D]
    precision: jnp.ndarray  # [D, D]
    per_class: bool = False


def fit(features: jnp.ndarray, labels: jnp.ndarray | None = None,
        num_classes: int | None = None, ridge: float = 1e-4) -> MahalanobisState:
    """Fit mean(s) + inverse covariance from train features [N, D].

    labels=None -> class-agnostic (mahalanobis.py); with labels ->
    per-class means + tied covariance (cifar_iterative_mc.py:80-119).
    """
    feats = features.astype(jnp.float32)
    d = feats.shape[-1]
    if labels is None:
        mean = jnp.mean(feats, axis=0)
        centered = feats - mean
        cov = centered.T @ centered / (feats.shape[0] - 1)
        precision = jnp.linalg.pinv(cov + ridge * jnp.eye(d))
        return MahalanobisState(mean, precision, per_class=False)
    k = int(num_classes or int(jax.device_get(jnp.max(labels))) + 1)
    onehot = jax.nn.one_hot(labels, k)  # [N, K]
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)  # [K]
    means = (onehot.T @ feats) / counts[:, None]  # [K, D]
    centered = feats - means[labels]
    cov = centered.T @ centered / (feats.shape[0] - k)
    precision = jnp.linalg.pinv(cov + ridge * jnp.eye(d))
    return MahalanobisState(means, precision, per_class=True)


def score(state: MahalanobisState, features: jnp.ndarray) -> jnp.ndarray:
    """Mahalanobis distance per sample -> [B] (higher = more OOD/uncertain).

    Precision.HIGHEST: the TPU MXU truncates default-precision f32 einsum
    inputs to bf16 (8 mantissa bits); the quadratic form's ranks — which
    are all AUROC consumes — are sensitive near ties, so keep true-f32
    accumulation to match the reference's full-precision math. Cost is
    negligible at feature dims (D=64).
    """
    hi = jax.lax.Precision.HIGHEST
    f = features.astype(jnp.float32)
    if not state.per_class:
        c = f - state.mean
        return jnp.sqrt(jnp.maximum(
            jnp.einsum("bd,de,be->b", c, state.precision, c, precision=hi), 0.0
        ))
    # [B, K, D] diffs -> min over classes of the quadratic form
    diffs = f[:, None, :] - state.mean[None, :, :]
    q = jnp.einsum("bkd,de,bke->bk", diffs, state.precision, diffs, precision=hi)
    return jnp.sqrt(jnp.maximum(jnp.min(q, axis=1), 0.0))
