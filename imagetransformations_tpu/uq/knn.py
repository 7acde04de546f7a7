"""Deep k-NN uncertainty over train-feature neighborhoods.

Parity:
- pipeline/metrics/dknn2.py:38-106 — k=10 cosine neighbors of penultimate
  features; uncertainty = entropy of the neighbor-label histogram.
- pipeline/metrics/feature.py:38-80 — k=1 euclidean distance; prediction =
  nearest neighbor's label.

TPU-first: neighbor search is one [B,D]x[D,N] matmul + top_k on the MXU —
no sklearn, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def knn_label_entropy(
    train_feats: jnp.ndarray,
    train_labels: jnp.ndarray,
    query_feats: jnp.ndarray,
    k: int = 10,
    num_classes: int = 10,
    metric: str = "cosine",
    base2: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(uncertainty[B], majority_label[B]) from k nearest train features."""
    if metric == "cosine":
        sims = _normalize(query_feats) @ _normalize(train_feats).T
        _, idx = jax.lax.top_k(sims, k)
    else:
        d2 = (
            jnp.sum(query_feats**2, -1, keepdims=True)
            - 2.0 * query_feats @ train_feats.T
            + jnp.sum(train_feats**2, -1)[None, :]
        )
        _, idx = jax.lax.top_k(-d2, k)
    neigh = train_labels[idx]  # [B, k]
    hist = jnp.sum(jax.nn.one_hot(neigh, num_classes), axis=1)  # [B, C]
    p = hist / k
    logp = jnp.where(p > 0, jnp.log2(p) if base2 else jnp.log(p), 0.0)
    ent = -jnp.sum(p * logp, axis=-1)
    return ent, jnp.argmax(hist, axis=-1)


def nearest_feature_distance(
    train_feats: jnp.ndarray,
    train_labels: jnp.ndarray,
    query_feats: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(euclidean distance to nearest train feature, its label) — feature.py."""
    d2 = (
        jnp.sum(query_feats**2, -1, keepdims=True)
        - 2.0 * query_feats @ train_feats.T
        + jnp.sum(train_feats**2, -1)[None, :]
    )
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0], 0.0))
    return dist, train_labels[idx]
