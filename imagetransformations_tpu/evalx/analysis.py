"""Prediction-flip analysis + failure-prediction heads + symbolic rules.

Parity map:
- fall_2025/tent_finalanalysis.py:120-227 (compute_flip_analysis) ->
  ``flip_analysis``: which predictions an adaptation flips correct<->incorrect.
- fall_2025/shannonentropy_fullclassifiers.py -> ``FailureHead``: a small MLP
  on {entropy, margin, penultimate features} trained to predict
  misclassification.
- fall_2025/2026shannon_symbollic.py:75-89 -> ``superclass_confusion_rule``:
  flag a sample when its top-k classes span multiple superclasses.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax


def flip_analysis(
    logits_before: jnp.ndarray, logits_after: jnp.ndarray, labels: jnp.ndarray
) -> dict:
    """Count prediction flips induced by an intervention."""
    p0 = jnp.argmax(logits_before, axis=-1)
    p1 = jnp.argmax(logits_after, axis=-1)
    c0 = p0 == labels
    c1 = p1 == labels
    return {
        "n": int(labels.shape[0]),
        "acc_before": float(jnp.mean(c0)),
        "acc_after": float(jnp.mean(c1)),
        "fixed": int(jnp.sum(~c0 & c1)),  # incorrect -> correct
        "broken": int(jnp.sum(c0 & ~c1)),  # correct -> incorrect
        "changed": int(jnp.sum(p0 != p1)),
        "stable_correct": int(jnp.sum(c0 & c1)),
        "stable_incorrect": int(jnp.sum(~c0 & ~c1)),
    }


class FailureHead:
    """MLP predicting P(misclassified) from uncertainty features.

    Features per sample: [entropy, margin, msp, energy] (+ optional
    penultimate features). shannonentropy_fullclassifiers{,1}.py train small
    torch heads; here one jitted Adam loop.
    """

    def __init__(self, hidden: int = 32, seed: int = 0):
        self.hidden = hidden
        self.seed = seed
        self.params = None

    @staticmethod
    def features_from_logits(logits: jnp.ndarray, extra: jnp.ndarray | None = None):
        from imagetransformations_tpu.uq import metrics as um

        feats = jnp.stack(
            [
                um.shannon_entropy(logits),
                um.margin(logits),
                um.msp(logits),
                um.energy_score(logits),
            ],
            axis=-1,
        )
        if extra is not None:
            feats = jnp.concatenate([feats, extra], axis=-1)
        # standardize
        mu = jnp.mean(feats, 0, keepdims=True)
        sd = jnp.std(feats, 0, keepdims=True) + 1e-6
        return (feats - mu) / sd

    def fit(self, feats: jnp.ndarray, failed: jnp.ndarray, steps: int = 500, lr: float = 1e-2):
        d = feats.shape[-1]
        k1, k2 = jax.random.split(jax.random.key(self.seed))
        params = {
            "w1": jax.random.normal(k1, (d, self.hidden)) * 0.3,
            "b1": jnp.zeros((self.hidden,)),
            "w2": jax.random.normal(k2, (self.hidden, 1)) * 0.3,
            "b2": jnp.zeros((1,)),
        }
        y = failed.astype(jnp.float32)

        def forward(p, f):
            h = jax.nn.relu(f @ p["w1"] + p["b1"])
            return (h @ p["w2"] + p["b2"])[:, 0]

        def loss(p):
            return jnp.mean(optax.sigmoid_binary_cross_entropy(forward(p, feats), y))

        tx = optax.adam(lr)
        state = tx.init(params)

        @jax.jit
        def step(carry, _):
            p, st = carry
            g = jax.grad(loss)(p)
            updates, st = tx.update(g, st)
            return (optax.apply_updates(p, updates), st), None

        (params, _), _ = jax.lax.scan(step, (params, state), None, length=steps)
        self.params = params
        self._forward = forward
        return self

    def predict_proba(self, feats: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self._forward(self.params, feats))


def superclass_confusion_rule(
    logits: jnp.ndarray, class_to_super: jnp.ndarray, k: int = 3
) -> jnp.ndarray:
    """True where the top-k classes span >1 superclass (symbolic unreliability
    rule, 2026shannon_symbollic.py:75-89). class_to_super: [C] int."""
    _, topk = jax.lax.top_k(logits, k)
    supers = class_to_super[topk]  # [B, k]
    return jnp.any(supers != supers[:, :1], axis=-1)
