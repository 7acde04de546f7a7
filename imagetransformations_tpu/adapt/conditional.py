"""Image-entropy-conditioned transform application.

Parity with fall_2025/Initial_Experiments.py: compute each image's 256-bin
pixel-histogram Shannon entropy and apply a corrective transform chain only
to images above/below a threshold (the reference's rule-based "apply
enhancement when the image looks degraded" experiments), and with
TENT_Pipelines.py:239-303's batch-level gate.

TPU-first: the gate is a boolean mask select between the original and the
transformed batch — one compiled call, no data-dependent branching.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops.histogram import image_entropy
from imagetransformations_tpu.pipeline.chain import Chain, build_chain_fn


def apply_if_entropy(
    images_u8: jnp.ndarray,
    chain: Chain,
    threshold: float = 1.16,
    above: bool = True,
    key: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply ``chain`` only to images whose pixel entropy crosses ``threshold``.

    Returns (mixed batch, flagged mask). above=True transforms high-entropy
    (noisy) images; False transforms low-entropy (flat/degraded) ones.
    """
    ent = image_entropy(images_u8)
    flagged = ent > threshold if above else ent < threshold
    transformed = build_chain_fn(chain)(images_u8, key)
    mask = flagged.reshape(-1, 1, 1, 1)
    return jnp.where(mask, transformed, images_u8), flagged


def batch_gate_fraction(images_u8: jnp.ndarray, threshold: float = 1.16) -> jnp.ndarray:
    """Fraction of the batch above the pixel-entropy threshold — the
    conditional-TENT batch gate (adapt iff > 0.5, TENT_Pipelines.py:270-303)."""
    ent = image_entropy(images_u8)
    return jnp.mean((ent > threshold).astype(jnp.float32))


def conditional_transform_eval(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    to_model_space: Callable[[jnp.ndarray], jnp.ndarray],
    images_u8: jnp.ndarray,
    labels: jnp.ndarray,
    chain: Chain,
    threshold: float = 1.16,
    key: jax.Array | None = None,
) -> dict:
    """Initial_Experiments-style comparison: accuracy with/without the
    entropy-gated corrective transform."""
    mixed, flagged = apply_if_entropy(images_u8, chain, threshold, key=key)

    def acc(x):
        return float(
            jnp.mean((jnp.argmax(model_fn(to_model_space(x)), -1) == labels).astype(jnp.float32))
        )

    return {
        "n_flagged": int(jnp.sum(flagged)),
        "accuracy_base": acc(images_u8),
        "accuracy_conditional": acc(mixed),
    }
