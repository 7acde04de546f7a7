"""Reverse-FGSM input refinement — batched lax.while_loop, no per-image loops.

Parity map (reference -> here):
- pipeline/cifar_iterative_mc.py:24-35   -> logit_margin_loss
- pipeline/cifar_iterative_mc.py:351-356 -> one reverse step
  x <- clip(x - eps * sign(grad))
- pipeline/cifar_iterative_mc.py:358-440 -> refine_batch: <=10 iterations per
  flagged sample until MSP >= 0.998 (the reference runs batch-size-1 Python
  loops; here every flagged sample steps simultaneously with a per-sample
  active mask inside ONE compiled while_loop)
- pipenline/cifar_gradient_newloss.py:12-46 -> negative_class_loss /
  pseudo_label_loss / logit_consistency_loss (unsupervised variants)
- pipenline/cifar100_shannon.py:54-78 -> entropy_loss refinement
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def logit_margin_loss(logits: jnp.ndarray, labels: jnp.ndarray, margin: float = 10.0) -> jnp.ndarray:
    """Hinge on the true-class logit margin (cifar_iterative_mc.py:24-35)."""
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    masked = logits - 1e9 * jax.nn.one_hot(labels, logits.shape[-1])
    max_other = jnp.max(masked, axis=-1)
    return jnp.mean(jnp.maximum(0.0, margin - (true_logit - max_other)))


def entropy_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean predictive entropy (cifar100_shannon.py:54-60)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))


def negative_class_loss(logits: jnp.ndarray, avoid_labels: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """CE toward a random class != predicted (cifar_gradient_newloss.py:12-33)."""
    c = logits.shape[-1]
    offset = jax.random.randint(key, avoid_labels.shape, 1, c)
    target = jnp.mod(avoid_labels + offset, c)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=1))


def pseudo_label_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """CE toward the model's own argmax (cifar_gradient_newloss.py:34)."""
    labels = jnp.argmax(logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def logit_consistency_loss(logits: jnp.ndarray, ref_logits: jnp.ndarray) -> jnp.ndarray:
    """MSE to the initial logits (cifar_gradient_newloss.py:37-46)."""
    return jnp.mean((logits - ref_logits) ** 2)


@functools.partial(
    jax.jit, static_argnames=("model_fn", "loss_kind", "max_iters", "eps", "msp_stop")
)
def refine_batch(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    flagged: jnp.ndarray,
    *,
    loss_kind: str = "logit_margin",
    max_iters: int = 10,
    eps: float = 0.03,
    msp_stop: float = 0.998,
    clip_min: float = 0.0,
    clip_max: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Refine flagged inputs by iterative reverse-FGSM until MSP >= msp_stop.

    x: [B, H, W, C] model-space inputs; flagged: [B] bool. Targets are the
    model's initial predictions (the reference refines toward its own
    prediction, cifar_iterative_mc.py:380-386). Returns (x_refined, n_steps).
    """
    init_logits = model_fn(x)
    labels = jnp.argmax(init_logits, axis=-1)

    def per_sample_loss(xb):
        logits = model_fn(xb)
        if loss_kind == "logit_margin":
            per = jax.vmap(
                lambda lg, lb: logit_margin_loss(lg[None], lb[None])
            )(logits, labels)
        elif loss_kind == "entropy":
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.sum(jnp.exp(logp) * logp, axis=-1)
        elif loss_kind == "pseudo_label":
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(
                logp, jnp.argmax(logits, -1)[:, None], axis=1
            )[:, 0]
        else:
            raise ValueError(loss_kind)
        return jnp.sum(per), logits

    def cond(state):
        xc, active, it = state
        return jnp.logical_and(it < max_iters, jnp.any(active))

    def body(state):
        xc, active, it = state
        (_, logits), grads = jax.value_and_grad(per_sample_loss, has_aux=True)(xc)
        step = jnp.clip(xc - eps * jnp.sign(grads), clip_min, clip_max)
        mask = active.reshape(-1, *([1] * (x.ndim - 1)))
        xn = jnp.where(mask, step, xc)
        msp = jnp.max(jax.nn.softmax(model_fn(xn), axis=-1), axis=-1)
        still = jnp.logical_and(active, msp < msp_stop)
        return xn, still, it + 1

    active0 = jnp.logical_and(
        flagged, jnp.max(jax.nn.softmax(init_logits, -1), -1) < msp_stop
    )
    x_out, _, iters = jax.lax.while_loop(cond, body, (x, active0, 0))
    return x_out, iters


def single_step_refine(
    model_fn, x: jnp.ndarray, flagged: jnp.ndarray, eps: float = 0.03
) -> jnp.ndarray:
    """One reverse-FGSM step on flagged samples only
    (pipenline/cifar_gradient_transformations.py:75-157)."""
    labels = jnp.argmax(model_fn(x), axis=-1)

    def loss(xb):
        logits = model_fn(xb)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    g = jax.grad(loss)(x)
    stepped = jnp.clip(x - eps * jnp.sign(g), 0.0, 1.0)
    mask = flagged.reshape(-1, *([1] * (x.ndim - 1)))
    return jnp.where(mask, stepped, x)
