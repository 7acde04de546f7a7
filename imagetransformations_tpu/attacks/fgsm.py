"""FGSM attack / reverse-FGSM defense / adversarial training — functional JAX.

Parity map:
- attacks/fgsm/cifar-10/fgsm_reversefgsm_cifar10.py:23-27 -> fgsm_attack
  (x + eps*sign(grad)) and reverse_fgsm (x - eps*sign(grad)), applied in the
  normalized-input space with clipping to valid range.
- attacks/fgsm.py:201-219 -> minimal_epsilon: smallest eps in a grid that
  flips each sample's prediction (vectorized over the grid via vmap instead
  of the reference's per-image loop).
- attacks/fgsm.py:233-263 -> adversarial_train_step: loss on the FGSM-
  perturbed batch. The reference's DataParallel wrap (:58) is replaced by
  batch sharding over the mesh (pipeline.sharding).
- attacks/fgsm/imagenet/fgsm_reversefgsm_imagenet.py:27-44 ->
  denormalize -> perturb -> renormalize helpers.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _ce_grad(model_fn, x, labels):
    def loss(xb):
        logits = model_fn(xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    return jax.grad(loss)(x)


@functools.partial(jax.jit, static_argnames=("model_fn", "eps"))
def fgsm_attack(
    model_fn: Callable, x: jnp.ndarray, labels: jnp.ndarray, eps: float = 0.03,
    clip_min: float = 0.0, clip_max: float = 1.0,
) -> jnp.ndarray:
    """x_adv = clip(x + eps * sign(dL/dx))."""
    g = _ce_grad(model_fn, x, labels)
    return jnp.clip(x + eps * jnp.sign(g), clip_min, clip_max)


@functools.partial(jax.jit, static_argnames=("model_fn", "eps"))
def reverse_fgsm(
    model_fn: Callable, x: jnp.ndarray, labels: jnp.ndarray, eps: float = 0.03,
    clip_min: float = 0.0, clip_max: float = 1.0,
) -> jnp.ndarray:
    """x_def = clip(x - eps * sign(dL/dx)) — the 'recovery' direction."""
    g = _ce_grad(model_fn, x, labels)
    return jnp.clip(x - eps * jnp.sign(g), clip_min, clip_max)


@functools.partial(jax.jit, static_argnames=("model_fn",))
def minimal_epsilon(
    model_fn: Callable,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    eps_grid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-sample smallest eps that flips the prediction (inf if none).

    attacks/fgsm.py:201-219 searches eps per image in a Python loop; here one
    vmap over the grid evaluates all eps levels in a single compiled call.
    """
    if eps_grid is None:
        eps_grid = jnp.linspace(1.0 / 255, 16.0 / 255, 16)
    g = jnp.sign(_ce_grad(model_fn, x, labels))

    def flipped_at(eps):
        adv = jnp.clip(x + eps * g, 0.0, 1.0)
        return jnp.argmax(model_fn(adv), axis=-1) != labels

    flips = jax.vmap(flipped_at)(eps_grid)  # [E, B]
    any_flip = jnp.any(flips, axis=0)
    first = jnp.argmax(flips, axis=0)
    return jnp.where(any_flip, eps_grid[first], jnp.inf)


def adversarial_train_step(
    model_apply, params, batch_stats, opt_state, tx, x, labels,
    eps: float = 8.0 / 255, adv_weight: float = 0.5,
):
    """One step of mixed clean+FGSM training (attacks/fgsm.py:233-263)."""

    def forward(p, xb, train):
        logits, updates = model_apply(
            {"params": p, "batch_stats": batch_stats}, xb, train,
            mutable=["batch_stats"],
        )
        return logits, updates["batch_stats"]

    # craft adversarial examples against the current params (eval mode)
    def atk_loss(xb):
        logits, _ = forward(params, xb, False)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    x_adv = jnp.clip(x + eps * jnp.sign(jax.grad(atk_loss)(x)), 0.0, 1.0)

    def loss_fn(p):
        logits_c, stats1 = forward(p, x, True)
        logits_a, stats2 = forward(p, x_adv, True)
        ce = optax.softmax_cross_entropy_with_integer_labels
        loss = (1 - adv_weight) * ce(logits_c, labels).mean() + adv_weight * ce(
            logits_a, labels
        ).mean()
        return loss, stats2

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, loss


def denormalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Normalized model space -> [0,1] pixel space (imagenet scripts :27-35)."""
    return x * jnp.asarray(std) + jnp.asarray(mean)


def renormalize(x01: jnp.ndarray, mean, std) -> jnp.ndarray:
    return (x01 - jnp.asarray(mean)) / jnp.asarray(std)
