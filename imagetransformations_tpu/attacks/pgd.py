"""PGD attack — random init, alpha steps, eps-ball projection, lax.fori_loop.

Parity with attacks/fgsm/cifar-10/pgd_cifar10.py:23-47: random uniform init
in the eps-ball, steps of alpha * sign(grad), projection back to the ball,
clip to valid range. The reference's per-batch Python loop over steps becomes
one compiled fori_loop.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax


@functools.partial(
    jax.jit, static_argnames=("model_fn", "eps", "alpha", "steps", "random_start")
)
def pgd_attack(
    model_fn: Callable,
    x: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    eps: float = 0.03,
    alpha: float = 2.0 / 255,
    steps: int = 10,
    random_start: bool = True,
    clip_min: float = 0.0,
    clip_max: float = 1.0,
) -> jnp.ndarray:
    def loss(xb):
        logits = model_fn(xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    if random_start:
        x_adv = x + jax.random.uniform(key, x.shape, minval=-eps, maxval=eps)
        x_adv = jnp.clip(x_adv, clip_min, clip_max)
    else:
        x_adv = x

    def body(_, xa):
        g = jax.grad(loss)(xa)
        xa = xa + alpha * jnp.sign(g)
        xa = jnp.clip(xa, x - eps, x + eps)  # project to the eps-ball
        return jnp.clip(xa, clip_min, clip_max)

    return jax.lax.fori_loop(0, steps, body, x_adv)
