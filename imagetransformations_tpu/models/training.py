"""Generic training loops: supervised, ensembles, BNN ELBO, SWAG collection.

Covers the reference's ad-hoc training scripts as reusable functional steps:
- ensemble.py:49-77      -> train_members (M SimpleCNNs; stacked-params vmap)
- baysian.py:137-158     -> elbo_train_step (CE(sum) + KL/N, Adam)
- attacks/fgsm.py:233-263 -> see attacks.fgsm.adversarial_train_step
- swag/cifar_swag.py:137-166 -> swag_collect (SGD steps + swag.update per
  batch)

All steps are jitted (params, batch) -> (params', aux) pure functions; the
mesh-sharded variant comes from pipeline.sharding.sharded_apply or the
dp x tp jit in __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax


def make_train_step(model_apply: Callable, tx) -> Callable:
    """Standard CE step for flax models with BatchNorm state."""

    @jax.jit
    def step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, updates = model_apply(
                {"params": p, "batch_stats": batch_stats}, x, True,
                mutable=["batch_stats"],
            )
            # mixed precision: models built with dtype=bfloat16 run conv/
            # matmul on the MXU in bf16 (2x throughput) with f32 params;
            # the loss reduction always happens in f32
            logits = logits.astype(jnp.float32)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            return loss, (updates["batch_stats"], logits)

        (loss, (stats, logits)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return params, stats, opt_state, loss, acc

    return step


def fit(
    model,
    data_iter: Iterable,
    epochs: int = 1,
    lr: float = 1e-3,
    key: jax.Array | None = None,
    input_shape=(1, 32, 32, 3),
):
    """Minimal fit loop -> {'params', 'batch_stats'}."""
    key = key if key is not None else jax.random.key(0)
    variables = model.init(key, jnp.zeros(input_shape, jnp.float32), train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_train_step(model.apply, tx)
    for _ in range(epochs):
        for x, y in data_iter:
            params, stats, opt_state, loss, acc = step(params, stats, opt_state, x, y)
    return {"params": params, "batch_stats": stats}


def train_members(
    model, num_members: int, data_iter_fn: Callable[[], Iterable],
    epochs: int = 1, lr: float = 1e-3, seed: int = 0,
) -> list:
    """Deep ensemble: M independent inits/trainings (ensemble.py:49-77).

    Returns a list of variable dicts; stack with uq.mc.ensemble_logits for a
    single vmapped predictive pass.
    """
    out = []
    for m in range(num_members):
        out.append(
            fit(model, data_iter_fn(), epochs, lr, jax.random.key(seed + m))
        )
    return out


def make_elbo_step(model, tx, kl_weight: float):
    """Bayes-by-backprop step: CE(sum) + kl_weight * KL (baysian.py:137-158)."""
    from imagetransformations_tpu.models.bayesian import kl_loss

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, key):
        def loss_fn(p):
            logits, aux = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, True,
                rngs={"sample": key}, mutable=["losses", "batch_stats"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).sum()
            kl = kl_loss(aux)
            return ce + kl_weight * kl, (aux.get("batch_stats", batch_stats), ce, kl)

        (loss, (stats, ce, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, ce, kl

    return step


def swag_collect(
    model_apply, params, batch_stats, data_iter, *,
    lr: float = 1e-4, max_rank: int = 20, update_every: int = 1,
):
    """SWAG collection: SGD steps calling swag.update per batch
    (cifar_swag.py:137-166 at lr=1e-4). Returns (params, stats, swag_state).
    """
    from imagetransformations_tpu.uq import swag

    tx = optax.sgd(lr, momentum=0.9)
    opt_state = tx.init(params)
    step = make_train_step(model_apply, tx)
    state = swag.init(params, max_rank=max_rank)
    # jit the moment/ring-buffer update: eager it is ~3 tree_maps of jnp
    # ops across every param leaf PER STEP (hundreds of dispatches)
    update = jax.jit(swag.update)
    i = 0
    for x, y in data_iter:
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, x, y
        )
        if i % update_every == 0:
            state = update(state, params)
        i += 1
    return params, batch_stats, state
