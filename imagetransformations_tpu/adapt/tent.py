"""TENT test-time adaptation as pure functional BN-parameter updates.

Parity map (fall_2025/TENT_Pipelines.py):
- configure_model_for_tent (:70-83): train only BatchNorm scale/bias, reset
  running stats -> here: a param partition + fresh batch_stats; the forward
  runs with batch statistics (train=True BN behavior).
- tent entropy loss (:95-97): -(softmax * log_softmax).sum(1).mean()
- tent_forward_and_adapt (:123-143): forward -> entropy -> backward ->
  clip_grad_norm(1.0) -> Adam step, prediction from the SAME forward.
- evaluate_with_tent_simple (:162-201): continuous adaptation across batches.
- evaluate_with_tent_reset (:203-237): restore the full state every batch
  (functional states make the reference's deep-copy hot spot free).
- conditional variant (:239-303): adapt a batch iff >50% of its images have
  256-bin pixel entropy above a threshold (ops.histogram.image_entropy).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from imagetransformations_tpu.ops.histogram import image_entropy


def entropy_loss(logits: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(jnp.exp(logp) * logp, axis=-1))


def _is_bn_param(path) -> bool:
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    return any("bn" in n.lower() or "batchnorm" in n.lower() for n in names)


def partition_bn_params(params):
    """Split params into (bn_params, frozen_params) pytrees with None holes."""
    bn = jax.tree_util.tree_map_with_path(
        lambda p, v: v if _is_bn_param(p) else None, params
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, v: None if _is_bn_param(p) else v, params
    )
    return bn, frozen


def merge_params(bn, frozen):
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b, bn, frozen,
        is_leaf=lambda x: x is None,
    )


@dataclasses.dataclass
class TentState:
    bn_params: Any
    frozen_params: Any
    opt_state: Any

    def tree_flatten(self):
        return (self.bn_params, self.frozen_params, self.opt_state), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(TentState, TentState.tree_flatten, TentState.tree_unflatten)


def _tent_tx(lr: float):
    """THE tent optimizer recipe (TENT_Pipelines.py:123-143: clip 1.0 +
    Adam). Single constructor shared by init_tent, the scanned evaluator,
    and the ragged-tail step so the three paths cannot drift."""
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))


def init_tent(params, lr: float = 2.5e-4):
    """lr defaults per TENT_Pipelines.py:354 (1e-3 for the reset protocol)."""
    bn, frozen = partition_bn_params(params)
    tx = _tent_tx(lr)
    return TentState(bn, frozen, tx.init(bn)), tx


def make_tent_step(model_apply: Callable, tx) -> Callable:
    """Returns jitted ``step(state, x) -> (state', logits)``.

    ``model_apply(params, x)`` must run BN in batch-statistics mode (the
    reference resets running stats and keeps BN in train behavior).
    """

    @jax.jit
    def step(state: TentState, x: jnp.ndarray):
        def loss_fn(bn):
            logits = model_apply(merge_params(bn, state.frozen_params), x)
            return entropy_loss(logits), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.bn_params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.bn_params)
        bn = optax.apply_updates(state.bn_params, updates)
        return TentState(bn, state.frozen_params, opt_state), logits

    return step


from imagetransformations_tpu.core.jitutil import IdLRUCache

#: jitted whole-protocol scans per (model_apply, lr, protocol, threshold,
#: has_raw). Caching matters doubly on the tunneled runtime: a fresh jit
#: per evaluate_with_tent call would re-COMPILE the adapt step for every
#: (corruption, severity, protocol) sweep cell.
_TENT_EVAL_CACHE = IdLRUCache(maxsize=16)

#: jitted single-batch (step, infer) pairs per (model_apply, lr) for the
#: ragged-tail path — same recompile-per-call trap as the scan
_TENT_STEP_CACHE = IdLRUCache(maxsize=16)


def _tent_step_and_infer(model_apply, lr: float):
    hit = _TENT_STEP_CACHE.get((model_apply,), (float(lr),))
    if hit is not None:
        return hit
    tx = _tent_tx(lr)
    step = make_tent_step(model_apply, tx)

    @jax.jit
    def infer(st, x):
        return model_apply(merge_params(st.bn_params, st.frozen_params), x)

    _TENT_STEP_CACHE.put((model_apply,), (float(lr),), (step, infer))
    return step, infer


def _tent_eval_scan_fn(
    model_apply, lr: float, protocol: str, threshold: float, has_raw: bool
):
    """Whole-protocol evaluation as ONE jitted dispatch: ``lax.scan`` over
    stacked equal-shape batches, TentState as carry, correct-counts
    accumulated in-graph (the per-batch Python loop paid one step dispatch
    plus an eager argmax/sum fetch per batch). The 'conditional' gate runs
    as ``lax.cond`` on the in-graph pixel-entropy fraction."""
    extra = (float(lr), protocol, float(threshold), bool(has_raw))
    hit = _TENT_EVAL_CACHE.get((model_apply,), extra)
    if hit is not None:
        return hit
    tx = _tent_tx(lr)

    @jax.jit
    def run(state0: TentState, xs, ys, raws):
        def do_step(state, x):
            def loss_fn(bn):
                logits = model_apply(merge_params(bn, state.frozen_params), x)
                return entropy_loss(logits), logits

            (_, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.bn_params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.bn_params)
            bn = optax.apply_updates(state.bn_params, updates)
            return TentState(bn, state.frozen_params, opt_state), logits

        def infer(state, x):
            return state, model_apply(
                merge_params(state.bn_params, state.frozen_params), x
            )

        def body(state, inp):
            if has_raw:
                x, y, raw = inp
            else:
                x, y = inp
            st_in = state0 if protocol == "reset" else state
            if protocol == "conditional":
                ent = image_entropy(raw)
                frac = jnp.mean((ent > threshold).astype(jnp.float32))
                state2, logits = jax.lax.cond(frac > 0.5, do_step, infer, st_in, x)
            else:
                state2, logits = do_step(st_in, x)
            c = jnp.sum((jnp.argmax(logits, axis=-1) == y).astype(jnp.int32))
            return state2, c

        inputs = (xs, ys, raws) if has_raw else (xs, ys)
        state_f, corrects = jax.lax.scan(body, state0, inputs)
        return state_f, jnp.sum(corrects)

    _TENT_EVAL_CACHE.put((model_apply,), extra, run)
    return run


def evaluate_with_tent(
    model_apply, params, batches, labels_batches, lr: float = 2.5e-4,
    protocol: str = "continuous", image_entropy_threshold: float = 1.16,
):
    """Run a TENT protocol over batches -> accuracy.

    protocol: 'continuous' | 'reset' (restore state every batch) |
    'conditional' (adapt iff >50% of the batch's images exceed the pixel-
    entropy threshold; TENT_Pipelines.py:239-303). ``batches`` are
    model-space inputs; image entropy is computed on the matching uint8
    images when provided as (x, raw_u8) tuples.

    The maximal equal-shape batch prefix runs as one scanned dispatch
    (``_tent_eval_scan_fn``); a ragged tail (dataset not divisible by the
    batch size) continues per-batch from the scanned state.
    """
    state0, _ = init_tent(params, lr)
    has_raw = bool(batches) and isinstance(batches[0], tuple)
    if any(isinstance(b, tuple) != has_raw for b in batches):
        raise ValueError(
            "batches mix (x, raw_u8) tuples with bare arrays — supply one "
            "form consistently"
        )
    if protocol == "conditional" and not has_raw:
        raise ValueError(
            "conditional protocol needs (x, raw_u8) batch tuples for "
            "the pixel-entropy gate (TENT_Pipelines.py:239-303)"
        )

    def xof(b):
        return b[0] if has_raw else b

    main_n = 0
    if batches:
        s0, l0 = xof(batches[0]).shape, labels_batches[0].shape
        while (
            main_n < len(batches)
            and xof(batches[main_n]).shape == s0
            and labels_batches[main_n].shape == l0
        ):
            main_n += 1

    state = state0
    correct = total = 0
    # only the conditional protocol reads the raw uint8 images (pixel-
    # entropy gate); stacking/shipping them for continuous/reset would
    # waste an extra executable + a big host->device transfer (~11 MB/s
    # on the tunnel) on data the scan body never touches
    use_raw = has_raw and protocol == "conditional"
    if main_n >= 2:
        xs = jnp.stack([xof(b) for b in batches[:main_n]])
        ys = jnp.stack(labels_batches[:main_n])
        raws = jnp.stack([b[1] for b in batches[:main_n]]) if use_raw else None
        run = _tent_eval_scan_fn(
            model_apply, lr, protocol, image_entropy_threshold, use_raw
        )
        state, c = run(state0, xs, ys, raws)
        correct += int(c)
        total += int(ys.size)
        batches = batches[main_n:]
        labels_batches = labels_batches[main_n:]

    if batches:  # ragged tail (or a single batch): per-batch path
        step, infer = _tent_step_and_infer(model_apply, lr)

        for xb, yb in zip(batches, labels_batches):
            raw = None
            if isinstance(xb, tuple):
                xb, raw = xb
            if protocol == "reset":
                state = state0
            if protocol == "conditional":
                ent = image_entropy(raw)
                frac = float(
                    jnp.mean((ent > image_entropy_threshold).astype(jnp.float32))
                )
                if frac > 0.5:
                    state, logits = step(state, xb)
                else:
                    logits = infer(state, xb)
            else:
                state, logits = step(state, xb)
            pred = jnp.argmax(logits, axis=-1)
            correct += int(jnp.sum(pred == yb))
            total += int(yb.shape[0])
    return correct / max(total, 1)
