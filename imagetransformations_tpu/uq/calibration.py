"""Calibration & ranking metrics: ECE, AUROC, AUPR, AURC, coverage, correlation.

Vectorized jnp re-derivations of the reference's metric library
(attacks/cifar10-unvertainty/swag/metric.py — the repo's one library-grade
file) and pipeline/metrics/ece.py. All functions take arrays, return scalars,
and are jit-safe (fixed bin counts, sort-based rankings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ece(probs: jnp.ndarray, labels: jnp.ndarray, n_bins: int = 10) -> jnp.ndarray:
    """Expected calibration error over max-prob bins (ece.py:49-61).

    probs: [B,C] softmax probabilities; equal-width confidence bins —
    the binning itself lives in ``calibration_bins`` (one place owns the
    (lo, hi] torch.bucketize convention).
    """
    count, acc, avg_conf = calibration_bins(probs, labels, n_bins)
    n = probs.shape[0]
    return jnp.sum(count / n * jnp.abs(acc - avg_conf))


def calibration_bins(probs, labels, n_bins: int = 10):
    """Per-bin (count, accuracy, confidence) — swag/metric.py:188-232."""
    conf = jnp.max(probs, axis=-1)
    pred = jnp.argmax(probs, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    edges = jnp.linspace(0.0, 1.0, n_bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, conf, side="left") - 1, 0, n_bins - 1)
    onehot = jax.nn.one_hot(idx, n_bins)
    count = jnp.sum(onehot, axis=0)
    acc = jnp.sum(onehot * correct[:, None], axis=0) / jnp.maximum(count, 1)
    avg_conf = jnp.sum(onehot * conf[:, None], axis=0) / jnp.maximum(count, 1)
    return count, acc, avg_conf


def nll(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    logp = jnp.log(jnp.clip(probs, eps, 1.0))
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0])


def brier(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    onehot = jax.nn.one_hot(labels, probs.shape[-1])
    return jnp.mean(jnp.sum((probs - onehot) ** 2, axis=-1))


def accuracy(logits_or_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits_or_probs, axis=-1) == labels).astype(jnp.float32))


def auroc(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """AUC-ROC via the Mann-Whitney U rank statistic (ties -> midranks).

    ``targets`` binary {0,1}; ``scores`` higher = more likely positive.
    Matches sklearn.roc_auc_score (swag/metric.py:493, energy.py:99).
    """
    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_s = scores[order]
    ranks_lo = jnp.searchsorted(sorted_s, scores, side="left").astype(jnp.float32)
    ranks_hi = jnp.searchsorted(sorted_s, scores, side="right").astype(jnp.float32)
    midrank = (ranks_lo + ranks_hi + 1.0) / 2.0  # 1-based midranks
    pos = targets.astype(jnp.float32)
    n_pos = jnp.sum(pos)
    n_neg = n - n_pos
    u = jnp.sum(midrank * pos) - n_pos * (n_pos + 1.0) / 2.0
    return u / jnp.maximum(n_pos * n_neg, 1.0)


def aupr(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Average precision (area under PR curve, step interpolation)."""
    order = jnp.argsort(-scores)
    t = targets[order].astype(jnp.float32)
    tp = jnp.cumsum(t)
    k = jnp.arange(1, scores.shape[0] + 1, dtype=jnp.float32)
    precision = tp / k
    n_pos = jnp.maximum(jnp.sum(t), 1.0)
    return jnp.sum(precision * t) / n_pos


def risk_coverage_curve(confidence: jnp.ndarray, correct: jnp.ndarray):
    """(coverage, risk) arrays sweeping a confidence threshold.

    swag/metric.py:356-405 (area_under_risk_coverage_curve).
    """
    order = jnp.argsort(-confidence)
    err = 1.0 - correct[order].astype(jnp.float32)
    n = confidence.shape[0]
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    coverage = k / n
    risk = jnp.cumsum(err) / k
    return coverage, risk


def aurc(confidence: jnp.ndarray, correct: jnp.ndarray) -> jnp.ndarray:
    """Area under the risk-coverage curve (lower = better)."""
    coverage, risk = risk_coverage_curve(confidence, correct)
    return jnp.mean(risk)


def excess_aurc(confidence: jnp.ndarray, correct: jnp.ndarray) -> jnp.ndarray:
    """AURC minus the optimal-ordering AURC (swag/metric.py:392-405)."""
    opt_conf = correct.astype(jnp.float32)  # oracle ranks correct first
    return aurc(confidence, correct) - aurc(opt_conf, correct)


def coverage_for_accuracy(
    confidence: jnp.ndarray,
    correct: jnp.ndarray,
    target_acc: float = 0.95,
    start_index: int = 200,
) -> jnp.ndarray:
    """Coverage at the FIRST prefix (most-confident-first) whose selective
    accuracy drops below the target — reference semantics including the
    ``start_index`` noise rule (swag/metric.py:407-446): the crossing is
    searched from ``start_index`` onward to skip small-prefix noise, and
    falls back to the strict (from-0) crossing when the non-strict search
    fires immediately. Like the reference, an accuracy that NEVER drops
    below target returns coverage 0 (argmax of all-False is 0), not 1."""
    order = jnp.argsort(-confidence)  # == ascending uncertainty
    c = correct[order].astype(jnp.float32)
    n = c.shape[0]
    cummean = jnp.cumsum(c) / jnp.arange(1, n + 1, dtype=jnp.float32)
    below = (cummean < target_acc).astype(jnp.float32)
    strict = jnp.argmax(below)
    si = min(int(start_index), max(n - 1, 0))
    nonstrict = jnp.argmax(below[si:]) + si
    cov = jnp.where(nonstrict > si, nonstrict, strict)
    return cov.astype(jnp.float32) / n


def area_under_lift_curve(confidence: jnp.ndarray, correct: jnp.ndarray) -> jnp.ndarray:
    """swag/metric.py:268-321: lift of error rate in confidence order."""
    order = jnp.argsort(-confidence)
    c = correct[order].astype(jnp.float32)
    n = confidence.shape[0]
    k = jnp.arange(1, n + 1, dtype=jnp.float32)
    base = jnp.maximum(jnp.mean(c), 1e-12)
    lift = (jnp.cumsum(c) / k) / base
    return jnp.mean(lift) - 1.0


def pearsonr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xc = x - jnp.mean(x)
    yc = y - jnp.mean(y)
    return jnp.sum(xc * yc) / jnp.maximum(
        jnp.sqrt(jnp.sum(xc**2) * jnp.sum(yc**2)), 1e-12
    )


def _midranks(v: jnp.ndarray) -> jnp.ndarray:
    order = jnp.argsort(v)
    s = v[order]
    lo = jnp.searchsorted(s, v, side="left").astype(jnp.float32)
    hi = jnp.searchsorted(s, v, side="right").astype(jnp.float32)
    return (lo + hi + 1.0) / 2.0


def spearmanr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Spearman rank correlation with midranks.

    DELIBERATE deviation from swag/metric.py:461-489, which uses ordinal
    ranks (argsort().argsort()) and propagates NaN for constant input:
    midranks are the scipy.stats.spearmanr treatment of ties (quantized
    confidences tie often), and a constant vector returns 0 here instead
    of NaN.
    """
    return pearsonr(_midranks(x), _midranks(y))


def youden_threshold(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Optimal threshold by Youden's J = TPR - FPR over the ROC sweep.

    Parity with analyze_uncertainty_thresholds (cifar_iterative_mc.py:174-219)
    which picks thresholds from roc_curve by argmax J.
    """
    order = jnp.argsort(-scores)
    t = targets[order].astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(t), 1.0)
    n_neg = jnp.maximum(t.shape[0] - jnp.sum(t), 1.0)
    tpr = jnp.cumsum(t) / n_pos
    fpr = jnp.cumsum(1.0 - t) / n_neg
    j = tpr - fpr
    best = jnp.argmax(j)
    return scores[order][best]


def fit_temperature(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    t_init: float = 1.5,
    steps: int = 200,
    lr: float = 0.01,
) -> jnp.ndarray:
    """Scalar temperature minimizing val NLL (temperature_scaling.py:33-79).

    The reference uses L-BFGS on one scalar; here full-batch Adam on log T —
    same optimum, jit-compiled.
    """
    import optax

    log_t = jnp.log(jnp.float32(t_init))

    def loss_fn(lt):
        logp = jax.nn.log_softmax(logits / jnp.exp(lt), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    opt = optax.adam(lr)
    state = opt.init(log_t)

    def step(carry, _):
        lt, st = carry
        g = jax.grad(loss_fn)(lt)
        updates, st = opt.update(g, st)
        return (lt + updates, st), None

    (log_t, _), _ = jax.lax.scan(step, (log_t, state), None, length=steps)
    return jnp.exp(log_t)
