"""End-to-end research workflows — the reference's driver scripts as APIs.

Each function reproduces one of the reference's ``python <script>.py``
entry points on top of the framework's batched TPU components:

- ``uncertainty_report``       <- pipeline/cifar10_histogram4.py and the 16
  pipeline/metrics/ scripts: all metrics + threshold table + histogram PNGs.
- ``refinement_pipeline``      <- pipeline/cifar_iterative_{mc,ms,ds}.py: full
  metric sweep -> Youden thresholds -> reverse-FGSM refinement -> re-eval.
- ``tent_sweep``               <- fall_2025/TENT_Pipelines.py:305-408:
  corruption x severity x {baseline, tent} accuracy matrix.
- ``swag_pipeline``            <- attacks/cifar10-unvertainty/swag/
  cifar_swag.py: collection -> weight samples -> BMA eval with uncertainty.
- ``transform_folder``         <- transformation.py __main__: folder ->
  8-transform sweep -> save.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.evalx.harness import (
    analyze_uncertainty_thresholds,
    corrupt,
    evaluate_batched,
)


def uncertainty_report(
    model_fn, to_model_space, images_u8, labels, out_dir: str | None = None,
    metric_names=("shannon_entropy", "msp", "margin", "ratio", "energy",
                  "doctor_alpha", "doctor_beta", "max_logit", "least_confidence"),
):
    """All logit metrics + AUROC + Youden thresholds (+ histogram PNGs)."""
    res = evaluate_batched(
        model_fn, to_model_space, images_u8, labels, metric_names=metric_names
    )
    table = analyze_uncertainty_thresholds(res["metrics"], res["correct"])
    if out_dir:
        from imagetransformations_tpu.evalx.report import plot_uncertainty_histogram

        os.makedirs(out_dir, exist_ok=True)
        for m, score in res["metrics"].items():
            plot_uncertainty_histogram(
                np.asarray(score), np.asarray(res["correct"]) > 0.5,
                threshold=table[m]["threshold"], title=m,
                out_path=os.path.join(out_dir, f"{m}.png"),
            )
    return {"accuracy": res["accuracy"], "thresholds": table, "metrics": res["metrics"]}


def refinement_pipeline(
    model_fn, to_model_space, images_u8, labels,
    metric: str = "shannon_entropy", eps: float = 0.03, max_iters: int = 10,
    msp_stop: float = 0.998,
):
    """cifar_iterative_* equivalent: flag by metric threshold -> reverse-FGSM
    refine flagged inputs -> before/after evaluation."""
    from imagetransformations_tpu.adapt.refine import refine_batch
    from imagetransformations_tpu.uq import metrics as um
    from imagetransformations_tpu.uq.calibration import youden_threshold

    x = to_model_space(images_u8)
    logits = model_fn(x)
    correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    score = um.LOGIT_METRICS[metric](logits)
    if metric in um.CONFIDENCE_METRICS:
        score = -score
    thr = youden_threshold(score, 1.0 - correct)
    flagged = score > thr
    x_ref, iters = refine_batch(
        model_fn, x, flagged, eps=eps, max_iters=max_iters, msp_stop=msp_stop
    )
    logits_after = model_fn(x_ref)
    from imagetransformations_tpu.evalx.analysis import flip_analysis

    return {
        "threshold": float(thr),
        "n_flagged": int(jnp.sum(flagged)),
        "refine_iters": int(iters),
        **flip_analysis(logits, logits_after, labels),
    }


def tent_sweep(
    model_apply_bn_train, params, corruptions, severities, clean_images_u8,
    labels, to_model_space, key, lr=2.5e-4, batch_size: int = 256,
    protocols=("baseline", "continuous", "reset", "conditional"),
    image_entropy_threshold: float = 1.16, model_apply_eval=None,
):
    """Corruption x severity x protocol accuracy matrix (TENT_Pipelines).

    Batches are passed to evaluate_with_tent as (model_space, raw_u8) tuples
    so the 'conditional' protocol (image-pixel-entropy gate,
    TENT_Pipelines.py:239-303) is exercised end to end.

    ``model_apply_eval(x) -> logits``: the un-adapted eval-mode forward
    (BN running stats) for the 'baseline' row, matching the reference's
    ``evaluate_baseline`` (TENT_Pipelines.py:146-160, ``model.eval()``).
    If None, the baseline falls back to the batch-stat forward — which
    already folds in TENT's main lever (BN recalibration on the corrupted
    batch) and therefore understates the adapted-vs-baseline delta.

    ``lr`` is a float for all protocols or a ``{protocol: lr}`` mapping;
    the reference uses 2.5e-4 for continuous and 1e-3 for reset and
    conditional (TENT_Pipelines.py:353-366).
    """
    from imagetransformations_tpu.adapt.tent import evaluate_with_tent, init_tent, merge_params

    def _lr_for(proto):
        return float(lr[proto]) if isinstance(lr, dict) else float(lr)

    def _baseline_fwd(x):
        if model_apply_eval is not None:
            return model_apply_eval(x)
        return model_apply_bn_train(params, x)

    @jax.jit
    def _baseline_count(xb_stack, yb_stack):
        # un-adapted accuracy as ONE scanned dispatch (compiled once per
        # sweep; the per-batch loop paid a dispatch + eager argmax/sum
        # fetch per batch on every cell)
        def body(_, inp):
            x, y = inp
            lg = _baseline_fwd(x)
            return None, jnp.sum((jnp.argmax(lg, -1) == y).astype(jnp.int32))

        _, cs = jax.lax.scan(body, None, (xb_stack, yb_stack))
        return jnp.sum(cs)

    @jax.jit
    def _baseline_count_tail(xb, yb):
        # the ragged tail must also run jitted: model_apply_eval is a raw
        # Flax apply, so the tail otherwise runs an eager per-op forward
        # over the tunnel once per cell. (Measured effect on the full
        # 15x5-cell artifact was within the +-10% tunnel variance — the
        # wall is dominated by the adaptation scans — but eager public
        # paths are against the dispatch-floor contract regardless.) One
        # compile per tail shape, which is constant across cells.
        lg = _baseline_fwd(xb)
        return jnp.sum((jnp.argmax(lg, -1) == yb).astype(jnp.int32))

    results: dict = {}
    for name in corruptions:
        results[name] = {}
        for sev in severities:
            key, k = jax.random.split(key)
            imgs = corrupt(clean_images_u8, name, sev, k)
            xs = to_model_space(imgs)
            batches = [
                (xs[i : i + batch_size], imgs[i : i + batch_size])
                for i in range(0, xs.shape[0], batch_size)
            ]
            lbatches = [labels[i : i + batch_size] for i in range(0, xs.shape[0], batch_size)]
            row = {}
            for proto in protocols:
                if proto == "baseline":
                    n = int(xs.shape[0])
                    nb = n // batch_size
                    main = nb * batch_size
                    correct, total = 0, n
                    if nb:
                        correct += int(_baseline_count(
                            xs[:main].reshape((nb, batch_size) + xs.shape[1:]),
                            labels[:main].reshape(nb, batch_size),
                        ))
                    if main < n:  # ragged tail batch
                        correct += int(
                            _baseline_count_tail(xs[main:], labels[main:])
                        )
                    row[proto] = correct / max(total, 1)
                else:
                    row[proto] = evaluate_with_tent(
                        model_apply_bn_train, params, batches, lbatches,
                        lr=_lr_for(proto), protocol=proto,
                        image_entropy_threshold=image_entropy_threshold,
                    )
            results[name][sev] = row
    return results


def swag_pipeline(
    model_apply, model_apply_train, params, batch_stats, train_iter_fn,
    eval_images, key, num_weight_samples: int = 30, eval_mc_samples: int = 10,
    max_rank: int = 20, lr: float = 1e-4,
):
    """SWAG collection -> sampling -> BMA uncertainty (cifar_swag.py:65-253).

    Returns {probs, entropy, one_minus_max, jsd, variance} over eval_images.
    """
    from imagetransformations_tpu.models.training import swag_collect
    from imagetransformations_tpu.uq import mc as umc
    from imagetransformations_tpu.uq import swag

    params, batch_stats, state = swag_collect(
        model_apply_train, params, batch_stats, train_iter_fn(),
        lr=lr, max_rank=max_rank,
    )
    # ONE jitted dispatch for draw -> S-sample BMA forward -> every
    # uncertainty reduction (eager vmaps would dispatch per op per leaf)
    @jax.jit
    def _sample_and_eval(st, k, imgs):
        stacked = swag.sample_many(st, k, num_weight_samples)
        take = jax.tree_util.tree_map(lambda l: l[:eval_mc_samples], stacked)
        mc_logits = swag.bma_logits(
            lambda p, x: model_apply({"params": p, "batch_stats": batch_stats}, x),
            take, imgs,
        )  # [S, B, C]
        probs = jnp.mean(jax.nn.softmax(mc_logits, -1), axis=0)
        return {
            "probs": probs,
            "entropy": umc.predictive_entropy(mc_logits, base2=False),
            "one_minus_max": 1.0 - jnp.max(probs, -1),
            "jsd": umc.jensen_shannon(mc_logits),
            "variance": umc.mc_variance(mc_logits),
        }

    out = _sample_and_eval(state, key, eval_images)
    out["swag_state"] = state
    return out


def transform_folder(
    in_dir: str, out_dir: str, key=None, size=None, native: bool | None = None
) -> dict:
    """transformation.py __main__ equivalent: folder -> 8-type random-grid
    transform sweep -> jpegs named {name}_{type}_{value}_corrupted.

    ``native`` routes decode AND encode through the multithreaded C++
    libjpeg path (pipeline.native_io); the default auto-detects (native
    when the library builds and ``size`` is given — decode needs a target
    size — PIL otherwise). Host image IO dominates the end-to-end wall
    time, so the native path is the difference between an IO-bound and a
    compute-visible run.
    """
    from imagetransformations_tpu.pipeline import native_io
    from imagetransformations_tpu.pipeline.batch import apply_all_transformations
    from imagetransformations_tpu.pipeline.io import load_folder_images

    if native is None:
        native = size is not None and native_io.native_available()
    key = key if key is not None else jax.random.key(0)
    imgs, paths = load_folder_images(in_dir, size=size, native=native)
    if len(paths) == 0:
        return {}
    # fused=False: a folder transform is a ONE-SHOT run — the split dispatch
    # trades ~0.25 s/batch of RPC floors for skipping the combined
    # executable's multi-minute cold compile (the reference's script starts
    # in ~0 s, transformation.py:356-362), and its per-op executables are
    # shared with chains/sweeps already compiled in the process
    res = apply_all_transformations(jnp.asarray(imgs), key, fused=False)
    os.makedirs(out_dir, exist_ok=True)
    written = {}
    for t, (vals, arrs) in res.items():
        arrs = np.asarray(arrs)
        vals = np.asarray(vals)
        names = [
            f"{os.path.splitext(os.path.basename(p))[0]}_{t}_"
            f"{round(float(vals[i]), 2)}_corrupted.jpeg"
            for i, p in enumerate(paths)
        ]
        out_paths = [os.path.join(out_dir, fn) for fn in names]
        if native and arrs.shape[-1] == 3:
            native_io.encode_batch(arrs, out_paths)
        else:
            from PIL import Image

            for img, p in zip(arrs, out_paths):
                Image.fromarray(img).save(p)
        written[t] = names
    return written
