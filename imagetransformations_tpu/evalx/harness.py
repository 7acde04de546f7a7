"""Corruption-sweep evaluation harness (corruptions x severities x metrics).

Parity map:
- attacks/uncertainty/FINAL_cifar_corrupted.py: 15 corruptions x 5
  severities x ~9 uncertainty metrics, per-severity accuracy, per-metric
  AUROC for error detection -> ``corruption_sweep``.
- The corruption generator itself reproduces the reference's two transform
  pools (transformation.py severity grids + TransformationPool severity
  lists, pipenline/cifar_image_transformations.py:37-129) as batched TPU
  ops — this framework GENERATES corruption suites instead of loading the
  precomputed CIFAR-10-C npy files (loading those is still supported via
  pipeline.io.load_cifar10c_npy).
- pipeline/cifar_iterative_mc.py:174-219 -> analyze_uncertainty_thresholds
  (optimal threshold by Youden's J + above/below counts table).
"""

from __future__ import annotations

import functools

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops import corruptions as cr
from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import noise as nz
from imagetransformations_tpu.ops import stencil as st
from imagetransformations_tpu.ops import warp as wp
from imagetransformations_tpu.uq import mahalanobis as _maha
from imagetransformations_tpu.uq import metrics as um
from imagetransformations_tpu.uq.calibration import auroc, youden_threshold


def _elastic(x, v, k):
    h, w = int(x.shape[-3]), int(x.shape[-2])
    a, s, aa = cr.elastic_affine_pixels(h, w, *v)
    return cr.elastic_transform_affine(x, a, s, aa, key=k)


#: corruption name -> (fn(images_u8, severity_value, key), [5 severity values]);
#: keys = the canonical CIFAR-10-C list in reference order
#: (attacks/uncertainty/FINAL_cifar_corrupted.py:22-27) — all 15 GENERATED
#: on device (generator semantics in oracle/corruptions.py).
CORRUPTIONS: dict[str, tuple[Callable, list]] = {
    # noise severities are the CIFAR-10-C values — the TransformationPool
    # lists ([0.08..0.38] etc.) are ~2x stronger and do not match the real
    # 32x32 data (tests/test_corruption_fidelity.py); the pool variants
    # remain available as ops (nz.*) with any severity
    "gaussian_noise": (
        lambda x, v, k: nz.gaussian_noise_01(x, v, key=k),
        cr.GAUSSIAN_NOISE_SEV,
    ),
    "shot_noise": (
        lambda x, v, k: nz.shot_noise(x, v, key=k),
        cr.SHOT_NOISE_SEV,
    ),
    "impulse_noise": (
        lambda x, v, k: nz.impulse_noise(x, v, key=k),
        cr.IMPULSE_NOISE_SEV,
    ),
    "defocus_blur": (
        # CIFAR-10-C defocus is the tiny anti-aliased disk PSF; the
        # TransformationPool defocus (PIL GaussianBlur radius 3-10,
        # st.pil_gaussian_blur, bit-exact) is a different, far stronger op
        lambda x, v, k: cr.defocus_blur_disk(x, *v),
        cr.DEFOCUS_SEV,
    ),
    "glass_blur": (
        lambda x, v, k: cr.glass_blur(x, *v, key=k),
        cr.GLASS_BLUR_SEV,
    ),
    "motion_blur": (
        # directional line PSF at a random per-image angle (the real data
        # uses Wand motion_blur); the TransformationPool horizontal 1xk
        # kernel remains as st.motion_blur
        lambda x, v, k: cr.motion_blur_directional(x, int(v[0]), float(v[1]), key=k),
        cr.MOTION_SEV,
    ),
    "zoom_blur": (
        lambda x, v, k: cr.zoom_blur(x, float(v)),
        cr.ZOOM_BLUR_SEV,
    ),
    "snow": (
        lambda x, v, k: cr.snow(x, *v, key=k),
        cr.SNOW_SEV,
    ),
    "frost": (
        lambda x, v, k: cr.frost(x, *v, key=k),
        cr.FROST_SEV,
    ),
    "fog": (
        lambda x, v, k: cr.fog(x, *v, key=k),
        cr.FOG_SEV,
    ),
    # HSV-value brightness and mean-preserving contrast (the CIFAR-10-C
    # recipes); PIL-multiply brightness / convertScaleAbs contrast remain
    # the apply_all ops (ew.apply_brightness / ew.apply_contrast)
    "brightness": (
        lambda x, v, k: cr.brightness_hsv(x, float(v)),
        cr.BRIGHTNESS_SEV,
    ),
    "contrast": (
        lambda x, v, k: cr.contrast_meanpreserve(x, float(v)),
        cr.CONTRAST_SEV,
    ),
    "elastic_transform": (
        _elastic,
        cr.ELASTIC_AFFINE_SEV,
    ),
    "pixelate": (
        lambda x, v, k: cr.pixelate(x, float(v)),
        cr.PIXELATE_SEV,
    ),
    "jpeg_compression": (
        lambda x, v, k: cr.jpeg_compression(x, int(v)),
        cr.JPEG_SEV,
    ),
}

#: non-canonical extras, usable by name. The first four complete the
#: reference's CIFAR-10-C store to 19/19 generatable corruptions
#: (/root/reference/CIFAR-10-C/store/ holds gaussian_blur, saturate,
#: spatter and speckle_noise samples beyond the canonical 15).
EXTRA_CORRUPTIONS: dict[str, tuple[Callable, list]] = {
    "speckle_noise": (
        lambda x, v, k: cr.speckle_noise(x, v, key=k),
        cr.SPECKLE_SEV,
    ),
    "gaussian_blur": (
        lambda x, v, k: cr.gaussian_blur_sigma_op(x, float(v)),
        cr.GAUSSIAN_BLUR_SEV,
    ),
    "spatter": (
        lambda x, v, k: cr.spatter(x, *v, key=k),
        cr.SPATTER_SEV,
    ),
    "saturate": (
        # HSV-saturation scale/shift (the CIFAR-10-C recipe); PIL
        # enhance_color remains as the TransformationPool op (ew)
        lambda x, v, k: cr.saturate_hsv(x, *v),
        cr.SATURATE_SEV,
    ),
    "rotation": (
        lambda x, v, k: wp.apply_rotation(x, float(v)),
        [5.0, 10.0, 15.0, 20.0, 22.5],
    ),
    "translation": (
        lambda x, v, k: wp.apply_translation(x, float(v)),
        [2.0, 4.0, 6.0, 8.0, 10.0],
    ),
}


def corrupt(
    images_u8: jnp.ndarray, name: str, severity: int, key: jax.Array
) -> jnp.ndarray:
    """Apply corruption ``name`` at severity 1..5 to a uint8 NHWC batch."""
    fn, sevs = CORRUPTIONS.get(name) or EXTRA_CORRUPTIONS[name]
    return fn(images_u8, sevs[severity - 1], key)


DEFAULT_METRICS: tuple[str, ...] = (
    "shannon_entropy", "msp", "least_confidence", "margin", "ratio",
    "max_logit", "energy", "doctor_alpha", "doctor_beta",
)


@functools.lru_cache(maxsize=None)
def _finalize_fn(metric_names: tuple):
    # ONE jitted dispatch for correctness + every metric: the previous
    # eager jnp calls cost ~40 ms each over the tunneled runtime, so a
    # 9-metric finalize burned ~0.4 s per evaluation in launch floors
    @jax.jit
    def run(logits, labels):
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == labels).astype(jnp.float32)
        metrics = {m: um.LOGIT_METRICS[m](logits) for m in metric_names}
        return jnp.mean(correct), correct, metrics

    return run


def _finalize_eval(logits, labels, metric_names):
    acc, correct, metrics = _finalize_fn(tuple(metric_names))(logits, labels)
    return {
        "accuracy": float(acc),
        "correct": correct,
        "logits": logits,
        "metrics": metrics,
    }


from imagetransformations_tpu.core.jitutil import IdLRUCache

#: jitted scanned-forward per (model_fn, to_model_space, batch_size) —
#: bounded LRU so cached params/executables don't accumulate forever
_FWD_CACHE = IdLRUCache(maxsize=16)

#: jitted sharded forwards per (model, preprocess, mesh, axis)
_SHARDED_FWD_CACHE = IdLRUCache(maxsize=16)

#: generation-fused variants (corrupt_fn in the key) — separate small pool
#: so per-call corrupt lambdas can't evict the hot shared forwards
_SHARDED_GEN_FWD_CACHE = IdLRUCache(maxsize=8)


def _sharded_eval_fwd(model_fn, to_model_space, mesh, axis: str):
    """Cached generation-free data-parallel forward: images -> logits with
    the batch dim GSPMD-partitioned over ``mesh[axis]``. Compiled ONCE per
    (model, preprocess, mesh, axis) — the sweep's mesh path reuses it for
    every (corruption, severity) cell instead of recompiling the forward
    inside each cell's closure."""
    # the mesh keys by VALUE (Mesh is hashable): callers constructing a
    # fresh-but-equal mesh per call (e.g. data_mesh() inline) still hit
    fwd = _SHARDED_FWD_CACHE.get((model_fn, to_model_space), (axis, mesh, "nogen"))
    if fwd is None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P(axis))

        @jax.jit
        def fwd(xb):
            logits = model_fn(to_model_space(xb))
            return jax.lax.with_sharding_constraint(logits, sharding)

        _SHARDED_FWD_CACHE.put(
            (model_fn, to_model_space), (axis, mesh, "nogen"), fwd
        )
    return fwd


def _forward_all_fn(model_fn, to_model_space, batch_size: int):
    """Whole-dataset forward as ONE jitted dispatch: pad to a batch_size
    multiple (repeating the last row; padded logits trimmed), reshape to
    [nb, bs, ...], ``lax.scan`` the preprocessed forward over batches.

    The previous per-batch Python loop paid one dispatch floor per batch
    PLUS an eager ``to_model_space`` per batch (~70 ms/batch on the
    tunneled runtime — 40 batches of a 10k-image sweep cell = ~3 s of pure
    overhead). Memory behavior is unchanged: scan keeps one batch of
    activations live at a time.
    """
    hit = _FWD_CACHE.get((model_fn, to_model_space), (int(batch_size),))
    if hit is not None:
        return hit

    @jax.jit
    def run(images_u8):
        n = images_u8.shape[0]
        bs = min(int(batch_size), int(n))
        pad = (-n) % bs
        x = images_u8
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        nb = x.shape[0] // bs
        xb = x.reshape((nb, bs) + x.shape[1:])

        def body(_, b):
            return None, model_fn(to_model_space(b))

        _, lg = jax.lax.scan(body, None, xb)
        lg = lg.reshape((nb * bs,) + lg.shape[2:])
        return lg[:n]

    _FWD_CACHE.put((model_fn, to_model_space), (int(batch_size),), run)
    return run


def _forward_uq_all_fn(
    model_fn,
    feats_logits_fn,
    to_model_space,
    batch_size: int,
    odin_temperature: float = 1000.0,
    odin_eps: float = 0.0014,
):
    """Whole-dataset scanned forward producing (logits, penultimate
    features, ODIN uncertainty) in ONE jitted dispatch.

    Each scan step applies the model three times (the feature forward, the
    ODIN input-gradient backward, the perturbed re-forward at temperature
    T) — the price of the reference harness computing ODIN inline next to
    the logit metrics (attacks/uncertainty/FINAL_cifar_corrupted.py:237-262)
    without paying per-batch dispatch floors. Cached per closure identity
    like ``_forward_all_fn``."""
    from imagetransformations_tpu.uq.odin import odin_uncertainty

    params = (int(batch_size), float(odin_temperature), float(odin_eps))
    hit = _FWD_CACHE.get((model_fn, feats_logits_fn, to_model_space), params)
    if hit is not None:
        return hit

    @jax.jit
    def run(images_u8):
        n = images_u8.shape[0]
        bs = min(int(batch_size), int(n))
        pad = (-n) % bs
        x = images_u8
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        nb = x.shape[0] // bs
        xb = x.reshape((nb, bs) + x.shape[1:])

        def body(_, b):
            xm = to_model_space(b)
            feats, logits = feats_logits_fn(xm)
            od = odin_uncertainty(
                model_fn, xm, float(odin_temperature), float(odin_eps)
            )
            return None, (logits, feats, od)

        _, (lg, ft, od) = jax.lax.scan(body, None, xb)
        lg = lg.reshape((nb * bs,) + lg.shape[2:])
        ft = ft.reshape((nb * bs,) + ft.shape[2:])
        od = od.reshape((nb * bs,) + od.shape[2:])
        return lg[:n], ft[:n], od[:n]

    _FWD_CACHE.put((model_fn, feats_logits_fn, to_model_space), params, run)
    return run


def evaluate_batched(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    to_model_space: Callable[[jnp.ndarray], jnp.ndarray],
    images_u8: jnp.ndarray,
    labels: jnp.ndarray,
    batch_size: int = 256,
    metric_names: tuple[str, ...] = DEFAULT_METRICS,
):
    """Accuracy + per-sample metric arrays over a dataset.

    TWO dispatches total: one scanned forward over all batches
    (``_forward_all_fn``), one fused finalize (``_finalize_fn``).
    """
    logits = _forward_all_fn(model_fn, to_model_space, batch_size)(images_u8)
    return _finalize_eval(logits, labels, metric_names)


def evaluate_sharded(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    to_model_space: Callable[[jnp.ndarray], jnp.ndarray],
    images_u8: jnp.ndarray,
    labels: jnp.ndarray,
    mesh,
    axis: str = "data",
    batch_size: int | None = None,
    metric_names: tuple[str, ...] = DEFAULT_METRICS,
    corrupt_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray] | None = None,
    key: jax.Array | None = None,
):
    """Data-parallel ``evaluate_batched`` over a device mesh (SURVEY §2.11).

    The batch dim is sharded over ``mesh[axis]``; GSPMD partitions the
    (plain-XLA) corruption generator + preprocess + model forward so every
    chip computes logits for its own shard — a pure map, no collectives
    until the host-side accuracy mean. The reference analogue is the lone
    torch DataParallel wrap (attacks/fgsm.py:58); unlike its master-device
    scatter/gather, inputs here are placed shard-by-shard and the per-sample
    metric arrays stay device-sharded until fetched.

    ``corrupt_fn(images_u8, key) -> images_u8`` (optional) runs INSIDE the
    sharded jit, so corruption generation is also data-parallel.
    Pallas-backed ops are NOT partitioned by GSPMD (use
    ``pipeline.sharding.sharded_chain_fn`` for the fused chain); all
    canonical corruption generators are plain XLA and partition cleanly.

    Each global batch is padded to a multiple of the axis size by
    repeating its last row; the padded tail is trimmed from the logits.
    NOTE: when padding occurs AND ``corrupt_fn`` draws randomness shaped
    like the batch, the padded draw shape changes every sample's noise —
    sharded == unsharded generation parity therefore holds exactly when
    each batch divides the axis size (``corruption_sweep(mesh=...)``
    passes whole-dataset batches for this reason).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    ndev = mesh.shape[axis]
    n = int(images_u8.shape[0])
    if batch_size is None:
        batch_size = n
    batch_size = max(int(batch_size), ndev)
    sharding = NamedSharding(mesh, P(axis))

    # cache the jitted sharded forward. Generation-free entries live in
    # the shared _SHARDED_FWD_CACHE; corrupt_fn variants go to their own
    # SMALL cache so per-call lambdas (which can never hit an
    # identity-keyed cache) churn a bounded side pool instead of evicting
    # the hot shared forwards — while a STABLE corrupt_fn callable still
    # compiles once across a whole sweep.
    if corrupt_fn is None:
        cache, key_objs = _SHARDED_FWD_CACHE, (model_fn, to_model_space)
    else:
        cache, key_objs = _SHARDED_GEN_FWD_CACHE, (model_fn, to_model_space, corrupt_fn)
    fwd = cache.get(key_objs, (axis, mesh))
    if fwd is None:

        @jax.jit
        def fwd(xb, k):
            if corrupt_fn is not None:
                xb = corrupt_fn(xb, k)
            logits = model_fn(to_model_space(xb))
            return jax.lax.with_sharding_constraint(logits, sharding)

        cache.put(key_objs, (axis, mesh), fwd)

    if key is None:
        key = jax.random.key(0)
    all_logits = []
    for i in range(0, n, batch_size):
        xb = images_u8[i : i + batch_size]
        pad = (-int(xb.shape[0])) % ndev
        if pad:
            # repeat the LAST row: always available even when the tail
            # batch is shorter than pad (xb[:pad] would under-pad there)
            xb = jnp.concatenate([xb, jnp.repeat(xb[-1:], pad, axis=0)])
        xb = jax.device_put(xb, sharding)
        key, k = jax.random.split(key)
        lg = fwd(xb, k)
        if pad:
            lg = lg[:-pad]
        all_logits.append(lg)
    return _finalize_eval(jnp.concatenate(all_logits), labels, metric_names)


def corruption_sweep(
    model_fn,
    to_model_space,
    clean_images_u8: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    corruption_names: tuple[str, ...] | None = None,
    severities: tuple[int, ...] = (1, 2, 3, 4, 5),
    batch_size: int = 256,
    metric_names: tuple[str, ...] = ("shannon_entropy", "msp", "margin", "energy"),
    mesh=None,
    mesh_axis: str = "data",
    uq_extras: dict | None = None,
):
    """FINAL_cifar_corrupted-style sweep -> nested result dict.

    result[corruption][severity] = {accuracy, auroc per metric}.
    AUROC targets error detection: metric vs (prediction incorrect).

    ``uq_extras`` (single-chip only) adds the reference harness's two
    non-logit detectors as extra "odin"/"mahalanobis" AUROC columns
    (FINAL_cifar_corrupted.py:237-262): a dict with ``feats_logits_fn``
    (model-space x -> (penultimate feats, logits)), ``maha_mean``/
    ``maha_precision`` (clean-feature Gaussian fit, uq.mahalanobis.fit),
    and optional ``odin_temperature``/``odin_eps`` (default 1000/0.0014,
    uncertainty_metrics.py:69-94). Per-cell dispatch count stays 3
    (generate, scanned uq forward, fused stats).

    With ``mesh`` set, generation runs on the batch-sharded dataset (the
    plain-XLA generators GSPMD-partition under their own jits) and the
    forward is a SHARED data-parallel executable (``_sharded_eval_fwd``,
    compiled once for the whole sweep — a per-cell forward closure would
    recompile model+generator for all 75 cells) — the multi-chip form of
    the reference's 15x5x10k sweep (FINAL_cifar_corrupted.py:22-48).
    Results match the single-chip path when the dataset size divides the
    axis size (the same per-cell PRNG key drives generation).
    """
    names = corruption_names or tuple(CORRUPTIONS)
    if uq_extras is not None:
        assert mesh is None, "uq_extras is a single-chip path"
        fwd_uq = _forward_uq_all_fn(
            model_fn,
            uq_extras["feats_logits_fn"],
            to_model_space,
            batch_size,
            uq_extras.get("odin_temperature", 1000.0),
            uq_extras.get("odin_eps", 0.0014),
        )
        stats_uq = _cell_stats_uq_fn(tuple(metric_names))
        mmean = jnp.asarray(uq_extras["maha_mean"])
        mprec = jnp.asarray(uq_extras["maha_precision"])
    stats = _cell_stats_fn(tuple(metric_names))
    xs_sharded = pad = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape[mesh_axis]
        pad = (-int(clean_images_u8.shape[0])) % ndev
        xg = clean_images_u8
        if pad:
            xg = jnp.concatenate([xg, jnp.repeat(xg[-1:], pad, axis=0)])
        xs_sharded = jax.device_put(xg, NamedSharding(mesh, P(mesh_axis)))
    out: dict = {}
    for name in names:
        out[name] = {}
        fn, sevs = CORRUPTIONS.get(name) or EXTRA_CORRUPTIONS[name]
        for sev in severities:
            key, k = jax.random.split(key)
            if mesh is not None:
                imgs = fn(xs_sharded, sevs[sev - 1], k)
                logits = _sharded_eval_fwd(
                    model_fn, to_model_space, mesh, mesh_axis
                )(imgs)
                if pad:
                    logits = logits[:-pad]
            else:
                # THREE dispatches per cell: generate, scanned forward,
                # fused stats (accuracy + every AUROC in one jit) — the
                # per-batch loop + eager metric/auroc calls previously cost
                # seconds of launch floors per cell on the tunneled runtime
                imgs = corrupt(clean_images_u8, name, sev, k)
                if uq_extras is not None:
                    logits, feats, od = fwd_uq(imgs)
                    acc, aucs_arr = stats_uq(
                        logits, labels, feats, od, mmean, mprec
                    )
                    aucs_np = np.asarray(aucs_arr)
                    cols = tuple(metric_names) + ("odin", "mahalanobis")
                    out[name][sev] = {
                        "accuracy": float(acc),
                        "auroc": {m: float(a) for m, a in zip(cols, aucs_np)},
                    }
                    continue
                logits = _forward_all_fn(model_fn, to_model_space, batch_size)(imgs)
            acc, aucs_arr = stats(logits, labels)
            aucs_np = np.asarray(aucs_arr)
            aucs = {m: float(a) for m, a in zip(metric_names, aucs_np)}
            out[name][sev] = {"accuracy": float(acc), "auroc": aucs}
    return out


@functools.lru_cache(maxsize=None)
def _cell_stats_uq_fn(metric_names: tuple):
    """``_cell_stats_fn`` extended with the two non-logit detectors the
    reference sweep computes inline (FINAL_cifar_corrupted.py:237-262):
    ODIN (precomputed per-sample uncertainty) and Mahalanobis distance of
    penultimate features to the clean-feature Gaussian (mean + precision
    passed as runtime operands so one executable serves any fit). Returns
    (accuracy, aucs[M + 2]) with ODIN then Mahalanobis appended."""

    @jax.jit
    def run(logits, labels, feats, od, mmean, mprec):
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == labels).astype(jnp.float32)
        errors = 1.0 - correct
        aucs = []
        for m in metric_names:
            score = um.LOGIT_METRICS[m](logits)
            if m in um.CONFIDENCE_METRICS:
                score = -score
            aucs.append(auroc(score, errors))
        aucs.append(auroc(od, errors))
        # one implementation of the quadratic form (incl. its MXU
        # Precision.HIGHEST requirement) lives in uq.mahalanobis.score
        maha = _maha.score(
            _maha.MahalanobisState(mmean, mprec, per_class=False), feats
        )
        aucs.append(auroc(maha, errors))
        return jnp.mean(correct), jnp.stack(aucs)

    return run


@functools.lru_cache(maxsize=None)
def _cell_stats_fn(metric_names: tuple):
    """Fused sweep-cell statistics: logits, labels -> (accuracy, aucs[M]).

    Error-detection AUROC per metric (confidence metrics flipped so higher
    = more likely error), all inside one jit — the rank-statistic ``auroc``
    is pure jnp.
    """

    @jax.jit
    def run(logits, labels):
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == labels).astype(jnp.float32)
        errors = 1.0 - correct
        aucs = []
        for m in metric_names:
            score = um.LOGIT_METRICS[m](logits)
            if m in um.CONFIDENCE_METRICS:
                score = -score  # flip: higher metric = more confident
            aucs.append(auroc(score, errors))
        stacked = jnp.stack(aucs) if aucs else jnp.zeros((0,), jnp.float32)
        return jnp.mean(correct), stacked

    return run


def analyze_uncertainty_thresholds(
    metrics: dict[str, jnp.ndarray], correct: jnp.ndarray
) -> dict[str, dict]:
    """Optimal threshold by Youden's J + flagged counts per metric.

    Parity with cifar_iterative_mc.py:174-219 (roc_curve -> argmax(tpr-fpr)).
    Targets = misclassification. All metrics analyze in ONE jitted dispatch
    (``_thresholds_fn``); only the final scalar table is fetched.
    """
    names = tuple(metrics)
    if not names:
        return {}
    thr, auc, n_flag, err_rate = _thresholds_fn(names)(
        tuple(metrics[n] for n in names), correct
    )
    thr, auc = np.asarray(thr), np.asarray(auc)
    n_flag, err_rate = np.asarray(n_flag), np.asarray(err_rate)
    return {
        name: {
            "threshold": float(thr[i]),
            "auroc": float(auc[i]),
            "n_flagged": int(n_flag[i]),
            "flagged_error_rate": float(err_rate[i]),
        }
        for i, name in enumerate(names)
    }


@functools.lru_cache(maxsize=None)
def _thresholds_fn(names: tuple):
    @jax.jit
    def run(scores: tuple, correct):
        errors = 1.0 - correct
        thr, auc, n_flag, err_rate = [], [], [], []
        for name, score in zip(names, scores):
            s = -score if name in um.CONFIDENCE_METRICS else score
            t = youden_threshold(s, errors)
            flagged = (s > t).astype(jnp.float32)
            thr.append(t * (-1.0 if name in um.CONFIDENCE_METRICS else 1.0))
            auc.append(auroc(s, errors))
            n_flag.append(jnp.sum(flagged))
            err_rate.append(
                jnp.sum(errors * flagged) / jnp.maximum(jnp.sum(flagged), 1)
            )
        return (jnp.stack(thr), jnp.stack(auc), jnp.stack(n_flag), jnp.stack(err_rate))

    return run
