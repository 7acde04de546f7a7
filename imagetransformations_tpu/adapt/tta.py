"""Test-time augmentation: frozen-model prob averaging + adaptive weights.

Parity map:
- fall_2025/TTA_transforms.py:69-154 -> three augmentation stacks (gentle
  flip/crop, multiscale resize->crop, color adjust) with a per-corruption
  strategy table (:141-154); predict_with_tta (:182-210) averages probs.
- fall_2025/tta_initial.py:108-141   -> adaptive TTA: learn simplex weights
  over {orig, vflip, crop, brightness, contrast} views minimizing ECE on a
  validation split with an accuracy-preservation penalty (scipy SLSQP on
  host — the objective evaluates cached view-probs, so the fit is tiny).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import warp as wp
from imagetransformations_tpu.uq.calibration import ece


def _pad_crop(x: jnp.ndarray, pad: int, key) -> jnp.ndarray:
    n, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, 2 * pad + 1)
    x0 = jax.random.randint(kx, (), 0, 2 * pad + 1)
    return jax.lax.dynamic_slice(xp, (0, y0, x0, 0), (n, h, w, c))


def gentle_stack(x: jnp.ndarray, key: jax.Array) -> list[jnp.ndarray]:
    """Flip + small random crops (TTA_transforms.py:74-95)."""
    k1, k2 = jax.random.split(key)
    return [x, wp.flip_vertical(x), _pad_crop(x, 2, k1), _pad_crop(x, 2, k2)]


def multiscale_stack(x: jnp.ndarray, key: jax.Array) -> list[jnp.ndarray]:
    """Resize up (36/40 for 32px inputs) then center-crop back (:96-118)."""
    n, h, w, c = x.shape
    views = [x]
    for scale in (1.125, 1.25):
        nh, nw = int(h * scale), int(w * scale)
        up = wp.pil_resize(x, nw, nh, "bilinear")
        views.append(wp.center_crop(up, h, w))
    return views


def color_stack(x: jnp.ndarray, key: jax.Array) -> list[jnp.ndarray]:
    """Brightness/contrast jitter (:119-138)."""
    return [
        x,
        ew.apply_brightness(x, 0.1),
        ew.apply_brightness(x, -0.1),
        ew.apply_contrast(x, 0.9),
    ]


#: corruption family -> stack (TTA_transforms.py corruption_to_strategy :141-154)
CORRUPTION_TO_STRATEGY: dict[str, Callable] = {
    **{k: gentle_stack for k in ("gaussian_noise", "shot_noise", "impulse_noise", "speckle_noise")},
    **{k: multiscale_stack for k in ("defocus_blur", "glass_blur", "motion_blur", "zoom_blur", "gaussian_blur")},
    **{k: color_stack for k in ("brightness", "contrast", "fog", "frost", "snow", "saturate", "jpeg_compression", "pixelate", "elastic_transform", "spatter")},
}


from imagetransformations_tpu.core.jitutil import IdLRUCache

#: fused view-generation + V forwards + averaging per (model_fn, stack)
_TTA_CACHE = IdLRUCache(maxsize=16)


def predict_with_tta(
    model_fn: Callable[[jnp.ndarray], jnp.ndarray],
    images: jnp.ndarray,
    key: jax.Array,
    stack: Callable = gentle_stack,
    jit: bool = True,
) -> jnp.ndarray:
    """Mean softmax over the stack's views -> [B, C] probs (one jitted
    dispatch: view generation, every forward, and the average fuse).

    With ``jit=True`` (default) ``stack`` is jit-traced and the executable
    cached by the callable's IDENTITY: pass a stable function object (a
    module-level function, not a fresh lambda/partial per call) or every
    call re-compiles, and keep the stack traceable (no host control flow
    on pixel values). Pass ``jit=False`` for stacks that need eager
    semantics (host branching, numpy randomness, per-call closures)."""

    def run(x, k):
        views = stack(x, k)
        probs = jnp.stack(
            [jax.nn.softmax(model_fn(v), axis=-1) for v in views]
        )
        return jnp.mean(probs, axis=0)

    if not jit:
        return run(images, key)
    fn = _TTA_CACHE.get((model_fn, stack))
    if fn is None:
        fn = jax.jit(run)
        _TTA_CACHE.put((model_fn, stack), (), fn)
    return fn(images, key)


# ------------------------------------------------------- adaptive TTA


def adaptive_view_probs(model_fn, images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """[V, B, C] probs for the adaptive-TTA view set (tta_initial.py:69-90);
    all views + forwards as one cached jitted dispatch."""
    fn = _TTA_CACHE.get((model_fn,), ("adaptive",))
    if fn is None:

        @jax.jit
        def fn(x, key):
            k1, _ = jax.random.split(key)
            views = [
                x,
                wp.flip_vertical(x),
                _pad_crop(x, 2, k1),
                ew.apply_brightness(x, 0.1),
                ew.apply_contrast(x, 0.9),
            ]
            return jnp.stack(
                [jax.nn.softmax(model_fn(v), axis=-1) for v in views]
            )

        _TTA_CACHE.put((model_fn,), ("adaptive",), fn)
    return fn(images, key)


def fit_adaptive_weights(
    view_probs: np.ndarray,
    labels: np.ndarray,
    acc_penalty: float = 10.0,
    n_bins: int = 10,
) -> np.ndarray:
    """Simplex weights minimizing ECE + accuracy-drop penalty via SLSQP.

    tta_initial.py:108-141 (ece_loss_obj :117-127).
    """
    from scipy.optimize import minimize

    view_probs = np.asarray(view_probs)
    labels_j = jnp.asarray(labels)
    v = view_probs.shape[0]
    base_acc = float((view_probs[0].argmax(-1) == np.asarray(labels)).mean())

    def obj(w):
        w = np.clip(w, 0.0, None)
        w = w / max(w.sum(), 1e-12)
        mixed = np.einsum("v,vbc->bc", w, view_probs)
        e = float(ece(jnp.asarray(mixed), labels_j, n_bins))
        acc = float((mixed.argmax(-1) == np.asarray(labels)).mean())
        return e + acc_penalty * max(0.0, base_acc - acc)

    w0 = np.full(v, 1.0 / v)
    res = minimize(
        obj, w0, method="SLSQP",
        bounds=[(0.0, 1.0)] * v,
        constraints=[{"type": "eq", "fun": lambda w: w.sum() - 1.0}],
    )
    w = np.clip(res.x, 0.0, None)
    return w / max(w.sum(), 1e-12)


def predict_adaptive(model_fn, images, key, weights: np.ndarray) -> jnp.ndarray:
    probs = adaptive_view_probs(model_fn, images, key)
    return jnp.einsum("v,vbc->bc", jnp.asarray(weights, jnp.float32), probs)
