"""Batch transform driver — the TPU-native ``apply_all_transformations``.

The reference iterates images x 8 transform types in Python, sampling a random
grid value per (image, type) and writing a JPEG per result
(transformation.py:92-170). Here the whole sweep is a handful of compiled
batched calls: for each transform type, one ``[N]`` parameter vector is drawn
from the reference's grid and applied to the entire batch at once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.grids import PARAM_GRIDS, sample_params
from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import noise as nz
from imagetransformations_tpu.ops import stencil as st
from imagetransformations_tpu.ops import warp as wp
from imagetransformations_tpu.pipeline.chain import Chain, build_chain_fn

def _rotation_by_unique_angle(x, values, key):
    """Per-image random angles -> grouped unique-angle 3-shear kernel calls.

    The rotation grid has 19 values (transformation.py:97); each unique value
    runs the shared-angle Pallas kernel on its image subset (executables are
    cached per angle), avoiding the XLA gather warp entirely.
    """
    import numpy as np

    from imagetransformations_tpu.ops.pallas.shear import rotate_3shear

    vals = np.asarray(values)
    out = jnp.zeros_like(x)
    for v in np.unique(vals):
        idx = np.nonzero(vals == v)[0]
        res = rotate_3shear(x[jnp.asarray(idx)], float(v))
        out = out.at[jnp.asarray(idx)].set(res)
    return out


#: transform type -> batched (images, values[N], key) -> images
_BATCHED_OPS: dict[str, Callable] = {
    "lighten_darken": lambda x, v, k: ew.apply_brightness(x, v),
    "contrast": lambda x, v, k: ew.apply_contrast(x, v),
    "blur": lambda x, v, k: st.apply_blur(x, v),
    "gaussian_noise": lambda x, v, k: nz.apply_gaussian_noise(x, v, key=k),
    "rotation": _rotation_by_unique_angle,
    "translation": lambda x, v, k: wp.apply_translation(x, v, v),
    # scale/shear change intermediate canvas size -> value-specialized;
    # the batched fast path uses the affine zoom equivalent for scale.
    "scale": lambda x, v, k: wp.random_zoom(x, v),
    "shear": None,  # handled per-value (output width depends on the value)
}


def transform_batch(images: jnp.ndarray, chain: Chain, key=None, **kw) -> jnp.ndarray:
    """Apply a declarative op-chain to an NHWC batch (fused, jitted)."""
    return build_chain_fn(chain, **kw)(images, key)


def apply_all_transformations(
    images: jnp.ndarray,
    key: jax.Array,
    types: tuple[str, ...] = (
        "scale",
        "rotation",
        "lighten_darken",
        "gaussian_noise",
        "translation",
        "contrast",
        "blur",
        "shear",
    ),
    pil_parity_scale_shear: bool = True,
    pil_parity_rotation: bool = False,
) -> dict[str, tuple[jnp.ndarray, jnp.ndarray]]:
    """TPU equivalent of transformation.py:92-170.

    For each transform type: draw one random grid value per image and apply
    the whole batch in one compiled call. Returns
    ``{type: (values[N], transformed[N,H,W,C])}``.

    ``pil_parity_scale_shear``: scale and shear have value-dependent PIL
    canvas semantics (LANCZOS resize / canvas widening); with parity on they
    are applied per unique value via the exact ops (few compiles — the grids
    have 6 and 11 values); with parity off, scale falls back to the batched
    affine zoom and shear is skipped.
    """
    n = images.shape[0]
    out: dict[str, tuple[jnp.ndarray, jnp.ndarray]] = {}
    keys = jax.random.split(key, 2 * len(types))
    for i, t in enumerate(types):
        vkey, okey = keys[2 * i], keys[2 * i + 1]
        values = sample_params(vkey, t, n)
        fn = _BATCHED_OPS.get(t)
        if t == "rotation" and pil_parity_rotation:
            # exact PIL-NEAREST rotation per unique grid angle (gather path)
            results = _apply_per_value(images, "rotation_pil", values)
        elif t == "shear" or (t == "scale" and pil_parity_scale_shear):
            results = _apply_per_value(images, t, values)
        elif fn is None:
            continue
        else:
            results = fn(images, values, okey)
        out[t] = (values, results)
    return out


def _apply_per_value(images: jnp.ndarray, t: str, values: jnp.ndarray):
    """Exact PIL-semantics path for canvas-changing ops, grouped by value.

    The parameter grids are tiny (<= 21 values) so at most that many compiled
    specializations exist; results are padded back to the input canvas so the
    batch output shape stays static (shear crops to input width; scale is
    already canvas-preserving).
    """
    import numpy as np

    vals = np.asarray(values)
    h, w = images.shape[1], images.shape[2]
    out = jnp.zeros_like(images)
    for v in np.unique(vals):
        idx = np.nonzero(vals == v)[0]
        sub = images[jnp.asarray(idx)]
        if t == "scale":
            res = wp.apply_scale(sub, float(v))
        elif t == "shear":
            res = wp.apply_shear(sub, float(v))[:, :, :w]
        elif t == "rotation_pil":
            res = wp.apply_rotation(sub, float(v))
        else:
            raise ValueError(t)
        out = out.at[jnp.asarray(idx)].set(res)
    return out
