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
import numpy as np

from imagetransformations_tpu.core.grids import PARAM_GRIDS, sample_params
from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import noise as nz
from imagetransformations_tpu.ops import stencil as st
from imagetransformations_tpu.ops import warp as wp
from imagetransformations_tpu.pipeline.chain import Chain, build_chain_fn

import functools


def _rotation_by_unique_angle(x, values, key):
    """Per-image random angles via the VMEM-resident traced megakernel
    (log-routed shifts; per-pass uint8 quantization like rotate_3shear —
    stream=False): ~2x the three-kernel path, one executable for any
    angle vector within the grid bound."""
    from imagetransformations_tpu.ops.pallas.megakernel import (
        fused_blur_rotate_batched,
    )

    grid = tuple(float(v) for v in PARAM_GRIDS["rotation"].values())
    return fused_blur_rotate_batched(
        x, 0.0, jnp.asarray(values, jnp.float32), stream=False,
        max_angle_deg=max(abs(v) for v in grid) + 0.5,
    )


@functools.partial(jax.jit, static_argnames=("max_shear",))
def _shear_fast_batched(x, values, max_shear: float):
    """Fast shear: ONE per-image-shift Pallas call (bilinear, white fill),
    cropped to the input canvas — the non-PIL-parity batched path.

    values[n] is each image's shear factor; row y shifts by v*y - ceil(v*h)
    (v > 0) like the reference's widened-canvas crop. The old 11-value
    jnp.where sweep over shear_rows measured 49 s/batch at 32x512x512 (each
    grid value rebuilt a slab padded for shifts up to v*h); the per-image
    kernel is one executable for any value vector.
    """
    n, h = x.shape[0], x.shape[1]
    v = jnp.asarray(values, jnp.float32).reshape(n, 1)
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5).reshape(1, h)
    shifts = v * y - jnp.where(v > 0, jnp.ceil(v * jnp.float32(h)), 0.0)
    from imagetransformations_tpu.ops.pallas.shear import shear_rows_logrouted

    pad = int(np.ceil(max_shear * h)) + 2
    return shear_rows_logrouted(x, shifts, fill=255, max_shift_px=pad)


def _shear_fast(x, values, key):
    grid = tuple(float(v) for v in PARAM_GRIDS["shear"].values())
    return _shear_fast_batched(
        x, jnp.asarray(values, jnp.float32), max(abs(v) for v in grid)
    )


@functools.partial(jax.jit, static_argnames=("bound",))
def _translate_dynamic(x, values, bound: int):
    """Per-image integer translation as pad + vmapped dynamic_slice.

    Bit-identical to apply_translation (crop+paste on black, ``int(tx)``
    truncation toward zero, transformation.py:284-307) for |t| <= bound,
    but a dynamic slice instead of the XLA gather warp
    (~0.26 s -> sub-ms at 32x512x512).
    """
    n, h, w, c = x.shape
    t = jnp.clip(
        jnp.trunc(jnp.asarray(values, jnp.float32)).astype(jnp.int32),
        -bound, bound,
    )
    pad = jnp.pad(x, [(0, 0), (bound, bound), (bound, bound), (0, 0)])

    def one(im, ti):
        return jax.lax.dynamic_slice(im, (bound - ti, bound - ti, 0), (h, w, c))

    return jax.vmap(one)(pad, t)


def _translation_fast(x, values, key):
    grid = tuple(float(v) for v in PARAM_GRIDS["translation"].values())
    return _translate_dynamic(x, values, int(max(abs(v) for v in grid)))


def _zoom_fast(x, values):
    """random_zoom semantics via the gather-free separable kernel (the XLA
    bilinear gather warp costs ~0.8 s per 32x512x512 batch)."""
    from imagetransformations_tpu.ops.pallas.resample import zoom_bilinear_batched

    grid = tuple(float(v) for v in PARAM_GRIDS["scale"].values())
    return zoom_bilinear_batched(
        x, jnp.asarray(values, jnp.float32),
        min_factor=min(grid) - 0.05, max_factor=max(grid) + 0.05,
    )


#: transform type -> batched (images, values[N], key) -> images
_BATCHED_OPS: dict[str, Callable] = {
    "lighten_darken": lambda x, v, k: ew.apply_brightness(x, v),
    "contrast": lambda x, v, k: ew.apply_contrast(x, v),
    "blur": lambda x, v, k: st.apply_blur(x, v),
    "gaussian_noise": lambda x, v, k: nz.apply_gaussian_noise(x, v, key=k),
    "rotation": _rotation_by_unique_angle,
    "translation": _translation_fast,
    # scale/shear change intermediate canvas size; the batched fast paths use
    # the gather-free separable zoom kernel (scale) and the log-routed
    # per-image row-shift kernel (shear)
    "scale": lambda x, v, k: _zoom_fast(x, v),
    "shear": _shear_fast,
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
    fused: bool = True,
) -> dict[str, tuple[jnp.ndarray, jnp.ndarray]]:
    """TPU equivalent of transformation.py:92-170.

    For each transform type: draw one random grid value per image and apply
    the whole batch in one compiled call. Returns
    ``{type: (values[N], transformed[N,H,W,C])}``.

    ``pil_parity_scale_shear``: scale and shear have value-dependent PIL
    canvas semantics (LANCZOS resize / canvas widening); with parity on they
    are applied per unique value via the exact ops (few compiles — the grids
    have 6 and 11 values); with parity off, scale falls back to the batched
    affine zoom and shear to the log-routed fast kernel (``_shear_fast``) —
    both modes produce every one of the 8 type keys.

    ``fused=True`` (the default): the WHOLE sweep (parameter draws + all 8
    batched ops) runs as ONE jitted dispatch — on the tunneled runtime each
    dispatch pays a ~30 ms RPC floor, so the previous one-call-per-type
    structure spent ~8 floors (~0.24 s) of its ~0.35 s steady-state on
    launch overhead alone. One executable per (types, parity flags, shape),
    cached in ``_apply_all_fn`` — but XLA compiles the combined module
    super-linearly (~6 min cold at 32x512x512).

    ``fused=False``: the cold-compile escape hatch (the reference's scripts
    start in ~0 s, transformation.py:356-362). Parameter draws are one tiny
    dispatch; each type then runs through its own independently-jitted op —
    the SAME functions the fused trace inlines, so results are identical —
    and those per-op executables are shared with every other workflow
    (chains, corruption sweeps) that already compiled them. Steady state
    pays ~9 RPC floors (~0.3 s/batch vs 0.05); first call compiles only the
    ops not already cached. Use for one-shot CLI runs; keep ``fused=True``
    for repeated sweeps.
    """
    if not fused:
        return _apply_all_split(
            images, key, tuple(types),
            bool(pil_parity_scale_shear), bool(pil_parity_rotation),
        )
    return _apply_all_fn(
        tuple(types), bool(pil_parity_scale_shear), bool(pil_parity_rotation)
    )(images, key)


@functools.lru_cache(maxsize=None)
def _sample_all_fn(types: tuple[str, ...], n: int):
    """One tiny jitted dispatch drawing every type's parameter vector with
    the SAME key-split order as the fused trace (bitwise-identical draws)."""

    def run(key):
        keys = jax.random.split(key, 2 * len(types))
        return {
            t: (sample_params(keys[2 * i], t, n), keys[2 * i + 1])
            for i, t in enumerate(types)
        }

    return jax.jit(run)


def _apply_all_split(
    images: jnp.ndarray,
    key: jax.Array,
    types: tuple[str, ...],
    pil_parity_scale_shear: bool,
    pil_parity_rotation: bool,
) -> dict[str, tuple[jnp.ndarray, jnp.ndarray]]:
    """Split-dispatch apply_all (``fused=False``): identical per-type logic
    to ``_apply_all_fn``'s trace, executed as host-level calls into the
    per-op jitted executables instead of one combined jit."""
    n = images.shape[0]
    sampled = _sample_all_fn(types, int(n))(key)
    out: dict[str, tuple[jnp.ndarray, jnp.ndarray]] = {}
    for t in types:
        values, okey = sampled[t]
        fn = _BATCHED_OPS.get(t)
        if t == "rotation" and pil_parity_rotation:
            results = _apply_per_value(images, "rotation_pil", values)
        elif (t == "shear" or t == "scale") and pil_parity_scale_shear:
            results = _apply_per_value(images, t, values)
        elif fn is None:
            continue
        else:
            results = fn(images, values, okey)
        out[t] = (values, results)
    return out


@functools.lru_cache(maxsize=None)
def _apply_all_fn(
    types: tuple[str, ...], pil_parity_scale_shear: bool, pil_parity_rotation: bool
):
    def run(images, key):
        n = images.shape[0]
        out: dict[str, tuple[jnp.ndarray, jnp.ndarray]] = {}
        keys = jax.random.split(key, 2 * len(types))
        for i, t in enumerate(types):
            vkey, okey = keys[2 * i], keys[2 * i + 1]
            values = sample_params(vkey, t, n)
            fn = _BATCHED_OPS.get(t)
            if t == "rotation" and pil_parity_rotation:
                # PIL-NEAREST rotation with per-image grid angles via the
                # roll/select kernel (f32 device coords: <=0.5% boundary
                # flips vs PIL's f64, same budget as tests/test_warp.py)
                results = _apply_per_value(images, "rotation_pil", values)
            elif (t == "shear" or t == "scale") and pil_parity_scale_shear:
                # exact PIL canvas semantics (BICUBIC shear / LANCZOS scale)
                # via the traced per-image kernels
                results = _apply_per_value(images, t, values)
            elif fn is None:
                continue
            else:
                results = fn(images, values, okey)
            out[t] = (values, results)
        return out

    return jax.jit(run)


def _apply_per_value(images: jnp.ndarray, t: str, values: jnp.ndarray):
    """Exact PIL-semantics path for canvas-changing ops, grouped by value.

    The parameter grids are tiny (<= 21 values) so at most that many compiled
    specializations exist; results are padded back to the input canvas so the
    batch output shape stays static (shear crops to input width; scale is
    already canvas-preserving).
    """
    import numpy as np

    grid_name = {"scale": "scale", "shear": "shear", "rotation_pil": "rotation"}[t]
    grid = tuple(float(v) for v in PARAM_GRIDS[grid_name].values())
    if t == "shear" and min(grid) >= 0.0:
        # bit-exact apply_shear (BICUBIC, widened canvas, cropped) with
        # per-image traced factors — the grid-value sweep ran 11 gather
        # warps (~49 s per 32x512x512 batch)
        from imagetransformations_tpu.ops.pallas.resample import (
            shear_bicubic_batched,
        )

        return shear_bicubic_batched(
            images, jnp.asarray(values, jnp.float32),
            max_shear=max(grid) + 0.05,
        )
    if t == "scale":
        # bit-exact apply_scale (LANCZOS + center crop/pad) with per-image
        # traced factors: per-image canvas-composed coefficient matrices,
        # ONE resize per image — the grid sweep burned len(grid) full-batch
        # fixed-point resizes (6x redundant compute on the default path)
        return wp.apply_scale_batched(
            images, jnp.asarray(values, jnp.float32), grid
        )
    if t == "rotation_pil" and max(abs(v) for v in grid) <= 45.0:
        # per-image traced angles run directly (PIL-NEAREST roll/select
        # kernel) — the grid sweep burned len(grid) full-batch rotations
        from imagetransformations_tpu.ops.pallas.rotate_gather import (
            pil_rotate_nearest_batched,
        )

        ma = max(abs(v) for v in grid) + 0.5
        return pil_rotate_nearest_batched(
            images, jnp.asarray(values, jnp.float32), max_angle_deg=ma
        )
    return _value_sweep_per_value(images, jnp.asarray(values, jnp.float32), t, grid)


@functools.partial(jax.jit, static_argnames=("t", "grid"))
def _value_sweep_per_value(images, values, t: str, grid: tuple):
    """ONE compiled executable sweeping every grid value and selecting each
    image's row (a host loop over values would pay per-call RPC floors and
    a recompile per value on the tunneled runtime)."""
    w = images.shape[2]
    vd = values.reshape(-1, 1, 1, 1)
    out = jnp.zeros_like(images)
    for v in grid:
        # scale never reaches here: _apply_per_value returns
        # apply_scale_batched for it unconditionally
        if t == "shear":
            res = wp.apply_shear(images, v)[:, :, :w]
        elif t == "rotation_pil":
            res = wp.apply_rotation(images, v)
        else:
            raise ValueError(t)
        out = jnp.where(vd == v, res, out)
    return out
