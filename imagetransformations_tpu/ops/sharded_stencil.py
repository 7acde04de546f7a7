"""Spatially-sharded stencils: halo exchange over the ICI mesh.

The batch-sharding in pipeline/sharding.py is a pure map (zero collectives)
— right for many small images. For images too LARGE for one chip (or one
huge image to be processed at minimum latency) the TPU-native answer is
SPATIAL partitioning: shard the row dimension across the mesh and exchange
p halo rows with mesh neighbors over ICI (`jax.lax.ppermute` inside
`shard_map`), the stencil analogue of ring attention's block exchange
(SURVEY.md §2.11 "spatial tiling with halo exchange at tile borders").

Semantics are identical to ops.stencil.gaussian_blur (cv2 GaussianBlur,
reflect-101 borders): interior shard borders get true neighbor rows via the
collective; global top/bottom borders reflect locally. Differential-tested
against the unsharded op on the 8-virtual-device CPU mesh
(tests/test_models_pipeline.py).

Reference behavior: transformation.py:228-257 (apply_blur); the reference
has no distributed execution at all (SURVEY.md §2.11) — this is the
scale-out design the rebuild adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from imagetransformations_tpu.oracle.stencil import cv2_gaussian_ksize, gaussian_taps

F32 = jnp.float32


def _taps_conv(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Valid-region separable conv along ``axis`` (input already padded)."""
    k = len(taps)
    n = x.shape[axis] - (k - 1)
    sl = [slice(None)] * x.ndim
    acc = None
    for t in range(k):
        sl[axis] = slice(t, t + n)
        term = x[tuple(sl)] * taps[t]
        acc = term if acc is None else acc + term
    return acc


def _reflect_rows(x: jnp.ndarray, p: int, top: bool) -> jnp.ndarray:
    """reflect-101 halo rows from a block's own border (global image edge)."""
    return x[:, 1 : p + 1][:, ::-1] if top else x[:, -p - 1 : -1][:, ::-1]


def sharded_gaussian_blur(
    img: jnp.ndarray, radius: float, mesh: Mesh, axis: str = "data"
) -> jnp.ndarray:
    """cv2-semantics Gaussian blur with the ROW dimension sharded over
    ``mesh[axis]`` and p-row halo exchange between neighbor chips.

    img: [N, H, W, C] uint8/f32 with H divisible by the axis size (each
    shard must also hold > p rows). One ppermute pair per direction rides
    the ICI; compute per chip is H/devices rows. Bit-identical to
    ops.stencil.gaussian_blur.
    """
    if radius == 0:
        return img
    k = cv2_gaussian_ksize(float(radius))
    taps = tuple(float(t) for t in gaussian_taps(k, float(radius)))
    p = k // 2
    n_shards = mesh.shape[axis]
    h = img.shape[1]
    if h % n_shards or h // n_shards <= p:
        raise ValueError(
            f"H={h} must be divisible by {n_shards} shards of > {p} rows"
        )

    def block(xb: jnp.ndarray) -> jnp.ndarray:
        # xb: [N, H/d, W, C] local rows
        idx = jax.lax.axis_index(axis)
        xf = xb.astype(F32)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        # device i receives rows from i-1 (its top halo) and i+1 (bottom)
        top_halo = jax.lax.ppermute(xf[:, -p:], axis, fwd)
        bot_halo = jax.lax.ppermute(xf[:, :p], axis, bwd)
        top_halo = jnp.where(idx == 0, _reflect_rows(xf, p, top=True), top_halo)
        bot_halo = jnp.where(
            idx == n_shards - 1, _reflect_rows(xf, p, top=False), bot_halo
        )
        padded = jnp.concatenate([top_halo, xf, bot_halo], axis=1)
        v = _taps_conv(padded, taps, 1)  # vertical over halo'd rows
        wpad = jnp.pad(v, [(0, 0), (0, 0), (p, p), (0, 0)], mode="reflect")
        out = _taps_conv(wpad, taps, 2)  # horizontal is shard-local
        if img.dtype == jnp.uint8:
            out = jnp.clip(jnp.rint(out), 0.0, 255.0).astype(jnp.uint8)
        return out

    spec = P(None, axis, None, None)
    fn = shard_map(
        block, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )
    img = jax.device_put(img, NamedSharding(mesh, spec))
    return jax.jit(fn)(img)
