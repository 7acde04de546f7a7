"""AugMix — batched width-3 Dirichlet mixture of random op chains.

Parity with fall_2025/AugMix.py:30-63: width 3, depth 1-3 chains drawn from
8 PIL-style ops (rotate / posterize / shear / translate-x/y / equalize /
solarize / autocontrast-ish), Dirichlet(1,1,1) mixing weights, Beta(1,1)
blend with the original. TPU-first: chains run over the whole batch; the
random op choice per chain slot uses lax.switch so one executable covers
every draw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from imagetransformations_tpu.ops import elementwise as ew
from imagetransformations_tpu.ops import histogram as hg
from imagetransformations_tpu.ops import warp as wp

F32 = jnp.float32


def _posterize(x, bits=4):
    mask = 0xFF & ~((1 << (8 - bits)) - 1)
    xi = jnp.clip(jnp.trunc(x.astype(F32)), 0, 255).astype(jnp.int32)
    return (xi & mask).astype(x.dtype)


def _solarize(x, threshold=128.0):
    xf = x.astype(F32)
    out = jnp.where(xf >= threshold, 255.0 - xf, xf)
    return jnp.clip(jnp.rint(out), 0, 255).astype(x.dtype)


def _ops_list(w: int, h: int):
    """The 8 AugMix ops as batched severity-3-ish transforms."""
    return [
        lambda x: wp.apply_rotation(x, 15.0),
        lambda x: wp.apply_rotation(x, -15.0),
        lambda x: _posterize(x, 4),
        lambda x: _solarize(x, 128.0),
        lambda x: hg.equalize_channel(
            x.reshape(x.shape[0], h, -1)
        ).reshape(x.shape),
        lambda x: wp.affine_warp(
            x, jnp.asarray([1.0, 0.2, -0.2 * h / 2, 0.0, 1.0, 0.0]), method="nearest"
        ),
        lambda x: wp.apply_translation(x, float(int(w * 0.1)), 0.0),
        lambda x: wp.apply_translation(x, 0.0, float(int(h * 0.1))),
    ]


@functools.partial(jax.jit, static_argnames=("width", "max_depth"))
def augmix(
    images: jnp.ndarray,
    key: jax.Array,
    width: int = 3,
    max_depth: int = 3,
    alpha: float = 1.0,
) -> jnp.ndarray:
    """AugMix a uint8 NHWC batch (shared chain draw across the batch)."""
    n, h, w, c = images.shape
    ops = _ops_list(w, h)
    k_w, k_depth, k_ops, k_dir, k_beta = jax.random.split(key, 5)
    ws = jax.random.dirichlet(k_dir, jnp.full((width,), alpha))
    m = jax.random.beta(k_beta, alpha, alpha)

    depth_draw = jax.random.randint(k_depth, (width,), 1, max_depth + 1)
    op_draw = jax.random.randint(k_ops, (width, max_depth), 0, len(ops))

    xf = images.astype(F32)
    mix = jnp.zeros_like(xf)
    for i in range(width):
        chain = images
        for d in range(max_depth):
            applied = jax.lax.switch(op_draw[i, d], ops, chain)
            chain = jnp.where(d < depth_draw[i], applied, chain)
        mix = mix + ws[i] * chain.astype(F32)
    out = (1.0 - m) * xf + m * mix
    return jnp.clip(jnp.rint(out), 0, 255).astype(images.dtype)
