"""Noise-injection ops (gaussian / impulse / shot) with explicit PRNG threading.

The reference draws NumPy randomness implicitly (transformation.py:272-281;
pipenline/cifar_image_transformations.py:39-70). Here every op takes a
``jax.random`` key — or a precomputed draw, so the differential tests can feed
identical randomness to oracle and TPU paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imagetransformations_tpu.core.image import as_batch, as_float, restore_layout
from imagetransformations_tpu.core.jitutil import op_jit

F32 = jnp.float32


def _finalize_u8(x: jnp.ndarray, like_dtype, mode: str) -> jnp.ndarray:
    if like_dtype == jnp.uint8:
        if mode == "astype":  # np .astype(uint8) after clip == trunc
            return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)
        return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)
    return x


@op_jit
def apply_gaussian_noise(img: jnp.ndarray, std, key=None, noise=None) -> jnp.ndarray:
    """px_f32 + N(0, std*255), clip to [0,255] — transformation.py:272-281.

    ``std`` is on the [0,1] scale (grid 0..0.1). Provide either ``key`` or a
    standard-normal ``noise`` array of the same shape.
    """
    x, single = as_batch(img)
    if noise is None:
        noise = jax.random.normal(key, x.shape, dtype=F32)
    else:
        noise, _ = as_batch(jnp.asarray(noise, dtype=F32))
    std = jnp.asarray(std, dtype=F32)
    if std.ndim == 0:
        std = jnp.broadcast_to(std, (x.shape[0],))
    out = as_float(x) + noise * (std.reshape(-1, 1, 1, 1) * F32(255.0))
    return restore_layout(_finalize_u8(out, img.dtype, "astype"), single)


@op_jit
def gaussian_noise_01(img: jnp.ndarray, severity_std, key=None, noise=None) -> jnp.ndarray:
    """TransformationPool variant on [0,1] scale (severities .08/.12/.18/.26/.38).

    Reference pipenline/cifar_image_transformations.py:39-47.
    """
    x, single = as_batch(img)
    if noise is None:
        noise = jax.random.normal(key, x.shape, dtype=F32)
    else:
        noise, _ = as_batch(jnp.asarray(noise, dtype=F32))
    s = jnp.asarray(severity_std, dtype=F32)
    if s.ndim == 0:
        s = jnp.broadcast_to(s, (x.shape[0],))
    x01 = as_float(x) / F32(255.0)
    out = jnp.clip(x01 + noise * s.reshape(-1, 1, 1, 1), 0.0, 1.0) * F32(255.0)
    return restore_layout(_finalize_u8(out, img.dtype, "rint"), single)


@op_jit
def impulse_noise(img: jnp.ndarray, amount, key=None, u=None) -> jnp.ndarray:
    """Salt-and-pepper over fraction ``amount`` of pixels (all channels together).

    Reference pipenline/cifar_image_transformations.py:49-58 (amounts .03-.27).
    """
    x, single = as_batch(img)
    if u is None:
        u = jax.random.uniform(key, x.shape[:-1], dtype=F32)
    else:
        u = jnp.asarray(u, dtype=F32)
        if u.ndim == 2:
            u = u[None]
    a = jnp.asarray(amount, dtype=F32)
    if a.ndim == 0:
        a = jnp.broadcast_to(a, (x.shape[0],))
    a = a.reshape(-1, 1, 1)
    xf = as_float(x)
    salt = (u < a / 2)[..., None]
    pepper = ((u >= a / 2) & (u < a))[..., None]
    out = jnp.where(salt, F32(255.0), jnp.where(pepper, F32(0.0), xf))
    return restore_layout(_finalize_u8(out, img.dtype, "rint"), single)


@op_jit
def shot_noise(img: jnp.ndarray, lam, key=None) -> jnp.ndarray:
    """Poisson shot noise: x' = Poisson(x01 * lam) / lam.

    Reference pipenline/cifar_image_transformations.py:60-70 (lam 60..3,
    smaller = more severe).
    """
    x, single = as_batch(img)
    lam_v = jnp.asarray(lam, dtype=F32)
    if lam_v.ndim == 0:
        lam_v = jnp.broadcast_to(lam_v, (x.shape[0],))
    lam_v = lam_v.reshape(-1, 1, 1, 1)
    rate = as_float(x) / F32(255.0) * lam_v
    draw = jax.random.poisson(key, rate).astype(F32)
    out = jnp.clip(draw / lam_v, 0.0, 1.0) * F32(255.0)
    return restore_layout(_finalize_u8(out, img.dtype, "rint"), single)
