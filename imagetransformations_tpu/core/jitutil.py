"""jit plumbing for the public op API.

Every public op is jit-compiled: on TPU (especially via a tunneled runtime)
eager per-op dispatch costs orders of magnitude more than a compiled call, and
jit also guarantees the op fuses into one executable. Static configuration
(kernel sizes, output shapes, method flags) is declared via ``static=...``;
per-image parameter *vectors* stay traced so one executable serves every
value.
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def op_jit(fn=None, *, static: tuple[str, ...] = ()):
    """jax.jit wrapper for public ops with named static args."""
    if fn is None:
        return functools.partial(op_jit, static=static)
    jitted = jax.jit(fn, static_argnames=static)
    return functools.wraps(fn)(jitted)


def is_traced(x) -> bool:
    """True if x is a JAX tracer or device array (use jnp math); False for
    python/numpy values (use host numpy math — no eager device dispatch)."""
    return isinstance(x, jax.core.Tracer) or isinstance(x, jax.Array)


def host_scalar(x) -> bool:
    return isinstance(x, (int, float, np.integer, np.floating))
