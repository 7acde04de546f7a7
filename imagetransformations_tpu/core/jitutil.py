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


class IdLRUCache:
    """Bounded cache keyed by the IDENTITY of caller-supplied callables.

    Jitted wrappers built around user callables (model_fn, preprocess, ...)
    must be cached or every call re-traces and re-compiles — but callables
    are only reliably keyed by identity, and an id-keyed dict must hold a
    strong reference or a dead object's id could be reused by a fresh one
    and hit a stale executable. Entries therefore store the key objects
    strongly (ids stay taken while cached) and evict least-recently-used
    beyond ``maxsize``, bounding the params/executables kept alive.
    """

    def __init__(self, maxsize: int = 16):
        self._maxsize = maxsize
        self._data: dict = {}  # ids -> (key_objects, value)

    def get(self, key_objects: tuple, extra=()):
        k = tuple(id(o) for o in key_objects) + tuple(extra)
        hit = self._data.pop(k, None)
        if hit is None:
            return None
        self._data[k] = hit  # re-insert: most recently used
        return hit[1]

    def put(self, key_objects: tuple, extra, value):
        k = tuple(id(o) for o in key_objects) + tuple(extra)
        self._data[k] = (key_objects, value)
        while len(self._data) > self._maxsize:
            self._data.pop(next(iter(self._data)))
