"""Profiling: jax.profiler traces + honest per-op throughput counters.

The reference has no tracing at all (SURVEY.md SS5); here:
- ``trace(path)``: context manager around jax.profiler for TensorBoard traces.
- ``op_throughput``: measures true device time of an image op. On the
  tunneled axon runtime ``block_until_ready`` does NOT synchronize, so the
  op is iterated inside one compiled scan and the wall time of a forced
  scalar fetch is differenced over two scan lengths (cancels the ~30 ms RPC
  floor).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _wall(fn, x, reps: int = 3) -> float:
    float(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def op_throughput(
    op: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    k1: int = 4,
    k2: int = 16,
) -> dict:
    """True per-op device time + Gpix/s for an image-batch op."""

    def scanned(k):
        return jax.jit(
            lambda a: jnp.sum(
                jax.lax.scan(lambda c, _: (op(c), None), a, None, length=k)[0].astype(
                    jnp.float32
                )
            )
        )

    w1 = _wall(scanned(k1), x)
    w2 = _wall(scanned(k2), x)
    per = max((w2 - w1) / (k2 - k1), 1e-9)
    npix = x.shape[0] * x.shape[1] * x.shape[2]
    return {
        "ms_per_op": per * 1e3,
        "gpix_per_s": npix / per / 1e9,
        "gbytes_per_s": npix * x.shape[-1] * 2 / per / 1e9,  # u8 in + out
    }
