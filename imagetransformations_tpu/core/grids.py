"""Discrete transform-parameter grids and deterministic batched sampling.

The reference samples each image's transform value from a discrete
``{min, max, step}`` grid via ``random.choice`` per image
(``transformation.py:95-105`` bounds table, ``:122-139`` sampling). Here the
grids are first-class data and sampling is a deterministic, batched
``jax.random`` draw: one call yields a ``[N]`` parameter vector so a single
compiled executable covers every randomized value (no per-value recompiles).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ParamGrid:
    """Inclusive discrete grid {lo, lo+step, ..., hi} of transform parameters."""

    lo: float
    hi: float
    step: float

    def values(self) -> np.ndarray:
        n = int(round((self.hi - self.lo) / self.step)) + 1
        return np.round(self.lo + self.step * np.arange(n), 10).astype(np.float32)


#: The reference's transform-value bounds (transformation.py:95-105).
PARAM_GRIDS: dict[str, ParamGrid] = {
    "scale": ParamGrid(0.9, 1.4, 0.1),
    "rotation": ParamGrid(-22.5, 22.5, 2.5),
    "lighten_darken": ParamGrid(-0.05, 0.05, 0.01),
    "gaussian_noise": ParamGrid(0.0, 0.1, 0.01),
    "translation": ParamGrid(-50.0, 50.0, 5.0),
    "contrast": ParamGrid(0.0, 1.0, 0.1),
    "blur": ParamGrid(0.0, 5.0, 0.5),
    "shear": ParamGrid(0.0, 1.0, 0.1),
}


def sample_params(key: jax.Array, name: str, n: int) -> jnp.ndarray:
    """Draw ``n`` i.i.d. grid values for transform ``name`` -> f32[n]."""
    vals = jnp.asarray(PARAM_GRIDS[name].values())
    idx = jax.random.randint(key, (n,), 0, vals.shape[0])
    return vals[idx]


def sample_all(key: jax.Array, n: int) -> dict[str, jnp.ndarray]:
    """One ``[n]`` parameter vector per transform type (8 draws, split keys)."""
    keys = jax.random.split(key, len(PARAM_GRIDS))
    return {name: sample_params(k, name, n) for k, name in zip(keys, PARAM_GRIDS)}
