"""PIL-parity tests for the traced-angle NEAREST rotation kernel
(ops/pallas/rotate_gather.py).

The routing construction (base log-shift + residual selects, dual A/B
buffers for duplicate source rows) is exact; remaining flips vs PIL come
from f32 vs f64 source coordinates at floor boundaries — budget <= 0.5%
like the other NEAREST paths (tests/test_warp.py).
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from imagetransformations_tpu.ops.pallas.rotate_gather import (
    pil_rotate_nearest_batched,
)
from imagetransformations_tpu import ops


def _pil(im, a):
    return np.asarray(Image.fromarray(im).rotate(-float(a), fillcolor=(0, 0, 0)))


@pytest.mark.parametrize(
    "shape,angles,max_angle",
    [
        ((4, 32, 32), [-20.0, 0.0, 10.0, 22.5], 45.0),
        ((2, 37, 53), [7.0, -44.0], 45.0),  # odd, non-square
        ((1, 96, 64), [22.5], 25.0),
    ],
)
def test_traced_rotation_matches_pil(rng, shape, angles, max_angle):
    n, h, w = shape
    imgs = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    out = np.asarray(
        pil_rotate_nearest_batched(
            jnp.asarray(imgs),
            jnp.asarray(angles, np.float32),
            max_angle_deg=max_angle,
        )
    )
    for i, a in enumerate(angles):
        assert (out[i] != _pil(imgs[i], a)).mean() <= 0.005


def test_apply_rotation_traced_routes_to_kernel(rng):
    """apply_rotation with a traced angle vector must stay PIL-parity (it now
    routes here instead of the 525 ms XLA gather warp)."""
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    angles = np.asarray([-22.5, -5.0, 0.0, 17.5], np.float32)
    out = np.asarray(ops.apply_rotation(jnp.asarray(imgs), jnp.asarray(angles)))
    for i, a in enumerate(angles):
        assert (out[i] != _pil(imgs[i], a)).mean() <= 0.005


def test_apply_rotation_static_small_angle_uses_kernel(rng):
    imgs = rng.integers(0, 256, (2, 48, 40, 3), dtype=np.uint8)
    out = np.asarray(ops.apply_rotation(jnp.asarray(imgs), 12.5))
    for i in range(2):
        assert (out[i] != _pil(imgs[i], 12.5)).mean() <= 0.005


def test_apply_rotation_concrete_out_of_bounds_falls_back(rng):
    """Concrete (non-traced) angle arrays beyond +-45 deg must NOT route to
    the roll/select kernel (its routing budget is 45 deg) — the exact XLA
    warp handles them, so 90-degree rotations stay PIL-correct."""
    imgs = rng.integers(0, 256, (2, 24, 24, 3), dtype=np.uint8)
    angles = np.asarray([90.0, -60.0], np.float32)
    out = np.asarray(ops.apply_rotation(jnp.asarray(imgs), jnp.asarray(angles)))
    for i, a in enumerate(angles):
        assert (out[i] != _pil(imgs[i], a)).mean() <= 0.005
