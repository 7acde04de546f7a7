"""SimpleCNN — the reference's deep-ensemble member architecture.

Parity with pipeline/metrics/ensemble.py:28-47: conv5x5(64)+BN+pool,
conv5x5(128)+BN+pool (VALID padding like torch's default), then
256-128-10 MLP. NHWC Flax.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SimpleCNN(nn.Module):
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        x = nn.Conv(64, (5, 5), padding="VALID", dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(128, (5, 5), padding="VALID", dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm(name="bn2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))  # [N, 128*5*5] for 32x32 input
        x = nn.relu(nn.Dense(256, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(x)
