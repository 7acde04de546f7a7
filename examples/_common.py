"""Shared example setup: a small trained model + data (synthetic by default).

Pass --data-root=<dir with cifar-10-batches-py> to use real CIFAR-10.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def get_data(cfg, n_train: int = 512, n_test: int = 256):
    from imagetransformations_tpu.pipeline.datasets import load_cifar10, synthetic

    try:
        xtr, ytr = load_cifar10(cfg.data_root, train=True)
        xte, yte = load_cifar10(cfg.data_root, train=False)
        return xtr[:n_train], ytr[:n_train], xte[:n_test], yte[:n_test]
    except (FileNotFoundError, OSError):
        xtr, ytr = synthetic(n_train, seed=0)
        xte, yte = synthetic(n_test, seed=1)
        return xtr, ytr, xte, yte


def get_model(xtr, ytr, epochs: int = 3, batch: int = 128):
    """Train a small ResNet-20 briefly; returns (model_fn, to_model_space)."""
    from imagetransformations_tpu.models import resnet20
    from imagetransformations_tpu.models.resnet import normalize_cifar
    from imagetransformations_tpu.models.training import fit

    model = resnet20()

    def to_model(u8):
        return normalize_cifar(u8.astype(jnp.float32) / 255.0)

    def batches():
        for i in range(0, len(xtr), batch):
            yield to_model(jnp.asarray(xtr[i : i + batch])), jnp.asarray(
                ytr[i : i + batch]
            )

    variables = fit(model, list(batches()), epochs=epochs)

    def model_fn(x):
        return model.apply(variables, x)

    return jax.jit(model_fn), to_model, variables, model
