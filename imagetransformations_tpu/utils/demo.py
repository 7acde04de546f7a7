"""Shared smoke setup for examples and the CLI: a small briefly-trained
ResNet-20 + CIFAR-10 data with a synthetic fallback.

One home for the demo recipe (data truncation, normalization, training
budget) so ``python -m imagetransformations_tpu`` and ``examples/*.py``
cannot drift apart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_data(
    data_root: str, n_train: int = 512, n_test: int = 256, verbose: bool = False
):
    """(xtr, ytr, xte, yte) from CIFAR-10 pickles under ``data_root``, or
    deterministic synthetic smoke data when absent."""
    from imagetransformations_tpu.pipeline.datasets import load_cifar10, synthetic

    try:
        xtr, ytr = load_cifar10(data_root, train=True)
        xte, yte = load_cifar10(data_root, train=False)
        return xtr[:n_train], ytr[:n_train], xte[:n_test], yte[:n_test]
    except (FileNotFoundError, OSError):
        if verbose:
            print(f"no CIFAR-10 under {data_root!r}; using synthetic smoke data")
        xtr, ytr = synthetic(n_train, seed=0)
        xte, yte = synthetic(n_test, seed=1)
        return xtr, ytr, xte, yte


def get_model(xtr, ytr, epochs: int = 3, batch: int = 128):
    """Briefly train a ResNet-20; returns (model_fn, to_model_space,
    variables, model)."""
    from imagetransformations_tpu.models import resnet20
    from imagetransformations_tpu.models.resnet import normalize_cifar
    from imagetransformations_tpu.models.training import fit

    model = resnet20()

    def to_model(u8):
        return normalize_cifar(u8.astype(jnp.float32) / 255.0)

    batches = [
        (to_model(jnp.asarray(xtr[i : i + batch])), jnp.asarray(ytr[i : i + batch]))
        for i in range(0, len(xtr), batch)
    ]
    variables = fit(model, batches, epochs=epochs)
    model_fn = jax.jit(lambda x: model.apply(variables, x))
    return model_fn, to_model, variables, model
