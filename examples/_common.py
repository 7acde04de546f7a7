"""Shared example setup: a small trained model + data (synthetic by default).

Pass --data-root=<dir with cifar-10-batches-py> to use real CIFAR-10.
Thin shims over the package's demo recipe (utils.demo) so examples and the
CLI share one smoke setup.
"""

from __future__ import annotations

from imagetransformations_tpu.utils import demo


def get_data(cfg, n_train: int = 512, n_test: int = 256):
    return demo.get_data(cfg.data_root, n_train=n_train, n_test=n_test)


def get_model(xtr, ytr, epochs: int = 3, batch: int = 128):
    """Train a small ResNet-20 briefly; returns (model_fn, to_model_space)."""
    return demo.get_model(xtr, ytr, epochs=epochs, batch=batch)
