"""CIFAR ResNet-20/56 in Flax (NHWC, bf16-friendly) with torch weight import.

The reference loads ``chenyaofo/pytorch-cifar-models`` ResNet-20/56 via
torch.hub everywhere (e.g. pipeline/metrics/shannon_entropy.py:28,
fall_2025/generalizedOdin2.py:12). This is the same architecture — 3 stages of
n BasicBlocks at widths 16/32/64, option-A identity downsample replaced by the
torch-hub models' option-B 1x1-conv downsample — built TPU-first:

- NHWC layout end-to-end (channel-last maps onto (8,128) VPU lanes).
- ``__call__`` returns logits; ``features`` returns the penultimate pooled
  embedding (parity with the reference's monkey-patched ``forward_features``,
  pipeline/metrics/dknn2.py:109-120).
- ``load_torch_state_dict`` converts a torch checkpoint (state_dict of numpy
  arrays) into Flax variables, for running the reference's exact pretrained
  weights on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Conv3x3 = partial(nn.Conv, kernel_size=(3, 3), use_bias=False, padding=1)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        norm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.conv1 = Conv3x3(self.planes, strides=(self.stride, self.stride),
                             dtype=self.dtype)
        self.bn1 = norm()
        self.conv2 = Conv3x3(self.planes, dtype=self.dtype)
        self.bn2 = norm()
        self.has_downsample = self.stride != 1
        if self.has_downsample:
            self.downsample_conv = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype)
            self.downsample_bn = norm()

    def __call__(self, x, train: bool = False):
        y = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        y = self.bn2(self.conv2(y), use_running_average=not train)
        if self.has_downsample or x.shape[-1] != self.planes:
            x = self.downsample_bn(self.downsample_conv(x),
                                   use_running_average=not train)
        return nn.relu(y + x)


class CifarResNet(nn.Module):
    """ResNet for 32x32 inputs; depth = 6n+2 (n blocks per stage).

    ``mc_dropout=True`` inserts Dropout(p) after each block activation —
    the MC-dropout construction of pipeline/metrics/mutual_info.py:35-41
    (Dropout(0.5) after ReLU/GELU modules); pass a 'dropout' rng and
    ``train=False, mc=True`` to draw stochastic predictive samples.
    """

    num_blocks: Sequence[int] = (9, 9, 9)  # resnet56
    num_classes: int = 10
    dtype: Any = jnp.float32
    dropout_rate: float = 0.5

    def setup(self):
        self.conv1 = Conv3x3(16, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        blocks = []
        for stage, (nblocks, planes) in enumerate(zip(self.num_blocks, (16, 32, 64))):
            for b in range(nblocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(
                    BasicBlock(planes, stride, self.dtype,
                               name=f"layer{stage + 1}_{b}")
                )
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def backbone(self, x, train: bool = False, mc: bool = False):
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        for block in self.blocks:
            x = block(x, train)
            if mc:
                x = self.dropout(x, deterministic=False)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 64]

    def __call__(self, x, train: bool = False, mc: bool = False):
        return self.fc(self.backbone(x, train, mc))

    def features(self, x, train: bool = False, mc: bool = False):
        """Penultimate pooled features (forward_features parity,
        pipeline/metrics/dknn2.py:109-120)."""
        return self.backbone(x, train, mc)

    def features_and_logits(self, x, train: bool = False, mc: bool = False):
        feats = self.backbone(x, train, mc)
        return feats, self.fc(feats)


def resnet20(num_classes: int = 10, dtype=jnp.float32) -> CifarResNet:
    return CifarResNet((3, 3, 3), num_classes, dtype)


def resnet56(num_classes: int = 10, dtype=jnp.float32) -> CifarResNet:
    return CifarResNet((9, 9, 9), num_classes, dtype)


# ------------------------------------------------------------ weight import

#: CIFAR-10 normalization used by every reference eval script
CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)


def normalize_cifar(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] NHWC -> normalized (torchvision Normalize parity)."""
    return (x01 - CIFAR_MEAN) / CIFAR_STD


def load_torch_state_dict(state: dict[str, np.ndarray], num_classes: int = 10):
    """Convert a chenyaofo cifar-resnet torch state_dict to Flax variables.

    Accepts ``{name: ndarray}`` (tensors already converted to numpy). Torch
    conv weights are OIHW -> HWIO; linear weights are [out,in] -> [in,out].
    Returns ``{"params": ..., "batch_stats": ...}``.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO

    for k, v in state.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), conv_w(v))
        elif parts[0] == "bn1":
            _put_bn(params, stats, ("bn1",), parts[1], v)
        elif parts[0].startswith("layer"):
            stage = parts[0]  # layer1..layer3
            block = parts[1]
            mod = parts[2]
            name = f"{stage}_{block}"
            if mod in ("conv1", "conv2"):
                put(params, (name, mod, "kernel"), conv_w(v))
            elif mod in ("bn1", "bn2"):
                _put_bn(params, stats, (name, mod), parts[3], v)
            elif mod == "downsample":
                if parts[3] == "0":  # conv
                    put(params, (name, "downsample_conv", "kernel"), conv_w(v))
                else:  # 1 = bn
                    _put_bn(params, stats, (name, "downsample_bn"), parts[4], v)
        elif parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), v.T)
            else:
                put(params, ("fc", "bias"), v)
    return {"params": params, "batch_stats": stats}


def _put_bn(params, stats, prefix, field, v):
    import jax.numpy as jnp

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    if field == "weight":
        put(params, prefix + ("scale",), v)
    elif field == "bias":
        put(params, prefix + ("bias",), v)
    elif field == "running_mean":
        put(stats, prefix + ("mean",), v)
    elif field == "running_var":
        put(stats, prefix + ("var",), v)
    # num_batches_tracked is dropped
