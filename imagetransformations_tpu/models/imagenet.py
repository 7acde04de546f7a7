"""ImageNet classifiers: ResNet-50 (bottleneck) and VGG-19-BN in Flax (NHWC).

The reference evaluates ImageNet with torchvision ``resnet50``
(attacks/uncertainty/FINAL_imagenet_adversarial.py:43, attacks/fgsm/imagenet/*)
and ``vgg19_bn`` (attacks/normal_inference/imagenet_normal.py:60). These are
the same architectures built TPU-first (NHWC, bf16-capable) with torch
state-dict import for running pretrained weights.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

#: torchvision ImageNet normalization
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet(x01: jnp.ndarray) -> jnp.ndarray:
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        norm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.conv1 = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)
        self.bn1 = norm()
        self.conv2 = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                             padding=1, use_bias=False, dtype=self.dtype)
        self.bn2 = norm()
        self.conv3 = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype)
        self.bn3 = norm()
        if self.downsample:
            self.downsample_conv = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype)
            self.downsample_bn = norm()

    def __call__(self, x, train: bool = False):
        ura = not train
        y = nn.relu(self.bn1(self.conv1(x), use_running_average=ura))
        y = nn.relu(self.bn2(self.conv2(y), use_running_average=ura))
        y = self.bn3(self.conv3(y), use_running_average=ura)
        if self.downsample:
            x = self.downsample_bn(self.downsample_conv(x), use_running_average=ura)
        return nn.relu(y + x)


class ResNet50(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                             use_bias=False, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        blocks = []
        for stage, n in enumerate(self.stage_sizes):
            planes = 64 * (2**stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(
                    Bottleneck(
                        planes, stride, downsample=(b == 0), dtype=self.dtype,
                        name=f"layer{stage + 1}_{b}",
                    )
                )
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def backbone(self, x, train: bool = False):
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for block in self.blocks:
            x = block(x, train)
        return jnp.mean(x, axis=(1, 2))  # [N, 2048]

    def __call__(self, x, train: bool = False):
        return self.fc(self.backbone(x, train))

    def features(self, x, train: bool = False):
        return self.backbone(x, train)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        norm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.conv1 = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                             padding=1, use_bias=False, dtype=self.dtype)
        self.bn1 = norm()
        self.conv2 = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                             dtype=self.dtype)
        self.bn2 = norm()
        if self.downsample:
            self.downsample_conv = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype)
            self.downsample_bn = norm()

    def __call__(self, x, train: bool = False):
        ura = not train
        y = nn.relu(self.bn1(self.conv1(x), use_running_average=ura))
        y = self.bn2(self.conv2(y), use_running_average=ura)
        if self.downsample:
            x = self.downsample_bn(self.downsample_conv(x), use_running_average=ura)
        return nn.relu(y + x)


class ResNet18(nn.Module):
    """torchvision resnet18 (the reference's from-scratch adversarial-training
    model, attacks/fgsm.py:55,222). Same stem/stage layout, NHWC.

    The first stage has no downsample projection (stride 1, equal widths), so
    weight import reuses load_resnet_torch_state_dict unchanged.
    """

    num_classes: int = 1000
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                             use_bias=False, dtype=self.dtype)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        blocks = []
        for stage, n in enumerate(self.stage_sizes):
            planes = 64 * (2**stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(
                    BasicBlock(
                        planes, stride, downsample=(stage > 0 and b == 0),
                        dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                    )
                )
        self.blocks = blocks
        self.fc = nn.Dense(self.num_classes, dtype=self.dtype)

    def backbone(self, x, train: bool = False):
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for block in self.blocks:
            x = block(x, train)
        return jnp.mean(x, axis=(1, 2))  # [N, 512]

    def __call__(self, x, train: bool = False):
        return self.fc(self.backbone(x, train))

    def features(self, x, train: bool = False):
        return self.backbone(x, train)


_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGG19BN(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32

    def setup(self):
        convs, bns = [], []
        for i, v in enumerate(_VGG19_CFG):
            if v == "M":
                continue
            convs.append(nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                                 name=f"conv{len(convs)}"))
            bns.append(nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                    name=f"bn{len(bns)}"))
        self.convs, self.bns = convs, bns
        self.fc1 = nn.Dense(4096, dtype=self.dtype)
        self.fc2 = nn.Dense(4096, dtype=self.dtype)
        self.fc3 = nn.Dense(self.num_classes, dtype=self.dtype)
        self.dropout = nn.Dropout(0.5)

    def __call__(self, x, train: bool = False):
        ci = 0
        for v in _VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(
                    self.bns[ci](self.convs[ci](x), use_running_average=not train)
                )
                ci += 1
        # torch flattens CHW; transpose so imported fc1 weights line up
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = self.dropout(nn.relu(self.fc1(x)), deterministic=not train)
        x = self.dropout(nn.relu(self.fc2(x)), deterministic=not train)
        return self.fc3(x)


def load_vgg19_bn_torch_state_dict(state: dict[str, np.ndarray]):
    """torchvision vgg19_bn state_dict (numpy) -> flax variables.

    Mirrors load_resnet50_torch_state_dict so the reference's pretrained
    vgg19_bn runs (attacks/normal_inference/imagenet_normal.py:60).
    features.N.* entries are classified by weight rank (4D = conv, 1D = BN)
    and assigned conv{i}/bn{i} in sequential order; classifier.{0,3,6} map to
    fc1/fc2/fc3.
    """
    params: dict = {}
    stats: dict = {}

    # group the features.* entries by sequential index
    feat: dict[int, dict[str, np.ndarray]] = {}
    for k, v in state.items():
        parts = k.split(".")
        if parts[0] == "features":
            if parts[2] == "num_batches_tracked":
                continue
            feat.setdefault(int(parts[1]), {})[parts[2]] = np.asarray(v)
        elif parts[0] == "classifier":
            name = {"0": "fc1", "3": "fc2", "6": "fc3"}[parts[1]]
            v = np.asarray(v)
            if parts[2] == "weight":
                params.setdefault(name, {})["kernel"] = jnp.asarray(v.T)
            else:
                params.setdefault(name, {})["bias"] = jnp.asarray(v)

    ci = bi = 0
    for idx in sorted(feat):
        entry = feat[idx]
        if entry["weight"].ndim == 4:  # conv (weights HWIO from OIHW)
            params[f"conv{ci}"] = {
                "kernel": jnp.asarray(np.transpose(entry["weight"], (2, 3, 1, 0))),
                "bias": jnp.asarray(entry["bias"]),
            }
            ci += 1
        else:  # batchnorm
            params[f"bn{bi}"] = {
                "scale": jnp.asarray(entry["weight"]),
                "bias": jnp.asarray(entry["bias"]),
            }
            stats[f"bn{bi}"] = {
                "mean": jnp.asarray(entry["running_mean"]),
                "var": jnp.asarray(entry["running_var"]),
            }
            bi += 1
    return {"params": params, "batch_stats": stats}


def load_resnet_torch_state_dict(state: dict[str, np.ndarray]):
    """torchvision resnet18/34/50 state_dict (numpy) -> flax variables.

    Works for BasicBlock and Bottleneck layouts — the key grammar
    (conv{i}/bn{i}/downsample.{0,1}) is identical.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    def conv_w(w):
        return np.transpose(w, (2, 3, 1, 0))

    def put_bn(prefix, field, v):
        if field == "weight":
            put(params, prefix + ("scale",), v)
        elif field == "bias":
            put(params, prefix + ("bias",), v)
        elif field == "running_mean":
            put(stats, prefix + ("mean",), v)
        elif field == "running_var":
            put(stats, prefix + ("var",), v)

    for k, v in state.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[0] == "conv1":
            put(params, ("conv1", "kernel"), conv_w(v))
        elif parts[0] == "bn1":
            put_bn(("bn1",), parts[1], v)
        elif parts[0].startswith("layer"):
            name = f"{parts[0]}_{parts[1]}"
            mod = parts[2]
            if mod.startswith("conv"):
                put(params, (name, mod, "kernel"), conv_w(v))
            elif mod.startswith("bn"):
                put_bn((name, mod), parts[3], v)
            elif mod == "downsample":
                if parts[3] == "0":
                    put(params, (name, "downsample_conv", "kernel"), conv_w(v))
                else:
                    put_bn((name, "downsample_bn"), parts[4], v)
        elif parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), v.T)
            else:
                put(params, ("fc", "bias"), v)
    return {"params": params, "batch_stats": stats}


#: backward-compatible alias (the loader is architecture-agnostic)
load_resnet50_torch_state_dict = load_resnet_torch_state_dict
