"""Numerical parity: flax models with imported weights == torch forward pass.

Builds the reference's model architectures in torch (torch-cpu is available),
converts their state dicts through our importers, and compares logits. This
validates that running the reference's pretrained torch.hub checkpoints
through the TPU framework reproduces the reference's numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_cifar_resnet(num_blocks, num_classes=10):
    """chenyaofo/pytorch-cifar-models CifarResNet (BasicBlock) replica."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 16, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(16)
            self.relu = tnn.ReLU()
            cin = 16
            for stage, (n, cout) in enumerate(zip(num_blocks, (16, 32, 64))):
                blocks = []
                for b in range(n):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(BasicBlock(cin, cout, stride))
                    cin = cout
                setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(64, num_classes)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.layer3(self.layer2(self.layer1(x)))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return Net()


@pytest.mark.parametrize("blocks,name", [((3, 3, 3), "resnet20")])
def test_cifar_resnet_torch_forward_parity(blocks, name, rng):
    import torch

    from imagetransformations_tpu.models import resnet20
    from imagetransformations_tpu.models.resnet import load_torch_state_dict

    torch.manual_seed(0)
    tnet = _torch_cifar_resnet(blocks).eval()
    # randomize BN stats so the import of running stats is actually exercised
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = load_torch_state_dict(state)
    model = resnet20()

    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def _torch_resnet50(num_classes=1000):
    """torchvision resnet50 replica (bottleneck, matching state-dict names)."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for stage, n in enumerate((3, 4, 6, 3)):
                planes = 64 * (2**stage)
                blocks = []
                for b in range(n):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(Bottleneck(cin, planes, stride, b == 0))
                    cin = planes * 4
                setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return Net()


def test_resnet50_torch_forward_parity(rng):
    import torch

    from imagetransformations_tpu.models import ResNet50
    from imagetransformations_tpu.models.imagenet import load_resnet50_torch_state_dict

    torch.manual_seed(0)
    tnet = _torch_resnet50().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = load_resnet50_torch_state_dict(state)
    model = ResNet50()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def _torch_vgg19_bn(num_classes=1000):
    """torchvision vgg19_bn replica (matching state-dict key layout)."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, cin = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, v, 3, padding=1), tnn.BatchNorm2d(v), tnn.ReLU()]
            cin = v

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
                tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
                tnn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.features(x)
            return self.classifier(x.flatten(1))

    return Net()


def test_vgg19_bn_torch_forward_parity(rng):
    import torch

    from imagetransformations_tpu.models import VGG19BN
    from imagetransformations_tpu.models.imagenet import load_vgg19_bn_torch_state_dict

    torch.manual_seed(0)
    tnet = _torch_vgg19_bn().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = load_vgg19_bn_torch_state_dict(state)
    model = VGG19BN()

    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-3)


def _torch_resnet18(num_classes=1000):
    """torchvision resnet18 replica (BasicBlock, matching state-dict names)."""
    import torch.nn as tnn

    class BasicBlock(tnn.Module):
        def __init__(self, cin, planes, stride, downsample):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            cin = 64
            for stage, n in enumerate((2, 2, 2, 2)):
                planes = 64 * (2**stage)
                blocks = []
                for b in range(n):
                    stride = 2 if (stage > 0 and b == 0) else 1
                    blocks.append(BasicBlock(cin, planes, stride, stage > 0 and b == 0))
                    cin = planes
                setattr(self, f"layer{stage + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return Net()


def test_resnet18_torch_forward_parity(rng):
    import torch

    from imagetransformations_tpu.models import ResNet18, load_resnet_torch_state_dict

    torch.manual_seed(0)
    tnet = _torch_resnet18().eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = load_resnet_torch_state_dict(state)
    model = ResNet18()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_resnet18_adversarial_train_step(rng):
    """The reference's adversarial-training demo (attacks/fgsm.py:233-263)
    now has its exact architecture: one FGSM adversarial train step on
    ResNet-18 must run and reduce loss on the crafted batch."""
    import optax

    from imagetransformations_tpu.attacks.fgsm import adversarial_train_step
    from imagetransformations_tpu.models import ResNet18

    model = ResNet18(num_classes=10)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 4))
    variables = model.init(jax.random.key(0), x, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)

    def apply_fn(variables, xb, train, mutable=False):
        return model.apply(variables, xb, train=train, mutable=mutable)

    losses = []
    for _ in range(10):
        params, stats, opt_state, loss = adversarial_train_step(
            apply_fn, params, stats, opt_state, tx, x, y, eps=0.03
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[5:]) < losses[0], losses
