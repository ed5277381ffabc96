"""Golden test of the functional ResNet-C4 vs a torch oracle.

torchvision is unavailable, so the oracle builds the standard torchvision
ResNet v1.5 bottleneck topology directly in torch (public architecture) with
torchvision-compatible state_dict names, which also exercises the checkpoint
import mapping.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from os2d_tpu.models.resnet import (
    import_torch_resnet_state_dict,
    init_resnet_c4_params,
    resnet_c4_forward,
)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetC4(nn.Module):
    def __init__(self, layers=(3, 4, 6)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))


def _randomize_bn_stats(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.as_tensor(rng.randn(*m.running_mean.shape).astype(np.float32))
                    * 0.2
                )
                m.running_var.copy_(
                    torch.as_tensor(
                        np.abs(rng.randn(*m.running_var.shape)).astype(np.float32)
                    )
                    + 0.3
                )
                m.weight.copy_(
                    torch.as_tensor(rng.rand(*m.weight.shape).astype(np.float32)) + 0.5
                )
                m.bias.copy_(
                    torch.as_tensor(rng.randn(*m.bias.shape).astype(np.float32)) * 0.1
                )


def test_resnet50_c4_matches_torch_oracle():
    rng = np.random.RandomState(11)
    torch.manual_seed(11)
    model = TorchResNetC4()
    _randomize_bn_stats(model, rng)
    model.eval()

    x = rng.randn(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = model(torch.as_tensor(x)).numpy()  # [2, 1024, 4, 6]

    params = import_torch_resnet_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, "resnet50"
    )
    got = np.asarray(
        resnet_c4_forward(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    )
    assert got.shape == (2, 4, 6, 1024)
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, rtol=1e-3, atol=1e-3
    )


def test_resnet_init_shapes():
    import jax

    params = init_resnet_c4_params(jax.random.PRNGKey(0), "resnet50")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    fm = resnet_c4_forward(params, x)
    assert fm.shape == (1, 4, 4, 1024)
    params101 = init_resnet_c4_params(jax.random.PRNGKey(0), "resnet101")
    assert len(params101["layer3"]) == 23
