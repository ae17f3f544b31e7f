"""Faithful plain-torch resnet18/34/50/101/152 for the interop
torchvision stub.

The reference wraps ``torchvision.models.resnet18(pretrained=...)`` and
keeps ``children()[:-1]`` (ref module/vae_layers/conv.py:247-272).  The
import/export oracles and the exporter's template construction need that
path to work when real torchvision is absent, so this module implements
the torchvision resnet module graph — same attribute order (conv1, bn1,
relu, maxpool, layer1..4, avgpool, fc), same state_dict key names, same
shapes — written from the architecture spec (He 2015 / torchvision docs),
not copied.  ``pretrained=True`` is accepted but random-initialized:
interop only needs weight-transplant parity, the values are arbitrary
(real pretrained weights arrive inside reference jobs' state.pth and take
this exact key layout; with real torchvision installed the stub is never
engaged and the genuine pretrained trunk is used).
"""

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        # stride on the 3x3 (torchvision's post-v0.4 "ResNet B" placement)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, 4 * planes, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(4 * planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, num_classes=1000, block=BasicBlock):
        super().__init__()
        self.block = block
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        block, exp = self.block, self.block.expansion
        downsample = None
        if stride != 1 or self.inplanes != planes * exp:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * exp, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * exp))
        mods = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * exp
        mods += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(pretrained=False, **kw):     # noqa: U100 — torchvision signature
    return ResNet([2, 2, 2, 2])


def resnet34(pretrained=False, **kw):     # noqa: U100
    return ResNet([3, 4, 6, 3])


def resnet50(pretrained=False, **kw):     # noqa: U100
    return ResNet([3, 4, 6, 3], block=Bottleneck)


def resnet101(pretrained=False, **kw):    # noqa: U100
    return ResNet([3, 4, 23, 3], block=Bottleneck)


def resnet152(pretrained=False, **kw):    # noqa: U100
    return ResNet([3, 8, 36, 3], block=Bottleneck)


def install():
    """Attach the faithful factories to the torchvision STUB's models
    module (instance attributes win over the stub's __getattr__).  A real
    torchvision (it has a __file__) is left untouched — its genuine
    pretrained trunks are strictly better."""
    import sys
    m = sys.modules.get('torchvision.models')
    if m is not None and getattr(m, '__file__', None) is None:
        m.resnet18 = resnet18
        m.resnet34 = resnet34
        m.resnet50 = resnet50
        m.resnet101 = resnet101
        m.resnet152 = resnet152
