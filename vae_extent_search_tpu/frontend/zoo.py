"""In-repo model zoo for the task-extraction frontend.

torchvision is not part of this image, so the benchmark-grid
architectures are defined here directly from their published
specifications (He et al. 2015 ResNet with the torchvision V1.5
convention — stride on the bottleneck 3x3, 1x1 projection shortcuts;
Sandler et al. 2018 MobileNetV2; Xie et al. 2016 ResNeXt-50 32x4d;
Zagoruyko & Komodakis 2016 Wide-ResNet-50-2; Radford et al. 2015 DCGAN
generator). Layer-for-layer these match what the reference's relay
importer sees when dump_network_info.py:27-62 loads the torchvision
models — the frontend test pins the traced task lists against
records/networks.py's shape tables.

Only the graph structure matters for task extraction (weights are
random); every model here is fx-traceable with a static graph.
"""

from __future__ import annotations

from typing import Callable, Dict


def _conv_bn(inp, out, k, s, p, groups=1):
    import torch.nn as nn

    return nn.Sequential(
        nn.Conv2d(inp, out, k, s, p, groups=groups, bias=False),
        nn.BatchNorm2d(out),
        nn.ReLU(inplace=True),
    )


def _make_resnet(block, layers, width_per_group=64, groups=1):
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idn)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            width = int(planes * (width_per_group / 64.0)) * groups
            self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(width)
            # V1.5: the stride lives on the 3x3 (torchvision semantics)
            self.conv2 = nn.Conv2d(width, width, 3, stride, 1,
                                   groups=groups, bias=False)
            self.bn2 = nn.BatchNorm2d(width)
            self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idn)

    blk = BasicBlock if block == "basic" else Bottleneck

    class ResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._layer(64, layers[0], 1)
            self.layer2 = self._layer(128, layers[1], 2)
            self.layer3 = self._layer(256, layers[2], 2)
            self.layer4 = self._layer(512, layers[3], 2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * blk.expansion, 1000)

        def _layer(self, planes, n, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes * blk.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * blk.expansion, 1,
                              stride, bias=False),
                    nn.BatchNorm2d(planes * blk.expansion),
                )
            blocks = [blk(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * blk.expansion
            blocks += [blk(self.inplanes, planes) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            return self.fc(x.flatten(1))

    return ResNet()


def _make_mobilenet_v2():
    import torch.nn as nn

    class InvertedResidual(nn.Module):
        def __init__(self, inp, out, stride, expand):
            super().__init__()
            hidden = inp * expand
            self.use_res = stride == 1 and inp == out
            layers = []
            if expand != 1:
                layers.append(_conv_bn(inp, hidden, 1, 1, 0))
            layers += [
                _conv_bn(hidden, hidden, 3, stride, 1, groups=hidden),
                nn.Conv2d(hidden, out, 1, 1, 0, bias=False),
                nn.BatchNorm2d(out),
            ]
            self.conv = nn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    # (expand t, channels c, repeats n, stride s) — MobileNetV2 table 2
    spec = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    class MobileNetV2(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [_conv_bn(3, 32, 3, 2, 1)]
            c_in = 32
            for t, c, n, s in spec:
                for i in range(n):
                    feats.append(
                        InvertedResidual(c_in, c, s if i == 0 else 1, t))
                    c_in = c
            feats.append(_conv_bn(c_in, 1280, 1, 1, 0))
            self.features = nn.Sequential(*feats)
            self.pool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Linear(1280, 1000)

        def forward(self, x):
            x = self.pool(self.features(x))
            return self.classifier(x.flatten(1))

    return MobileNetV2()


def _make_dcgan(image_size: int = 64):
    """DCGAN generator (the reference's relay/testing/dcgan.py get_net,
    ngf=128): dense 100 -> 4*4*1024 (at the 64-px base), then four
    4x4/stride-2/pad-1 transposed convs halving channels to RGB."""
    import torch.nn as nn

    s4 = max(1, image_size // 16)

    class DCGAN(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(100, s4 * s4 * 1024)
            self.s4 = s4
            chans = [(1024, 512), (512, 256), (256, 128), (128, 3)]
            self.deconvs = nn.Sequential(*[
                nn.ConvTranspose2d(ci, co, 4, 2, 1, bias=False)
                for ci, co in chans
            ])

        def forward(self, z):
            x = self.fc(z).reshape(z.shape[0], 1024, self.s4, self.s4)
            return self.deconvs(x)

    return DCGAN()


ZOO_BUILDERS: Dict[str, Callable] = {
    "resnet_18": lambda: _make_resnet("basic", [2, 2, 2, 2]),
    "resnet_50": lambda: _make_resnet("bottleneck", [3, 4, 6, 3]),
    "wide_resnet_50": lambda: _make_resnet(
        "bottleneck", [3, 4, 6, 3], width_per_group=128),
    "resnext_50": lambda: _make_resnet(
        "bottleneck", [3, 4, 6, 3], width_per_group=4, groups=32),
    "mobilenet_v2": _make_mobilenet_v2,
    "dcgan": _make_dcgan,
}


def build_zoo_model(name: str):
    """Instantiate a zoo architecture by grid name."""
    if name not in ZOO_BUILDERS:
        raise ValueError(
            f"no zoo builder for {name!r}; available: "
            f"{sorted(ZOO_BUILDERS)}")
    return ZOO_BUILDERS[name]()
