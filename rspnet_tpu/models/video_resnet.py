"""torchvision-style VideoResNet (r3d_18) in flax, NDHWC.

The reference registry exposes arch 'torchvision-resnet18' backed by
torchvision.models.video.r3d_18 (reference: models/__init__.py:16-75, used
by the r18k400 finetune mixin). Architecture: (3,7,7) stride-(1,2,2) stem
(no maxpool), 4 BasicBlock stages [2,2,2,2] with full spatiotemporal
stride-2 downsampling from stage 2.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn

from .common import AxisName, ConvBN, global_avg_pool


class VideoBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    needs_proj: bool = False
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = ConvBN(self.planes, 3, self.stride, 1, **kw)
        self.conv2 = ConvBN(self.planes, 3, 1, 1, activation=False, **kw)
        self.downsample = (
            ConvBN(self.planes, 1, self.stride, 0, activation=False, **kw)
            if self.needs_proj else None)

    def __call__(self, x, train: bool = False):
        out = self.conv2(self.conv1(x, train), train)
        res = self.downsample(x, train) if self.downsample is not None else x
        return nn.relu(out + res)


class VideoResNet(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 400
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 512

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.stem = ConvBN(64, (3, 7, 7), (1, 2, 2), (1, 3, 3), **kw)
        blocks = []
        in_planes = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                                self.layers)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(VideoBasicBlock(
                    planes=planes, stride=stride,
                    needs_proj=(stride != 1 or in_planes != planes),
                    name=f"layer{stage + 1}_{i}", **kw))
                in_planes = planes
        self.blocks = blocks
        if self.with_classifier:
            self.fc = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

    def features(self, x, train: bool = False):
        x = self.stem(x, train)
        for b in self.blocks:
            x = b(x, train)
        return x

    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        x = global_avg_pool(x)
        if self.with_classifier:
            x = self.fc(x)
        return x


def r3d_18(pretrain: bool = False, **kw):
    import logging
    if pretrain:
        logging.getLogger(__name__).warning(
            "torchvision-resnet18 pretrained weights are not bundled (no "
            "download path); obtain the torchvision r3d_18 state dict and "
            "load it with torch_bridge.torch_to_flax(sd, "
            "'torchvision-resnet18') — the key mapping ships in "
            "KEY_MAPPERS — or pass a converted checkpoint via --mc")
    return VideoResNet(layers=(2, 2, 2, 2), **kw)
