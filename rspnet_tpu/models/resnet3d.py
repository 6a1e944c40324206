"""3D ResNet (kenshohara-style) in flax, NDHWC.

Behavior parity with the reference (models/resnet.py): 7^3 stem with stride
(1,2,2), maxpool 3^3 stride 2, four stages with BasicBlock (expansion 1) or
Bottleneck (expansion 4), shortcut type A (stride-avgpool + zero channel pad,
models/resnet.py:30-45) or B (1x1 conv + BN), global avg pool, linear head.
``features`` returns the pre-pool conv5 map (models/resnet.py:203-213).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import AxisName, ConvBN, avg_pool3d, global_avg_pool, max_pool3d


def _shortcut(x, out_channels: int, stride: int, kind: str, module=None,
              train: bool = False):
    in_channels = x.shape[-1]
    if stride == 1 and in_channels == out_channels:
        return x
    if kind == "A":
        # parameter-free: strided 1^3 avg-pool + zero channel padding
        out = avg_pool3d(x, 1, stride)
        pad = out_channels - out.shape[-1]
        if pad > 0:
            out = jnp.pad(out, [(0, 0)] * 4 + [(0, pad)])
        return out
    return module(x, train)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    shortcut: str = "B"
    needs_proj: bool = False
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    expansion = 1

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = ConvBN(self.planes, 3, self.stride, 1, **kw)
        self.conv2 = ConvBN(self.planes, 3, 1, 1, activation=False, **kw)
        if self.needs_proj and self.shortcut == "B":
            self.downsample = ConvBN(self.planes * self.expansion, 1,
                                     self.stride, 0, activation=False, **kw)
        else:
            self.downsample = None

    def __call__(self, x, train: bool = False):
        out = self.conv1(x, train)
        out = self.conv2(out, train)
        residual = _shortcut(x, self.planes * self.expansion, self.stride,
                             self.shortcut, self.downsample, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    shortcut: str = "B"
    needs_proj: bool = False
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    expansion = 4

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = ConvBN(self.planes, 1, 1, 0, **kw)
        self.conv2 = ConvBN(self.planes, 3, self.stride, 1, **kw)
        self.conv3 = ConvBN(self.planes * 4, 1, 1, 0, activation=False, **kw)
        if self.needs_proj and self.shortcut == "B":
            self.downsample = ConvBN(self.planes * self.expansion, 1,
                                     self.stride, 0, activation=False, **kw)
        else:
            self.downsample = None

    def __call__(self, x, train: bool = False):
        out = self.conv1(x, train)
        out = self.conv2(out, train)
        out = self.conv3(out, train)
        residual = _shortcut(x, self.planes * self.expansion, self.stride,
                             self.shortcut, self.downsample, train)
        return nn.relu(out + residual)


class ResNet3D(nn.Module):
    """ResNet3D backbone. Input [B, T, H, W, 3]."""
    block: Any = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 400
    shortcut_type: str = "B"
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 512 * self.block.expansion

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.stem = ConvBN(64, 7, (1, 2, 2), 3, **kw)
        blocks = []
        in_planes = 64
        for stage, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_proj = (stride != 1
                              or in_planes != planes * self.block.expansion)
                blocks.append(self.block(
                    planes=planes, stride=stride,
                    shortcut=self.shortcut_type, needs_proj=needs_proj,
                    name=f"layer{stage + 1}_{i}", **kw))
                in_planes = planes * self.block.expansion
        self.blocks = blocks
        if self.with_classifier:
            self.fc = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

    def features(self, x, train: bool = False):
        x = self.stem(x, train)
        x = max_pool3d(x, 3, 2, 1)
        for block in self.blocks:
            x = block(x, train)
        return x

    def __call__(self, x, train: bool = False):
        feat = self.features(x, train)
        out = global_avg_pool(feat)
        if self.with_classifier:
            out = self.fc(out)
        return out


def resnet10(**kw):
    return ResNet3D(block=BasicBlock, layers=(1, 1, 1, 1), **kw)


def resnet18(**kw):
    return ResNet3D(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet3D(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet3D(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet3D(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNet3D(block=Bottleneck, layers=(3, 8, 36, 3), **kw)


def resnet200(**kw):
    return ResNet3D(block=Bottleneck, layers=(3, 24, 36, 3), **kw)
