"""R(2+1)D in flax, NDHWC (reference: models/r2plus1d_vcop.py).

Factored spatial (1,k,k) + temporal (k,1,1) convolutions with the paper's
intermediate-channel formula (reference :49-51), residual blocks/layers
(:75-157), VCOP-style (1,1,1,1) layer sizes for the registry arch
'r2plus1d-vcop' (models/__init__.py:65-71).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn

from .common import AxisName, BatchNorm, ConvBN, _triple, global_avg_pool


def intermediate_channels(kernel_size: Tuple[int, int, int],
                          in_channels: int, out_channels: int) -> int:
    """M from R(2+1)D paper §3.5 (reference: r2plus1d_vcop.py:49-51)."""
    kt, kh, kw = kernel_size
    return int(math.floor(
        (kt * kh * kw * in_channels * out_channels)
        / (kh * kw * in_channels + kt * out_channels)))


class SpatioTemporalConv(nn.Module):
    """(1,kh,kw) conv -> BN -> ReLU -> (kt,1,1) conv.

    in_channels is static config (needed to size the factored mid channels
    before seeing data, since setup() runs pre-trace).
    """
    in_channels: int
    features: int
    kernel_size: Union[int, Tuple[int, int, int]]
    strides: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        mid = intermediate_channels(k, self.in_channels, self.features)
        self.spatial = ConvBN(mid, (1, k[1], k[2]), (1, s[1], s[2]),
                              (0, p[1], p[2]), dtype=self.dtype,
                              axis_name=self.axis_name, name="spatial")
        # temporal conv is bare (BN+ReLU added by the caller, reference :62-69)
        self.temporal = ConvBN(self.features, (k[0], 1, 1), (s[0], 1, 1),
                               (p[0], 0, 0), use_bn=False, activation=False,
                               dtype=self.dtype, name="temporal")

    def __call__(self, x, train: bool = False):
        return self.temporal(self.spatial(x, train), train)


def _bn(dtype, axis_name, name):
    return BatchNorm(momentum=0.9, dtype=dtype, axis_name=axis_name,
                     name=name)


class ResBlock(nn.Module):
    in_channels: int
    features: int
    kernel_size: int = 3
    downsample: bool = False
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        pad = self.kernel_size // 2
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        stride = 2 if self.downsample else 1
        self.conv1 = SpatioTemporalConv(self.in_channels, self.features,
                                        self.kernel_size, stride, pad, **kw,
                                        name="conv1")
        self.bn1 = _bn(self.dtype, self.axis_name, "bn1")
        self.conv2 = SpatioTemporalConv(self.features, self.features,
                                        self.kernel_size, 1, pad, **kw,
                                        name="conv2")
        self.bn2 = _bn(self.dtype, self.axis_name, "bn2")
        if self.downsample:
            self.downsampleconv = SpatioTemporalConv(
                self.in_channels, self.features, 1, 2, 0, **kw,
                name="downsampleconv")
            self.downsamplebn = _bn(self.dtype, self.axis_name,
                                    "downsamplebn")

    def __call__(self, x, train: bool = False):
        ura = not train
        res = nn.relu(self.bn1(self.conv1(x, train),
                               use_running_average=ura))
        res = self.bn2(self.conv2(res, train), use_running_average=ura)
        if self.downsample:
            x = self.downsamplebn(self.downsampleconv(x, train),
                                  use_running_average=ura)
        return nn.relu(x + res)


class R2Plus1DNet(nn.Module):
    layer_sizes: Sequence[int] = (1, 1, 1, 1)
    num_classes: int = 101
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 512

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = SpatioTemporalConv(3, 64, (3, 7, 7), (1, 2, 2),
                                        (1, 3, 3), **kw, name="conv1")
        self.bn1 = _bn(self.dtype, self.axis_name, "bn1")
        blocks = []
        in_ch = 64
        for stage, (feats, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layer_sizes)):
            for i in range(n_blocks):
                down = stage > 0 and i == 0
                blocks.append(ResBlock(in_ch, feats, 3, downsample=down, **kw,
                                       name=f"conv{stage + 2}_{i}"))
                in_ch = feats
        self.blocks = blocks
        if self.with_classifier:
            self.linear = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="linear")

    def features(self, x, train: bool = False):
        x = nn.relu(self.bn1(self.conv1(x, train),
                             use_running_average=not train))
        for block in self.blocks:
            x = block(x, train)
        return x

    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        x = global_avg_pool(x)
        if self.with_classifier:
            x = self.linear(x)
        return x


def r2plus1d_vcop(**kw):
    return R2Plus1DNet(layer_sizes=(1, 1, 1, 1), **kw)


def r2plus1d_18(**kw):
    return R2Plus1DNet(layer_sizes=(2, 2, 2, 2), **kw)
