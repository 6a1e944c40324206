"""S3D-G in flax, NDHWC (reference: models/s3dg.py).

Separable (1,k,k)->(k,1,1) convolutions with optional self-gating (squeeze +
1x1x1 excitation + sigmoid, reference :55-72), inception blocks (:74-99),
16-layer stack (:105-126), dropout + linear head (:129-132).
BN uses the reference's eps=1e-3, momentum=0.001 (torch) -> flax 0.999 (:23).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import AxisName, ConvBN, global_avg_pool, max_pool3d

_BN = dict(bn_eps=1e-3, bn_momentum=0.999)


class SepConv(nn.Module):
    """Spatial (1,k,k) conv+BN+ReLU then temporal (k,1,1) conv+BN+ReLU,
    with optional self-gating SE block."""
    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    gate: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        k, p = self.kernel_size, self.padding
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.down = ConvBN(self.features, (1, k, k), self.strides,
                           (0, p, p), **_BN, **kw, name="down")
        self.up = ConvBN(self.features, (k, 1, 1), 1, (p, 0, 0), **_BN, **kw,
                         name="up")
        if self.gate:
            self.excitation = nn.Conv(self.features, (1, 1, 1), use_bias=True,
                                      dtype=self.dtype, name="excitation")

    def __call__(self, x, train: bool = False):
        x = self.down(x, train)
        x = self.up(x, train)
        if self.gate:
            # squeeze-excite over (T, H, W)
            weight = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            weight = self.excitation(weight)
            x = nn.sigmoid(weight) * x
        return x


class SepInc(nn.Module):
    """Inception block: 1x1 | 1x1->sep3 | 1x1->sep3 | pool->1x1."""
    out_channels: Sequence[int]  # [b0, b1_red, b1, b2_red, b2, b3]
    gate: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        oc = self.out_channels
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        sep = dict(gate=self.gate, dtype=self.dtype, axis_name=self.axis_name)
        self.branch0 = ConvBN(oc[0], 1, 1, 0, **_BN, **kw, name="branch0")
        self.branch1_red = ConvBN(oc[1], 1, 1, 0, **_BN, **kw,
                                  name="branch1_red")
        self.branch1_sep = SepConv(oc[2], 3, 1, 1, **sep, name="branch1_sep")
        self.branch2_red = ConvBN(oc[3], 1, 1, 0, **_BN, **kw,
                                  name="branch2_red")
        self.branch2_sep = SepConv(oc[4], 3, 1, 1, **sep, name="branch2_sep")
        self.branch3 = ConvBN(oc[5], 1, 1, 0, **_BN, **kw, name="branch3")

    def __call__(self, x, train: bool = False):
        b0 = self.branch0(x, train)
        b1 = self.branch1_sep(self.branch1_red(x, train), train)
        b2 = self.branch2_sep(self.branch2_red(x, train), train)
        b3 = self.branch3(max_pool3d(x, 3, 1, 1), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_INC_CHANNELS = [
    ("inc3b", [64, 96, 128, 16, 32, 32], "pool_before_none"),
    ("inc3c", [128, 128, 192, 32, 96, 64], None),
    ("inc4b", [192, 96, 208, 16, 48, 64], "pool3"),
    ("inc4c", [160, 112, 224, 24, 64, 64], None),
    ("inc4d", [128, 128, 256, 24, 64, 64], None),
    ("inc4e", [112, 144, 288, 32, 64, 64], None),
    ("inc4f", [256, 160, 320, 32, 128, 128], None),
    ("inc5b", [256, 160, 320, 32, 128, 128], "pool4"),
    ("inc5c", [384, 192, 384, 48, 128, 128], None),
]


class S3DG(nn.Module):
    num_classes: int = 400
    drop_prob: float = 0.5
    gate: bool = True
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 1024

    def setup(self):
        sep = dict(gate=self.gate, dtype=self.dtype,
                   axis_name=self.axis_name)
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.sepConv1 = SepConv(64, 7, 2, 3, **sep, name="sepConv1")
        self.basicConv3d = ConvBN(64, 1, 1, 0, **_BN, **kw,
                                  name="basicConv3d")
        self.sepConv2 = SepConv(192, 3, 1, 1, **sep, name="sepConv2")
        self.incs = [SepInc(ch, **sep, name=name)
                     for name, ch, _ in _INC_CHANNELS]
        if self.with_classifier:
            self.dropout = nn.Dropout(self.drop_prob)
            self.fc = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")

    def features(self, x, train: bool = False):
        x = self.sepConv1(x, train)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = self.basicConv3d(x, train)
        x = self.sepConv2(x, train)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for (name, _ch, pool), inc in zip(_INC_CHANNELS, self.incs):
            if pool == "pool3":
                x = max_pool3d(x, 3, 2, 1)
            elif pool == "pool4":
                x = max_pool3d(x, 2, 2, 0)
            x = inc(x, train)
        return x

    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        x = global_avg_pool(x)
        if self.with_classifier:
            x = self.dropout(x, deterministic=not train)
            x = self.fc(x)
        return x


def s3dg(**kw):
    return S3DG(gate=True, **kw)


def s3d(**kw):
    return S3DG(gate=False, **kw)
