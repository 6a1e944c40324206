"""MFNet-3D (multi-fiber network) in flax, NDHWC
(reference: models/mfnet/mfnet_3d.py).

Pre-activation BN->ReLU->Conv units; MF_UNIT fiber blocks with grouped
(multi-fiber) 3x3 convs (g=16), 4 stages (3/4/6/3 units), tail BN+ReLU,
global pool, fc. ``features`` returns the post-tail map.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn

from .common import AxisName, BatchNorm, _pad3, _triple, global_avg_pool, max_pool3d

# the reference xavier-inits the whole net (mfnet_3d.py:151
# initializer.xavier); flax's default is lecun_normal, so every conv
# sets this explicitly
_XAVIER = nn.initializers.xavier_uniform()


class BnAcConv(nn.Module):
    """BN -> ReLU -> Conv3d (pre-activation, reference :16-30)."""
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    pad: Tuple[int, int, int] = (0, 0, 0)
    strides: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, kernel_size=_triple(self.kernel),
                    strides=_triple(self.strides),
                    padding=_pad3(self.pad) if isinstance(self.pad, int)
                    else [(p, p) for p in self.pad],
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=_XAVIER,
                    dtype=self.dtype, name="conv")(x)
        return x


class MFUnit(nn.Module):
    """Multi-fiber unit (reference :33-63)."""
    num_mid: int
    num_out: int
    groups: int = 16
    strides: Tuple[int, int, int] = (1, 1, 1)
    first_block: bool = False
    use_3d: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        num_in = x.shape[-1]
        num_ix = self.num_mid // 4
        kt, pt = (3, 1) if self.use_3d else (1, 0)

        # input adapter (fiber mixing)
        h = BnAcConv(num_ix, (1, 1, 1), (0, 0, 0), **kw, name="conv_i1")(
            x, train)
        x_in = x + BnAcConv(num_in, (1, 1, 1), (0, 0, 0), **kw,
                            name="conv_i2")(h, train)

        # main grouped path
        h = BnAcConv(self.num_mid, (kt, 3, 3), (pt, 1, 1),
                     strides=self.strides, groups=self.groups, **kw,
                     name="conv_m1")(x_in, train)
        if self.first_block:
            h = BnAcConv(self.num_out, (1, 1, 1), (0, 0, 0), **kw,
                         name="conv_m2")(h, train)
            x = BnAcConv(self.num_out, (1, 1, 1), (0, 0, 0),
                         strides=self.strides, **kw, name="conv_w1")(x, train)
        else:
            h = BnAcConv(self.num_out, (1, 3, 3), (0, 1, 1),
                         groups=self.groups, **kw, name="conv_m2")(h, train)
        return h + x


_K_SEC = (3, 4, 6, 3)


class MFNet3D(nn.Module):
    num_classes: int = 128
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 768

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.stem = nn.Conv(16, (3, 5, 5), strides=(1, 2, 2),
                            padding=[(1, 1), (2, 2), (2, 2)], use_bias=False,
                            kernel_init=_XAVIER,
                            dtype=self.dtype, name="stem_conv")
        self.stem_bn = BatchNorm(momentum=0.9, dtype=self.dtype,
                                 axis_name=self.axis_name, name="stem_bn")
        units = []
        num_in, num_mid = 16, 96
        num_out = 96
        for s, n_units in enumerate(_K_SEC):
            for i in range(n_units):
                stride = ((2, 1, 1) if (s == 0 and i == 0) else
                          (1, 2, 2) if (s > 0 and i == 0) else (1, 1, 1))
                units.append(MFUnit(
                    num_mid=num_mid, num_out=num_out, groups=16,
                    strides=stride, first_block=(i == 0), **kw,
                    name=f"conv{s + 2}_B{i + 1:02d}"))
            if s < len(_K_SEC) - 1:
                num_mid *= 2
                num_out *= 2
        self.units = units
        self.tail_bn = BatchNorm(momentum=0.9, dtype=self.dtype,
                                 axis_name=self.axis_name, name="tail_bn")
        if self.with_classifier:
            self.fc = nn.Dense(self.num_classes, kernel_init=_XAVIER,
                               dtype=self.dtype, name="fc")

    def features(self, x, train: bool = False):
        x = self.stem(x)
        x = nn.relu(self.stem_bn(x, use_running_average=not train))
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for unit in self.units:
            x = unit(x, train)
        return nn.relu(self.tail_bn(x, use_running_average=not train))

    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        x = global_avg_pool(x)
        if self.with_classifier:
            x = self.fc(x)
        return x
