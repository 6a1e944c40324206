"""C3D-BN in flax, NDHWC (reference: models/c3d.py:13-150).

5 conv stages of 3^3 conv + BN + ReLU with interleaved max-pools
(pool1 spatial-only), AdaptiveAvgPool, 512-d embedding, linear head.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .common import AxisName, ConvBN, global_avg_pool, max_pool3d

_STAGES = ["conv1", "conv2", "conv3a", "conv3b", "conv4a", "conv4b",
           "conv5a", "conv5b"]
_WIDTH = {"conv1": 64, "conv2": 128, "conv3a": 256, "conv3b": 256,
          "conv4a": 512, "conv4b": 512, "conv5a": 512, "conv5b": 512}
# pool after these convs: pool1 is spatial-only
_POOL_AFTER = {"conv1": (1, 2, 2), "conv2": (2, 2, 2), "conv3b": (2, 2, 2),
               "conv4b": (2, 2, 2)}


class C3D(nn.Module):
    num_classes: int = 101
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 512

    def setup(self):
        self.convs = [
            ConvBN(_WIDTH[name], 3, 1, 1, use_bias=True, dtype=self.dtype,
                   axis_name=self.axis_name, name=name)
            for name in _STAGES
        ]
        if self.with_classifier:
            self.linear = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="linear")

    def features(self, x, train: bool = False):
        for name, conv in zip(_STAGES, self.convs):
            x = conv(x, train)
            if name in _POOL_AFTER:
                k = _POOL_AFTER[name]
                x = max_pool3d(x, k, k)
        return x

    def __call__(self, x, train: bool = False):
        x = self.features(x, train)
        x = global_avg_pool(x)
        if self.with_classifier:
            x = self.linear(x)
        return x
