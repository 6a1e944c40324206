"""MultiTaskWrapper: backbone + two projection heads, in flax.

Parity contract (reference: moco/split_wrapper.py:66-190):
- pretrain mode: fc1 (A-VID head) and fc2 (RSP head) on the backbone's
  pre-pool feature map; head types linear / mlp / conv / convbn / speednet;
  outputs L2-normalized (speednet's fc2 -> sigmoid scalar).
- finetune mode: global-avg-pool + single ``fc`` classifier.

The backbone is any zoo module exposing ``features`` and ``feature_dim``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..models.common import AxisName, ConvBN, global_avg_pool


class LinearFc(nn.Module):
    moco_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = global_avg_pool(feat)
        return nn.Dense(self.moco_dim, dtype=self.dtype, name="linear")(x)


class MlpFc(nn.Module):
    """SimCLR-style 2-layer head (reference: split_wrapper.py:171-179)."""
    moco_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, train: bool = False):
        x = global_avg_pool(feat)
        x = nn.Dense(feat.shape[-1], dtype=self.dtype, name="hidden")(x)
        x = nn.relu(x)
        return nn.Dense(self.moco_dim, dtype=self.dtype, name="linear")(x)


class ConvFc(nn.Module):
    """conv->relu->conv->GAP->linear (reference: split_wrapper.py:18-39)."""
    moco_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, train: bool = False):
        c = feat.shape[-1]
        x = ConvBN(c, 3, 1, 1, use_bias=True, use_bn=False, activation=True,
                   dtype=self.dtype, name="conv1")(feat, train)
        x = ConvBN(c, 3, 1, 1, use_bias=True, use_bn=False, activation=False,
                   dtype=self.dtype, name="conv2")(x, train)
        x = global_avg_pool(x)
        return nn.Dense(self.moco_dim, dtype=self.dtype, name="linear")(x)


class ConvBnFc(nn.Module):
    """conv->bn->relu->GAP->linear (reference: split_wrapper.py:42-63)."""
    moco_dim: int
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, feat, train: bool = False):
        c = feat.shape[-1]
        x = ConvBN(c, 3, 1, 1, use_bias=True, use_bn=True, activation=True,
                   dtype=self.dtype, axis_name=self.axis_name,
                   name="conv1")(feat, train)
        x = global_avg_pool(x)
        return nn.Dense(self.moco_dim, dtype=self.dtype, name="linear")(x)


def _l2_normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


class MultiTaskWrapper(nn.Module):
    """Two pretext heads over a shared backbone (or finetune classifier)."""
    encoder_factory: Callable[..., nn.Module]
    num_classes: int = 128          # moco dim in pretrain, classes in finetune
    finetune: bool = False
    fc_type: str = "linear"
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        self.encoder = self.encoder_factory(
            num_classes=1, with_classifier=False, dtype=self.dtype,
            axis_name=self.axis_name)
        if self.finetune:
            self.fc = nn.Dense(self.num_classes, dtype=self.dtype)
        else:
            head = {
                "linear": lambda name: LinearFc(self.num_classes,
                                                dtype=self.dtype, name=name),
                "mlp": lambda name: MlpFc(self.num_classes, dtype=self.dtype,
                                          name=name),
                "conv": lambda name: ConvFc(self.num_classes,
                                            dtype=self.dtype, name=name),
                "convbn": lambda name: ConvBnFc(self.num_classes,
                                                dtype=self.dtype,
                                                axis_name=self.axis_name,
                                                name=name),
            }
            if self.fc_type == "speednet":
                self.fc1 = LinearFc(self.num_classes, dtype=self.dtype,
                                    name="fc1")
                self.fc2 = LinearFc(1, dtype=self.dtype, name="fc2")
            elif self.fc_type in head:
                self.fc1 = head[self.fc_type]("fc1")
                self.fc2 = head[self.fc_type]("fc2")
            else:
                raise ValueError(f"Unknown fc_type {self.fc_type!r}")

    def __call__(self, x, train: bool = False):
        return self.forward_with_feature(x, train)[0]

    def features(self, x, train: bool = False):
        return self.encoder.features(x, train)

    def forward_with_feature(self, x, train: bool = False):
        """Returns (head outputs, feature map) — used by CAM visualization
        (reference caches self.feat, split_wrapper.py:129). ``__call__``
        is this minus the feature map, so head behavior cannot diverge
        between training and visualization."""
        feat = self.encoder.features(x, train)
        if self.finetune:
            return self.fc(global_avg_pool(feat)), feat
        x1 = _l2_normalize(self.fc1(feat, train))
        x2 = self.fc2(feat, train)
        x2 = nn.sigmoid(x2) if self.fc_type == "speednet" else _l2_normalize(x2)
        return (x1, x2), feat
