"""Shared building blocks for the 3D backbone zoo.

TPU-native conventions used across all models:
- layout NDHWC: inputs are [B, T, H, W, C] (channels in the lane dim; the
  reference uses NCDHW, models/resnet.py:296).
- params float32, compute dtype selectable (bfloat16 on TPU for MXU tiling).
- BatchNorm takes an optional ``axis_name`` so batch statistics psum across
  the data mesh inside shard_map — the idiomatic replacement for the
  reference's shuffle-BN (SURVEY.md §5.8).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, int):
        return (x, x, x)
    return tuple(x)


def _pad3(p) -> Sequence[Tuple[int, int]]:
    p = _triple(p)
    return [(p[0], p[0]), (p[1], p[1]), (p[2], p[2])]


class ConvBN(nn.Module):
    """Conv3d (+ optional BN, + optional ReLU), torch-parity hyperparams.

    Matches torch Conv3d(padding=p) + BatchNorm3d(momentum=m, eps=e):
    flax momentum = 1 - torch momentum.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int, int]]
    strides: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    use_bias: bool = False
    use_bn: bool = True
    activation: bool = True
    bn_momentum: float = 0.9       # torch default 0.1
    bn_eps: float = 1e-5
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None
    kernel_init: Any = nn.initializers.variance_scaling(
        2.0, "fan_out", "normal")  # kaiming_normal(fan_out), models/resnet.py:160

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            kernel_size=_triple(self.kernel_size),
            strides=_triple(self.strides),
            padding=_pad3(self.padding),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


def max_pool3d(x: jnp.ndarray, kernel, strides, padding=0) -> jnp.ndarray:
    """Torch MaxPool3d semantics (floor mode, -inf padding)."""
    k = _triple(kernel)
    s = _triple(strides)
    return nn.max_pool(x, window_shape=k, strides=s, padding=_pad3(padding))


def avg_pool3d(x: jnp.ndarray, kernel, strides, padding=0) -> jnp.ndarray:
    """Torch AvgPool3d semantics (count_include_pad=True)."""
    k = _triple(kernel)
    s = _triple(strides)
    return nn.avg_pool(x, window_shape=k, strides=s, padding=_pad3(padding),
                       count_include_pad=True)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d(1) + flatten: [B, T, H, W, C] -> [B, C]."""
    return jnp.mean(x, axis=(1, 2, 3))
