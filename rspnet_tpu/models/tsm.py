"""TSM (Temporal Shift Module) on a 2D ResNet, in flax, NDHWC.

The reference's TSM is unimportable as shipped (models/tsm/__init__.py:6-7
imports nonexistent modules, SURVEY.md §2.5); this is a working TPU-native
rebuild of the architecture it intended: a 2D ResNet-50 whose residual
branches are preceded by a temporal channel shift
(reference: models/tsm/temporal_shift.py:43-61 — shift 1/fold_div of the
channels one step forward in time, 1/fold_div backward, zero-padded), with
average segment consensus over frames (models/tsm/basic_ops.py:9-37).

TPU-native formulation: frames stay in [B, T, H, W, C]; "2D" convs are
(1, k, k) 3D convs (T rides the batch dim inside XLA) and the shift is a
static pad+slice on the T axis — no reshape round-trips, fully fusable.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, global_avg_pool, max_pool3d


def temporal_shift(x: jnp.ndarray, fold_div: int = 8) -> jnp.ndarray:
    """Shift channel folds +/-1 step along T with zero padding.

    x: [B, T, H, W, C]. First C/fold_div channels take values from t-1
    ("shift left" in reference indexing: out[:, :-1] = x[:, 1:] means fold 0
    sees the FUTURE frame), next C/fold_div from t+1, rest unchanged
    (reference: temporal_shift.py:43-61).
    """
    c = x.shape[-1]
    fold = c // fold_div
    zeros = jnp.zeros_like(x[:, :1])

    fwd = jnp.concatenate([x[:, 1:], zeros], axis=1)    # out[t] = x[t+1]
    bwd = jnp.concatenate([zeros, x[:, :-1]], axis=1)   # out[t] = x[t-1]
    return jnp.concatenate([
        fwd[..., :fold], bwd[..., fold:2 * fold], x[..., 2 * fold:]],
        axis=-1)


class TsmBottleneck(nn.Module):
    """2D ResNet bottleneck with shift-before-conv1 (residual branch only,
    reference make_temporal_shift 'blockres' mode :189-206)."""
    planes: int
    stride: int = 1
    needs_proj: bool = False
    fold_div: int = 8
    use_shift: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    expansion = 4

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = ConvBN(self.planes, (1, 1, 1), 1, 0, **kw)
        self.conv2 = ConvBN(self.planes, (1, 3, 3), (1, self.stride,
                                                     self.stride),
                            (0, 1, 1), **kw)
        self.conv3 = ConvBN(self.planes * 4, (1, 1, 1), 1, 0,
                            activation=False, **kw)
        self.downsample = (
            ConvBN(self.planes * 4, (1, 1, 1), (1, self.stride, self.stride),
                   0, activation=False, **kw) if self.needs_proj else None)

    def __call__(self, x, train: bool = False):
        h = temporal_shift(x, self.fold_div) if self.use_shift else x
        h = self.conv3(self.conv2(self.conv1(h, train), train), train)
        res = self.downsample(x, train) if self.downsample is not None else x
        return nn.relu(h + res)


class TsmBasicBlock(nn.Module):
    """2D ResNet basic block with shift-before-conv1 (for resnet18/34 base
    models, reference TSN(base_model='resnet18'), models/tsm/models.py)."""
    planes: int
    stride: int = 1
    needs_proj: bool = False
    fold_div: int = 8
    use_shift: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    expansion = 1

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        self.conv1 = ConvBN(self.planes, (1, 3, 3), (1, self.stride,
                                                     self.stride),
                            (0, 1, 1), **kw)
        self.conv2 = ConvBN(self.planes, (1, 3, 3), 1, (0, 1, 1),
                            activation=False, **kw)
        self.downsample = (
            ConvBN(self.planes, (1, 1, 1), (1, self.stride, self.stride),
                   0, activation=False, **kw) if self.needs_proj else None)

    def __call__(self, x, train: bool = False):
        h = temporal_shift(x, self.fold_div) if self.use_shift else x
        h = self.conv2(self.conv1(h, train), train)
        res = self.downsample(x, train) if self.downsample is not None else x
        return nn.relu(h + res)


class TSM(nn.Module):
    """TSM on a 2D ResNet base. Input [B, T(=num_segments), H, W, 3];
    logits are the average consensus over segments.

    ``basic=True`` selects BasicBlock stages (resnet18/34 base models),
    else Bottleneck (resnet50)."""
    num_classes: int = 174
    layers: Sequence[int] = (3, 4, 6, 3)
    basic: bool = False
    num_segments: int = 8  # informational; T rides the input shape
    fold_div: int = 8
    with_classifier: bool = True
    consensus: str = "avg"
    dtype: Any = None
    axis_name: Optional[str] = None

    @property
    def feature_dim(self) -> int:
        return 512 if self.basic else 2048

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        block_cls = TsmBasicBlock if self.basic else TsmBottleneck
        expansion = block_cls.expansion
        self.stem = ConvBN(64, (1, 7, 7), (1, 2, 2), (0, 3, 3), **kw)
        blocks = []
        in_planes = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                                self.layers)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(block_cls(
                    planes=planes, stride=stride, fold_div=self.fold_div,
                    needs_proj=(stride != 1
                                or in_planes != planes * expansion),
                    name=f"layer{stage + 1}_{i}", **kw))
                in_planes = planes * expansion
        self.blocks = blocks
        if self.with_classifier:
            self.new_fc = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="new_fc")

    def features(self, x, train: bool = False):
        x = self.stem(x, train)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for b in self.blocks:
            x = b(x, train)
        return x

    def __call__(self, x, train: bool = False):
        feat = self.features(x, train)           # [B, T, h, w, C]
        per_frame = jnp.mean(feat, axis=(2, 3))  # spatial GAP: [B, T, C]
        if self.with_classifier:
            logits = self.new_fc(per_frame)      # per-segment logits
            return jnp.mean(logits, axis=1)      # avg consensus
        return jnp.mean(per_frame, axis=1)


_BASE_MODELS = {
    # base_model -> (stage depths, BasicBlock?)
    "resnet18": ((2, 2, 2, 2), True),
    "resnet34": ((3, 4, 6, 3), True),
    "resnet50": ((3, 4, 6, 3), False),
}


def get_model_class(base_model: str = "resnet50", num_segments: int = 8,
                    **model_cfg):
    """Constructor honoring the reference model config keys
    (config/pretrain/tsm-r18.jsonnet: num_segments, base_model)."""
    if base_model not in _BASE_MODELS:
        raise ValueError(f"unknown TSM base_model {base_model!r}; "
                         f"available: {sorted(_BASE_MODELS)}")
    layers, basic = _BASE_MODELS[base_model]

    def ctor(num_classes=174, **kw):
        return TSM(num_classes=num_classes, layers=layers, basic=basic,
                   num_segments=num_segments, **kw)
    return ctor
