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

from .common import AxisName, ConvBN, global_avg_pool, max_pool3d


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


def temporal_shift_grouped(x: jnp.ndarray, fold_div: int = 3,
                           groups: int = 2) -> jnp.ndarray:
    """Grouped temporal shift (reference temporal_shift.py:63-104,
    shift_group): channels split into ``groups`` equal slices; EACH group
    shifts its first gc/fold_div channels from t+1, the next gc/fold_div
    from t-1, rest unshifted — the shifted folds sit at the START of each
    output group (the reference's 'way 1' writes them to out[:, :, :fold]
    of every group)."""
    if groups == 1:
        raise ValueError("shift_group is not for groups == 1 "
                         "(reference asserts the same)")
    c = x.shape[-1]
    if c % groups:
        raise ValueError(f"{c} % {groups} != 0")
    gc = c // groups
    fold = gc // fold_div
    zeros = jnp.zeros_like(x[:, :1])
    fwd = jnp.concatenate([x[:, 1:], zeros], axis=1)    # out[t] = x[t+1]
    bwd = jnp.concatenate([zeros, x[:, :-1]], axis=1)   # out[t] = x[t-1]
    outs = []
    for ic in range(groups):
        base = gc * ic
        outs.append(jnp.concatenate([
            fwd[..., base:base + fold],
            bwd[..., base + fold:base + 2 * fold],
            x[..., base + 2 * fold:base + gc]], axis=-1))
    return jnp.concatenate(outs, axis=-1)


class NonLocalBlock(nn.Module):
    """3D non-local block, embedded-gaussian with residual
    (reference models/tsm/non_local.py:9-108, NONLocalBlock3D).

    theta/phi/g are 1x1x1 convs to C/2 channels; phi/g are spatially
    sub-sampled by a (1,2,2) max pool; attention = softmax(theta @ phi^T);
    the output projection W starts at ZERO (bn_layer: zero-init BN scale
    AND bias; else zero-init conv) so the block begins as identity.
    """
    inter_channels: Optional[int] = None
    sub_sample: bool = True
    bn_layer: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        from .common import BatchNorm

        B, T, H, W, C = x.shape
        ic = self.inter_channels or max(C // 2, 1)

        def conv1(feats, name, **kw):
            return nn.Conv(feats, kernel_size=(1, 1, 1), dtype=self.dtype,
                           name=name, **kw)

        g = conv1(ic, "g")(x)
        phi = conv1(ic, "phi")(x)
        theta = conv1(ic, "theta")(x)
        if self.sub_sample:
            g = max_pool3d(g, (1, 2, 2), (1, 2, 2), 0)
            phi = max_pool3d(phi, (1, 2, 2), (1, 2, 2), 0)
        tq = theta.reshape(B, -1, ic)                    # [B, N, ic]
        pk = phi.reshape(B, -1, ic)                      # [B, M, ic]
        gv = g.reshape(B, -1, ic)                        # [B, M, ic]
        att = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", tq, pk), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", att, gv).reshape(B, T, H, W, ic)
        if self.bn_layer:
            w = conv1(C, "w")(y)
            w = BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=self.dtype, axis_name=self.axis_name,
                          scale_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, name="bn")(w)
        else:
            w = conv1(C, "w", kernel_init=nn.initializers.zeros)(y)
        return x + w


class TsmBottleneck(nn.Module):
    """2D ResNet bottleneck with shift-before-conv1 (residual branch only,
    reference make_temporal_shift 'blockres' mode :189-206)."""
    planes: int
    stride: int = 1
    needs_proj: bool = False
    fold_div: int = 8
    shift_groups: int = 1    # >1: grouped shift (temporal_shift.py:63-104)
    use_shift: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

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
        if not self.use_shift:
            h = x
        elif self.shift_groups > 1:
            h = temporal_shift_grouped(x, self.fold_div, self.shift_groups)
        else:
            h = temporal_shift(x, self.fold_div)
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
    shift_groups: int = 1    # >1: grouped shift (temporal_shift.py:63-104)
    use_shift: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

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
        if not self.use_shift:
            h = x
        elif self.shift_groups > 1:
            h = temporal_shift_grouped(x, self.fold_div, self.shift_groups)
        else:
            h = temporal_shift(x, self.fold_div)
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
    shift_groups: int = 1   # >1: grouped shift variant
    non_local: bool = False  # inject non-local blocks into stages 2/3
    with_classifier: bool = True
    consensus: str = "avg"
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        return 512 if self.basic else 2048

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        block_cls = TsmBasicBlock if self.basic else TsmBottleneck
        expansion = block_cls.expansion
        self.stem = ConvBN(64, (1, 7, 7), (1, 2, 2), (0, 3, 3), **kw)
        blocks = []
        nl_blocks = []
        in_planes = 64
        for stage, (planes, n) in enumerate(zip((64, 128, 256, 512),
                                                self.layers)):
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                blocks.append(block_cls(
                    planes=planes, stride=stride, fold_div=self.fold_div,
                    shift_groups=self.shift_groups,
                    needs_proj=(stride != 1
                                or in_planes != planes * expansion),
                    name=f"layer{stage + 1}_{i}", **kw))
                in_planes = planes * expansion
                # non-local injection after every other block of stages
                # 2/3 (reference make_non_local, non_local.py:132-148:
                # layer2 blocks 0,2 of 4; layer3 blocks 0,2,4 of 6 —
                # generalized to even indices before the stage's last)
                if (self.non_local and stage in (1, 2)
                        and i % 2 == 0 and i < n - 1):
                    nl_blocks.append(NonLocalBlock(
                        name=f"nl{stage + 1}_{i}", **kw))
                else:
                    nl_blocks.append(None)
        self.blocks = blocks
        self.nl_blocks = nl_blocks
        if self.with_classifier:
            self.new_fc = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="new_fc")

    def features(self, x, train: bool = False):
        x = self.stem(x, train)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        for b, nl in zip(self.blocks, self.nl_blocks):
            x = b(x, train)
            if nl is not None:
                x = nl(x, train)
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
                    non_local: bool = False, shift_groups: int = 1,
                    **model_cfg):
    """Constructor honoring the reference model config keys
    (config/pretrain/tsm-r18.jsonnet: num_segments, base_model; plus the
    reference's unreachable extras rebuilt working: non_local injection,
    grouped shift)."""
    if base_model not in _BASE_MODELS:
        raise ValueError(f"unknown TSM base_model {base_model!r}; "
                         f"available: {sorted(_BASE_MODELS)}")
    layers, basic = _BASE_MODELS[base_model]

    def ctor(num_classes=174, **kw):
        return TSM(num_classes=num_classes, layers=layers, basic=basic,
                   num_segments=num_segments, non_local=non_local,
                   shift_groups=shift_groups, **kw)
    return ctor
