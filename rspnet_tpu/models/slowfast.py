"""SlowFast networks in flax, NDHWC (TPU-native redesign of the vendored
pyslowfast subset, reference: models/slowfast/video_model_builder.py,
resnet_helper.py, nonlocal_helper.py, stem_helper.py, batchnorm_helper.py,
head_helper.py).

Covered variants: every distinct model architecture exposed by the
reference's Kinetics YAML configs (config/slowfast-configs/Kinetics/*.yaml
and Kinetics/c2/*.yaml) — R50 and R101 depths, the *_50_50 / *_50_101 /
*_101_101 temporal-kernel-extent variants, NLN non-local variants, and the
single-pathway SLOW / C2D / I3D families. The static SPECS table below is
pinned against the reference YAMLs by tests/test_models_extended.py
(spec_from_yaml parity), and spec_from_yaml lets users load their own
pyslowfast-style YAML (the reference's yacs surface,
models/slowfast/config/defaults.py:18-516).

Design notes:
- One input clip [B, T, H, W, 3]; the slow pathway subsamples T by alpha
  inside the model (reference does index_select, video_model_builder.py:
  383-396) — a static strided slice here.
- Stems are conv + BN + ReLU + (1,3,3)/(1,2,2) spatial max-pool
  (stem_helper.py:155-180); C2D/I3D additionally temporal-max-pool by 2
  after res2 (the _POOL1 table, video_model_builder.py:67-74).
- Per-block temporal kernels follow the _TEMPORAL_KERNEL_BASIS tables
  (video_model_builder.py:25-65): a stage's basis list cycles per block up
  to NUM_BLOCK_TEMP_KERNEL blocks, then 1 (resnet_helper.py:415-417).
- FuseFastToSlow: (fusion_kernel,1,1) conv with temporal stride alpha, out
  = fusion_ratio * fast channels, concatenated into the slow pathway after
  the stem and after res2..res4 (video_model_builder.py:398-413).
- Non-local: dot-product or softmax attention over THW with (1,2,2) spatial
  max-pool on phi/g (nonlocal_helper.py:10-147) — pure matmuls,
  MXU-friendly. Placed after specific blocks inside a stage per the
  NONLOCAL.LOCATION config.
- norm_type='sub_batchnorm' swaps every BN for SubBatchNorm (split-batch
  statistics, reference batchnorm_helper.py:36-108); the reference YAMLs
  never set it (default 'batchnorm') but the surface is config-reachable.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .common import AxisName, BatchNorm, ConvBN, global_avg_pool, max_pool3d

_R50 = (3, 4, 6, 3)
_R101 = (3, 4, 23, 3)
_NL_STD = ((), (1, 3), (1, 3, 5), ())   # the standard NLN placement

# stem tk + per-stage per-block temporal kernel basis
# (reference _TEMPORAL_KERNEL_BASIS, video_model_builder.py:25-65)
_TK = {
    "slow": (1, ((1,), (1,), (3,), (3,))),
    "c2d": (1, ((1,), (1,), (1,), (1,))),
    "i3d": (5, ((3,), (3, 1), (3, 1), (1, 3))),
    "slowfast_slow": (1, ((1,), (1,), (3,), (3,))),
    "slowfast_fast": (5, ((3,), (3,), (3,), (3,))),
}
# temporal pool after res2 (reference _POOL1, video_model_builder.py:67-74)
_POOL1 = {"slow": 1, "c2d": 2, "c2d_nopool": 1, "i3d": 2, "i3d_nopool": 1,
          "slowfast": 1}


@dataclass(frozen=True)
class SlowFastSpec:
    name: str
    two_pathway: bool
    alpha: int = 8                    # fast/slow frame-rate ratio
    beta_inv: int = 8                 # slow/fast channel ratio
    fusion_kernel: int = 5
    fusion_ratio: int = 2
    depths: Tuple[int, ...] = _R50
    slow_stem_tk: int = 1
    slow_tk: Tuple[Tuple[int, ...], ...] = _TK["slow"][1]
    fast_stem_tk: int = 5
    fast_tk: Tuple[Tuple[int, ...], ...] = _TK["slowfast_fast"][1]
    # blocks per stage that carry a temporal kernel (NUM_BLOCK_TEMP_KERNEL)
    nbtk_slow: Tuple[int, ...] = _R50
    nbtk_fast: Tuple[int, ...] = _R50
    temporal_pool1: int = 1           # c2d/i3d: max-pool T by 2 after res2
    # non-local block indices per stage, slow/single pathway (the reference
    # YAMLs never place NL on the fast pathway)
    nl_blocks: Tuple[Tuple[int, ...], ...] = ((), (), (), ())
    nl_instantiation: str = "dot_product"   # | "softmax"
    norm_type: str = "batchnorm"            # | "sub_batchnorm"
    bn_num_splits: int = 1


def _sf(name, alpha, fk, depths=_R50, nbtk_slow=None, nbtk_fast=None,
        nl=((), (), (), ())):
    return SlowFastSpec(
        name, True, alpha=alpha, fusion_kernel=fk, depths=depths,
        slow_stem_tk=_TK["slowfast_slow"][0], slow_tk=_TK["slowfast_slow"][1],
        fast_stem_tk=_TK["slowfast_fast"][0], fast_tk=_TK["slowfast_fast"][1],
        nbtk_slow=nbtk_slow or depths, nbtk_fast=nbtk_fast or depths,
        nl_blocks=nl)


def _single(name, kind, depths=_R50, nl=((), (), (), ()),
            nl_inst="dot_product", pool_kind=None):
    stem_tk, tk = _TK[kind]
    return SlowFastSpec(
        name, False, depths=depths, slow_stem_tk=stem_tk, slow_tk=tk,
        nbtk_slow=depths, temporal_pool1=_POOL1[pool_kind or kind],
        nl_blocks=nl, nl_instantiation=nl_inst)


# Pinned to the reference YAMLs by tests/test_models_extended.py; yaml file
# names in config/slowfast-configs/Kinetics{,/c2}. NUM_BLOCK_TEMP_KERNEL
# (3,4,6,3) on an R101 is the "_50_50"-style suffix.
SPECS = {
    "SLOWFAST_4x16_R50": _sf("SLOWFAST_4x16_R50", alpha=8, fk=5),
    "SLOWFAST_8x8_R50": _sf("SLOWFAST_8x8_R50", alpha=4, fk=7),
    "SLOWFAST_NLN_4x16_R50": _sf("SLOWFAST_NLN_4x16_R50", alpha=8, fk=5,
                                 nl=_NL_STD),
    "SLOWFAST_NLN_8x8_R50": _sf("SLOWFAST_NLN_8x8_R50", alpha=4, fk=5,
                                nl=_NL_STD),
    "SLOWFAST_8x8_R101_50_50": _sf("SLOWFAST_8x8_R101_50_50", alpha=4, fk=5,
                                   depths=_R101, nbtk_slow=_R50,
                                   nbtk_fast=_R50),
    "SLOWFAST_8x8_R101_50_101": _sf("SLOWFAST_8x8_R101_50_101", alpha=4,
                                    fk=5, depths=_R101, nbtk_slow=_R50,
                                    nbtk_fast=_R101),
    "SLOWFAST_8x8_R101_101_101": _sf("SLOWFAST_8x8_R101_101_101", alpha=4,
                                     fk=5, depths=_R101, nbtk_slow=_R101,
                                     nbtk_fast=_R101),
    "SLOWFAST_16x8_R101_50_50": _sf("SLOWFAST_16x8_R101_50_50", alpha=4,
                                    fk=5, depths=_R101, nbtk_slow=_R50,
                                    nbtk_fast=_R50),
    "SLOWFAST_NLN_16x8_R101_50_50": _sf(
        "SLOWFAST_NLN_16x8_R101_50_50", alpha=4, fk=5, depths=_R101,
        nbtk_slow=_R50, nbtk_fast=_R50, nl=((), (), (6, 13, 20), ())),
    "SLOW_4x16_R50": _single("SLOW_4x16_R50", "slow"),
    "SLOW_8x8_R50": _single("SLOW_8x8_R50", "slow"),
    "SLOW_NLN_4x16_R50": _single("SLOW_NLN_4x16_R50", "slow", nl=_NL_STD),
    "SLOW_NLN_8x8_R50": _single("SLOW_NLN_8x8_R50", "slow", nl=_NL_STD),
    "C2D_8x8_R50": _single("C2D_8x8_R50", "c2d", nl_inst="softmax"),
    "C2D_NLN_8x8_R50": _single("C2D_NLN_8x8_R50", "c2d", nl=_NL_STD,
                               nl_inst="softmax"),
    "C2D_NOPOOL_8x8_R50": _single("C2D_NOPOOL_8x8_R50", "c2d",
                                  nl_inst="softmax",
                                  pool_kind="c2d_nopool"),
    "I3D_8x8_R50": _single("I3D_8x8_R50", "i3d", nl_inst="softmax"),
    "I3D_NLN_8x8_R50": _single("I3D_NLN_8x8_R50", "i3d", nl=_NL_STD,
                               nl_inst="softmax"),
    "I3D_8x8_R101": _single("I3D_8x8_R101", "i3d", depths=_R101,
                            nl_inst="softmax"),
    "I3D_NLN_8x8_R101": _single("I3D_NLN_8x8_R101", "i3d", depths=_R101,
                                nl=_NL_STD, nl_inst="softmax"),
}


def spec_from_yaml_dict(d: dict, name: str) -> SlowFastSpec:
    """pyslowfast-style YAML dict -> SlowFastSpec (the reference's yacs
    config surface, models/slowfast/config/defaults.py). Only the
    model-architecture groups are honored; solver/data keys belong to the
    jsonnet config in this framework."""
    arch = d.get("MODEL", {}).get("ARCH", "slowfast")
    # the c2 NOPOOL configs keep ARCH=c2d but flag it via MODEL_NAME
    # (c2/C2D_NOPOOL_8x8_R50.yaml: MODEL_NAME ResNet_nopool)
    if (d.get("MODEL", {}).get("MODEL_NAME", "").endswith("_nopool")
            and not arch.endswith("_nopool")):
        arch += "_nopool"
    rn = d.get("RESNET", {})
    sf = d.get("SLOWFAST", {})
    nl = d.get("NONLOCAL", {})
    bn = d.get("BN", {})
    depth = rn.get("DEPTH", 50)
    try:
        depths = {50: _R50, 101: _R101}[depth]
    except KeyError:
        raise ValueError(f"unsupported RESNET.DEPTH {depth}")
    nbtk = rn.get("NUM_BLOCK_TEMP_KERNEL") or [[n] * (2 if arch == "slowfast"
                                                      else 1)
                                               for n in depths]
    loc = nl.get("LOCATION") or [[[]] * (2 if arch == "slowfast" else 1)] * 4
    nl_blocks = tuple(tuple(stage[0]) for stage in loc)
    if any(stage[1] for stage in loc if len(stage) > 1):
        raise NotImplementedError("non-local on the fast pathway")
    common = dict(
        depths=depths,
        nbtk_slow=tuple(s[0] for s in nbtk),
        nl_blocks=nl_blocks,
        nl_instantiation=nl.get("INSTANTIATION", "dot_product"),
        norm_type=bn.get("NORM_TYPE", "batchnorm"),
        bn_num_splits=bn.get("NUM_SPLITS", 1),
    )
    if arch == "slowfast":
        stem_tk, tk = _TK["slowfast_slow"]
        f_stem, f_tk = _TK["slowfast_fast"]
        return SlowFastSpec(
            name, True, alpha=sf.get("ALPHA", 8),
            beta_inv=sf.get("BETA_INV", 8),
            fusion_ratio=sf.get("FUSION_CONV_CHANNEL_RATIO", 2),
            fusion_kernel=sf.get("FUSION_KERNEL_SZ", 5),
            slow_stem_tk=stem_tk, slow_tk=tk,
            fast_stem_tk=f_stem, fast_tk=f_tk,
            nbtk_fast=tuple(s[1] for s in nbtk),
            temporal_pool1=_POOL1["slowfast"], **common)
    if arch in ("slow", "c2d", "i3d", "c2d_nopool", "i3d_nopool"):
        kind = arch.replace("_nopool", "")
        stem_tk, tk = _TK[kind]
        return SlowFastSpec(
            name, False, slow_stem_tk=stem_tk, slow_tk=tk,
            temporal_pool1=_POOL1[arch], **common)
    raise ValueError(f"unsupported MODEL.ARCH {arch!r}")


def spec_from_yaml(path: str, name: Optional[str] = None) -> SlowFastSpec:
    import os

    import yaml
    with open(path) as f:
        d = yaml.safe_load(f)
    return spec_from_yaml_dict(
        d, name or os.path.splitext(os.path.basename(path))[0])


class NonLocal(nn.Module):
    """Non-local block (reference: nonlocal_helper.py:10-147).

    instantiation='softmax' scales by inner**-0.5 then softmaxes over keys;
    'dot_product' divides the raw correlation by the number of key
    positions (nonlocal_helper.py:117-129)."""
    inner: int
    instantiation: str = "dot_product"
    bn_splits: int = 1
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import SubBatchNorm

        B, T, H, W, C = x.shape
        theta = nn.Conv(self.inner, (1, 1, 1), dtype=self.dtype,
                        name="theta")(x)
        pooled = max_pool3d(x, (1, 2, 2), (1, 2, 2))
        phi = nn.Conv(self.inner, (1, 1, 1), dtype=self.dtype,
                      name="phi")(pooled)
        g = nn.Conv(self.inner, (1, 1, 1), dtype=self.dtype, name="g")(pooled)

        q = theta.reshape(B, T * H * W, self.inner)
        k = phi.reshape(B, -1, self.inner)
        v = g.reshape(B, -1, self.inner)
        attn = jnp.einsum("bqc,bkc->bqk", q, k)
        if self.instantiation == "softmax":
            attn = nn.softmax(attn * (self.inner ** -0.5), axis=-1)
        else:  # dot_product
            attn = attn / k.shape[1]
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(
            B, T, H, W, self.inner)
        # output conv + zero-init norm scale so the block starts as identity
        out = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="out")(out)
        if self.bn_splits > 1:
            out = SubBatchNorm(num_splits=self.bn_splits, momentum=0.9,
                               scale_init=nn.initializers.zeros,
                               dtype=self.dtype, name="bn")(out, train)
        else:
            out = BatchNorm(use_running_average=not train, momentum=0.9,
                            scale_init=nn.initializers.zeros,
                            dtype=self.dtype, axis_name=self.axis_name,
                            name="bn")(out)
        return x + out


class Bottleneck(nn.Module):
    """(tk,1,1) -> (1,3,3) -> (1,1,1) bottleneck
    (reference: resnet_helper.py BottleneckTransform:118-242)."""
    planes: int
    out_planes: int
    temp_kernel: int = 1
    stride: int = 1
    needs_proj: bool = False
    bn_splits: int = 1
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                  bn_splits=self.bn_splits)
        tk = self.temp_kernel
        self.conv1 = ConvBN(self.planes, (tk, 1, 1), 1,
                            (tk // 2, 0, 0), **kw)
        self.conv2 = ConvBN(self.planes, (1, 3, 3),
                            (1, self.stride, self.stride), (0, 1, 1), **kw)
        # RESNET.ZERO_INIT_FINAL_BN (every reference Kinetics YAML sets
        # it): zero gamma on the residual branch's last BN so blocks
        # start as identity
        self.conv3 = ConvBN(self.out_planes, (1, 1, 1), 1, 0,
                            activation=False,
                            bn_scale_init=nn.initializers.zeros, **kw)
        self.downsample = (
            ConvBN(self.out_planes, (1, 1, 1),
                   (1, self.stride, self.stride), 0, activation=False, **kw)
            if self.needs_proj else None)

    def __call__(self, x, train: bool = False):
        h = self.conv3(self.conv2(self.conv1(x, train), train), train)
        res = self.downsample(x, train) if self.downsample is not None else x
        return nn.relu(h + res)


class Pathway(nn.Module):
    """Stem + 4 ResStages for one pathway. `width` scales channels."""
    width: int                      # 64 slow / 64//beta_inv fast
    stem_tk: int
    stage_tk: Sequence[Sequence[int]]   # per-stage per-block kernel basis
    nbtk: Sequence[int]                 # blocks with temporal kernel
    depths: Sequence[int]
    temporal_pool1: int = 1
    nl_blocks: Sequence[Sequence[int]] = ((), (), (), ())
    nl_instantiation: str = "dot_product"
    # extra input channels per stage from lateral fusion (slow pathway only)
    fuse_in: Sequence[int] = (0, 0, 0, 0)
    bn_splits: int = 1
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        w = self.width
        self.stem = ConvBN(w, (self.stem_tk, 7, 7), (1, 2, 2),
                           (self.stem_tk // 2, 3, 3),
                           bn_splits=self.bn_splits, **kw)
        blocks = []
        nl_mods = {}
        in_ch = w + self.fuse_in[0]
        for s, depth in enumerate(self.depths):
            inner = w * (2 ** s)
            out_ch = inner * 4
            basis = self.stage_tk[s]
            for i in range(depth):
                stride = 2 if (s > 0 and i == 0) else 1
                tk = basis[i % len(basis)] if i < self.nbtk[s] else 1
                blocks.append(Bottleneck(
                    planes=inner, out_planes=out_ch,
                    temp_kernel=tk, stride=stride,
                    needs_proj=(stride != 1 or in_ch != out_ch),
                    bn_splits=self.bn_splits,
                    name=f"s{s + 2}_b{i}", **kw))
                in_ch = out_ch
                if i in self.nl_blocks[s]:
                    nl_mods[f"s{s + 2}_b{i}"] = NonLocal(
                        inner=out_ch // 2,
                        instantiation=self.nl_instantiation,
                        bn_splits=self.bn_splits,
                        name=f"nl_s{s + 2}_b{i}", **kw)
            if s + 1 < len(self.depths):
                in_ch = out_ch + self.fuse_in[s + 1]
        self.blocks = blocks
        self.nl_mods = nl_mods

    def stage_io(self, x, train, fuse_feats=None):
        """Run stem + stages. Returns (final, stem_out, per-stage feats)."""
        x = self.stem(x, train)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        stem_out = x
        feats = []
        bi = 0
        for s, depth in enumerate(self.depths):
            if fuse_feats is not None and fuse_feats[s] is not None:
                x = jnp.concatenate([x, fuse_feats[s]], axis=-1)
            for i in range(depth):
                x = self.blocks[bi](x, train)
                bi += 1
                key = f"s{s + 2}_b{i}"
                if key in self.nl_mods:
                    x = self.nl_mods[key](x, train)
            if s == 0 and self.temporal_pool1 > 1:
                # pool1 after res2 (reference video_model_builder.py:604-607;
                # single-pathway only — slowfast's pool1 is (1,1,1))
                x = max_pool3d(x, (self.temporal_pool1, 1, 1),
                               (self.temporal_pool1, 1, 1))
            feats.append(x)
        return x, stem_out, feats


class FuseFastToSlow(nn.Module):
    """(k,1,1) stride-(alpha,1,1) conv on the fast feature
    (reference: video_model_builder.py:77-134)."""
    out_channels: int
    kernel: int
    alpha: int
    bn_splits: int = 1
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.out_channels, (self.kernel, 1, 1),
                      (self.alpha, 1, 1), (self.kernel // 2, 0, 0),
                      bn_splits=self.bn_splits,
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="conv_f2s")(x, train)


class SlowFast(nn.Module):
    """Two-pathway SlowFast (or single-pathway Slow/C2D/I3D) network."""
    spec: SlowFastSpec = SPECS["SLOWFAST_4x16_R50"]
    num_classes: int = 400
    dropout_rate: float = 0.5
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[AxisName] = None

    @property
    def feature_dim(self) -> int:
        base = 64 * (2 ** (len(self.spec.depths) - 1)) * 4   # 2048
        if self.spec.two_pathway:
            return base + base // self.spec.beta_inv
        return base

    def setup(self):
        sp = self.spec
        splits = sp.bn_num_splits if sp.norm_type == "sub_batchnorm" else 1
        kw = dict(dtype=self.dtype, axis_name=self.axis_name,
                  bn_splits=splits)
        fast_w = 64 // sp.beta_inv if sp.two_pathway else 0
        fuse_in = [0, 0, 0, 0]
        if sp.two_pathway:
            fuse_in = [fast_w * sp.fusion_ratio,
                       fast_w * 4 * sp.fusion_ratio,
                       fast_w * 8 * sp.fusion_ratio,
                       fast_w * 16 * sp.fusion_ratio]
            # fusion after stem and after res2..res4 feeds the NEXT stage;
            # fuse_in[s] = channels appended before stage s
        self.slow = Pathway(
            width=64, stem_tk=sp.slow_stem_tk, stage_tk=sp.slow_tk,
            nbtk=sp.nbtk_slow, depths=sp.depths,
            temporal_pool1=sp.temporal_pool1,
            nl_blocks=sp.nl_blocks, nl_instantiation=sp.nl_instantiation,
            fuse_in=tuple(fuse_in), name="slow", **kw)
        if sp.two_pathway:
            self.fast = Pathway(
                width=fast_w, stem_tk=sp.fast_stem_tk, stage_tk=sp.fast_tk,
                nbtk=sp.nbtk_fast, depths=sp.depths, name="fast", **kw)
            self.fuses = [
                FuseFastToSlow(fuse_in[0], sp.fusion_kernel, sp.alpha,
                               name="fuse_stem", **kw),
                FuseFastToSlow(fuse_in[1], sp.fusion_kernel, sp.alpha,
                               name="fuse_s2", **kw),
                FuseFastToSlow(fuse_in[2], sp.fusion_kernel, sp.alpha,
                               name="fuse_s3", **kw),
                FuseFastToSlow(fuse_in[3], sp.fusion_kernel, sp.alpha,
                               name="fuse_s4", **kw),
            ]
        if self.with_classifier:
            self.dropout = nn.Dropout(self.dropout_rate)
            self.fc = nn.Dense(self.num_classes, dtype=self.dtype,
                               name="head_fc")

    def _pathways(self, x, train: bool):
        """-> (slow_out, fast_out or None)."""
        sp = self.spec
        if not sp.two_pathway:
            out, _, _ = self.slow.stage_io(x, train)
            return out, None
        # reference subsamples the slow pathway with linspace indices
        # (video_model_builder.py:383-396: torch.linspace(0, T-1,
        # T//alpha).long()), NOT a plain ::alpha stride — for T=32,
        # alpha=8 that is frames [0, 10, 20, 31] vs [0, 8, 16, 24]
        t = x.shape[1]
        idx = np.linspace(0, t - 1, t // sp.alpha).astype(np.int64)
        slow_in = x[:, idx]
        fast_out, fast_stem, fast_feats = self.fast.stage_io(x, train)
        fuse = [self.fuses[0](fast_stem, train),
                self.fuses[1](fast_feats[0], train),
                self.fuses[2](fast_feats[1], train),
                self.fuses[3](fast_feats[2], train)]
        slow_out, _, _ = self.slow.stage_io(slow_in, train, fuse_feats=fuse)
        return slow_out, fast_out

    def features(self, x, train: bool = False):
        """x: [B, T, H, W, 3] (fast frame rate). Returns one fused map
        whose global-average-pool equals the reference head's input: the
        slow map concat the fast map channel-wise, with the fast map's T
        axis averaged down to the slow grid (T_fast = alpha*T_slow, so
        reshape-mean is exact and GAP(concat) == concat of the per-
        pathway pools the reference head computes). Matches feature_dim
        (2048 + 256 for two-pathway specs)."""
        slow_out, fast_out = self._pathways(x, train)
        if fast_out is None:
            return slow_out
        b, tf, h, w, c = fast_out.shape
        ts = slow_out.shape[1]
        fast_s = fast_out.reshape(b, ts, tf // ts, h, w, c).mean(axis=2)
        return jnp.concatenate([slow_out, fast_s], axis=-1)

    def __call__(self, x, train: bool = False):
        slow_out, fast_out = self._pathways(x, train)
        pooled = global_avg_pool(slow_out)
        if fast_out is not None:
            pooled = jnp.concatenate(
                [pooled, global_avg_pool(fast_out)], axis=-1)
        if self.with_classifier:
            pooled = self.dropout(pooled, deterministic=not train)
            pooled = self.fc(pooled)
        return pooled


def get_model_class(arch: str, **model_cfg):
    """Registry hook: SLOWFAST*/SLOW_*/C2D*/I3D* arch names (the reference
    keys models by YAML name, models/slowfast/__init__.py:61-76), or
    arch='slowfast' with a 'variant' name or 'cfg_file' YAML path."""
    spec = None
    if arch == "slowfast":
        cfg_file = model_cfg.get("cfg_file")
        if isinstance(cfg_file, str):
            spec = spec_from_yaml(cfg_file)
        else:
            name = model_cfg.get("variant", "SLOWFAST_4x16_R50")
    else:
        name = arch
    if spec is None:
        if name not in SPECS:
            raise ValueError(f"Unknown SlowFast variant {name!r}; "
                             f"available: {sorted(SPECS)}")
        spec = SPECS[name]

    def ctor(num_classes=400, **kw):
        return SlowFast(spec=spec, num_classes=num_classes, **kw)

    return ctor
