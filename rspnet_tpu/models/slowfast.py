"""SlowFast networks in flax, NDHWC (TPU-native redesign of the vendored
pyslowfast subset, reference: models/slowfast/video_model_builder.py,
resnet_helper.py, nonlocal_helper.py, head_helper.py).

Covered variants (the ones the reference configs expose,
config/model/slowfast.libsonnet + models/slowfast/__init__.py:61-76):
- SLOWFAST_4x16_R50, SLOWFAST_8x8_R50 (two pathways, fast->slow fusion)
- SLOWFAST_NLN_4x16_R50 (adds non-local blocks on res4)
- SLOW_4x16_R50 / SLOW_8x8_R50, C2D_8x8_R50, I3D_8x8_R50 (single pathway)

Design notes:
- One input clip [B, T, H, W, 3]; the slow pathway subsamples T by alpha
  inside the model (reference does index_select, video_model_builder.py:
  383-396) — a static strided slice here.
- Bottlenecks carry their temporal kernel on conv1 ((k,1,1) + (1,3,3) +
  (1,1,1)), matching pyslowfast's temp_kernel tables.
- FuseFastToSlow: (fusion_kernel,1,1) conv with temporal stride alpha, out
  = 2 * fast channels, concatenated into the slow pathway.
- Non-local: embedded-gaussian dot-product attention over THW with spatial
  max-pool on phi/g — pure matmuls, MXU-friendly.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .common import ConvBN, global_avg_pool, max_pool3d


@dataclass(frozen=True)
class SlowFastSpec:
    name: str
    two_pathway: bool
    alpha: int = 8                    # fast/slow frame-rate ratio
    beta_inv: int = 8                 # slow/fast channel ratio
    fusion_kernel: int = 5
    fusion_ratio: int = 2
    depths: Tuple[int, ...] = (3, 4, 6, 3)          # R50
    # temporal kernel of conv1 per stage, slow (or single) pathway:
    slow_tk: Tuple[int, ...] = (1, 1, 3, 3)
    slow_stem_tk: int = 1
    fast_tk: Tuple[int, ...] = (3, 3, 3, 3)
    fast_stem_tk: int = 5
    nonlocal_stages: Tuple[int, ...] = ()           # stage indices with NL


SPECS = {
    "SLOWFAST_4x16_R50": SlowFastSpec("SLOWFAST_4x16_R50", True, alpha=8,
                                      fusion_kernel=5),
    "SLOWFAST_8x8_R50": SlowFastSpec("SLOWFAST_8x8_R50", True, alpha=4,
                                     fusion_kernel=7),
    "SLOWFAST_NLN_4x16_R50": SlowFastSpec("SLOWFAST_NLN_4x16_R50", True,
                                          alpha=8, fusion_kernel=5,
                                          nonlocal_stages=(2,)),
    "SLOW_4x16_R50": SlowFastSpec("SLOW_4x16_R50", False),
    "SLOW_8x8_R50": SlowFastSpec("SLOW_8x8_R50", False),
    "C2D_8x8_R50": SlowFastSpec("C2D_8x8_R50", False,
                                slow_tk=(1, 1, 1, 1), slow_stem_tk=1),
    "I3D_8x8_R50": SlowFastSpec("I3D_8x8_R50", False,
                                slow_tk=(3, 3, 3, 3), slow_stem_tk=5),
}


class NonLocal(nn.Module):
    """Embedded-gaussian non-local block (reference: nonlocal_helper.py:10-147)."""
    inner: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
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
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (self.inner ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(
            B, T, H, W, self.inner)
        # output conv + zero-init BN scale so the block starts as identity
        out = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="out")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
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
    dtype: Any = None
    axis_name: Optional[str] = None

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        tk = self.temp_kernel
        self.conv1 = ConvBN(self.planes, (tk, 1, 1), 1,
                            (tk // 2, 0, 0), **kw)
        self.conv2 = ConvBN(self.planes, (1, 3, 3),
                            (1, self.stride, self.stride), (0, 1, 1), **kw)
        self.conv3 = ConvBN(self.out_planes, (1, 1, 1), 1, 0,
                            activation=False, **kw)
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
    stage_tk: Sequence[int]
    depths: Sequence[int]
    nonlocal_stages: Sequence[int] = ()
    # extra input channels per stage from lateral fusion (slow pathway only)
    fuse_in: Sequence[int] = (0, 0, 0, 0)
    dtype: Any = None
    axis_name: Optional[str] = None

    def setup(self):
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
        w = self.width
        self.stem = ConvBN(w, (self.stem_tk, 7, 7), (1, 2, 2),
                           (self.stem_tk // 2, 3, 3), **kw)
        blocks = []
        nl_blocks = {}
        in_ch = w + self.fuse_in[0]
        for s, depth in enumerate(self.depths):
            inner = w * (2 ** s)
            out_ch = inner * 4
            for i in range(depth):
                stride = 2 if (s > 0 and i == 0) else 1
                blocks.append(Bottleneck(
                    planes=inner, out_planes=out_ch,
                    temp_kernel=self.stage_tk[s], stride=stride,
                    needs_proj=(stride != 1 or in_ch != out_ch),
                    name=f"s{s + 2}_b{i}", **kw))
                in_ch = out_ch
            if s in self.nonlocal_stages:
                nl_blocks[f"s{s + 2}"] = NonLocal(
                    inner=out_ch // 2, name=f"nl_s{s + 2}", **kw)
            if s + 1 < len(self.depths):
                in_ch = out_ch + self.fuse_in[s + 1]
        self.blocks = blocks
        self.nl_blocks = nl_blocks

    def stage_io(self, x, train, fuse_feats=None):
        """Run stem+stages; yields features after each stage for fusion."""
        feats = []
        x = self.stem(x, train)
        bi = 0
        for s, depth in enumerate(self.depths):
            if fuse_feats is not None and fuse_feats[s] is not None:
                x = jnp.concatenate([x, fuse_feats[s]], axis=-1)
            for _ in range(depth):
                x = self.blocks[bi](x, train)
                bi += 1
            key = f"s{s + 2}"
            if key in self.nl_blocks:
                x = self.nl_blocks[key](x, train)
            feats.append(x)
        return x, feats


class FuseFastToSlow(nn.Module):
    """(k,1,1) stride-(alpha,1,1) conv on the fast feature
    (reference: video_model_builder.py:77-134)."""
    out_channels: int
    kernel: int
    alpha: int
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.out_channels, (self.kernel, 1, 1),
                      (self.alpha, 1, 1), (self.kernel // 2, 0, 0),
                      dtype=self.dtype, axis_name=self.axis_name,
                      name="conv_f2s")(x, train)


class SlowFast(nn.Module):
    """Two-pathway SlowFast (or single-pathway Slow/C2D/I3D) network."""
    spec: SlowFastSpec = SPECS["SLOWFAST_4x16_R50"]
    num_classes: int = 400
    dropout_rate: float = 0.5
    with_classifier: bool = True
    dtype: Any = None
    axis_name: Optional[str] = None

    @property
    def feature_dim(self) -> int:
        base = 64 * (2 ** (len(self.spec.depths) - 1)) * 4   # 2048 for R50
        if self.spec.two_pathway:
            return base + base // self.spec.beta_inv
        return base

    def setup(self):
        sp = self.spec
        kw = dict(dtype=self.dtype, axis_name=self.axis_name)
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
            depths=sp.depths, nonlocal_stages=sp.nonlocal_stages,
            fuse_in=tuple(fuse_in), name="slow", **kw)
        if sp.two_pathway:
            self.fast = Pathway(
                width=fast_w, stem_tk=sp.fast_stem_tk, stage_tk=sp.fast_tk,
                depths=sp.depths, name="fast", **kw)
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
            out, _ = self.slow.stage_io(x, train)
            return out, None
        slow_in = x[:, ::sp.alpha]
        fast_stem = self.fast.stem(x, train)
        fast_feats = []
        bi = 0
        h = fast_stem
        for depth in sp.depths:
            for _ in range(depth):
                h = self.fast.blocks[bi](h, train)
                bi += 1
            fast_feats.append(h)
        fuse = [self.fuses[0](fast_stem, train),
                self.fuses[1](fast_feats[0], train),
                self.fuses[2](fast_feats[1], train),
                self.fuses[3](fast_feats[2], train)]
        slow_out, _ = self.slow.stage_io(slow_in, train, fuse_feats=fuse)
        return slow_out, fast_feats[-1]

    def features(self, x, train: bool = False):
        """x: [B, T, H, W, 3] (fast frame rate). Returns the slow-pathway
        final map (fast features already fused in)."""
        slow_out, _ = self._pathways(x, train)
        return slow_out

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
    """Registry hook: SLOWFAST* arch names or 'slowfast' + cfg key
    (reference: models/slowfast/__init__.py:61-76 keys by yaml name)."""
    name = arch
    if arch == "slowfast":
        # config gives cfg_file mapping; default to 4x16 R50
        name = model_cfg.get("variant", "SLOWFAST_4x16_R50")
    if name not in SPECS:
        raise ValueError(f"Unknown SlowFast variant {name!r}; "
                         f"available: {sorted(SPECS)}")

    def ctor(num_classes=400, **kw):
        return SlowFast(spec=SPECS[name], num_classes=num_classes, **kw)

    return ctor
