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

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any
# Mesh axis (or axes) BN moments psum over: a single axis name for the 1-D
# data mesh, or a tuple like ("data", "model") when the batch is sharded
# over a 2-D mesh (moco/sharded_queue.py) — lax.pmean/psum accept both.
AxisName = Union[str, Tuple[str, ...]]


def _triple(x) -> Tuple[int, int, int]:
    if isinstance(x, int):
        return (x, x, x)
    return tuple(x)


def _pad3(p) -> Sequence[Tuple[int, int]]:
    p = _triple(p)
    return [(p[0], p[0]), (p[1], p[1]), (p[2], p[2])]


class BatchNorm(nn.Module):
    """torch-parity BatchNorm3d over NDHWC (features = last axis).

    Differences from ``flax.linen.BatchNorm`` (which this replaces at every
    site, same param/batch_stats layout so checkpoints are unaffected):
    - running_var updates with the UNBIASED batch variance (Bessel
      n/(n-1)) like torch BatchNorm; flax stores the biased one. At small
      per-channel counts the gap is material (n=32 -> 3.2% per update) and
      it systematically shrinks eval-time variances.
    - normalization itself uses the biased variance (torch does too).

    ``axis_name`` psums the moments across the mesh (cross-replica BN,
    the shuffle-BN replacement, SURVEY.md §5.8); n then counts the global
    elements so the Bessel factor stays exact. Accepts one axis name (1-D
    data mesh) or a tuple of axes (2-D data x model mesh, where the batch
    is sharded over both).

    Verified against torch in float64 by tests/test_step_parity.py.
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    axis_name: Optional[AxisName] = None
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        import jax

        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", self.bias_init, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        # stats in (at least) f32 even under bf16 compute
        stats_dtype = jnp.promote_types(jnp.float32, x.dtype)
        xf = x.astype(stats_dtype)
        if ura:
            mean = ra_mean.value.astype(stats_dtype)
            var = ra_var.value.astype(stats_dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            n = x.size // c
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # n may be traced under a mesh axis; stay array-safe
                unbias = (jnp.asarray(n, stats_dtype)
                          / jnp.maximum(jnp.asarray(n, stats_dtype) - 1, 1))
                m = self.momentum
                ra_dtype = ra_mean.value.dtype
                ra_mean.value = (m * ra_mean.value
                                 + (1 - m) * mean).astype(ra_dtype)
                ra_var.value = (m * ra_var.value
                                + (1 - m) * var * unbias).astype(ra_dtype)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(stats_dtype) + bias.astype(stats_dtype)
        return y.astype(self.dtype or x.dtype)


class SubBatchNorm(nn.Module):
    """Split-batch normalization (reference: models/slowfast/
    batchnorm_helper.py:36-108, SubBatchNorm3d).

    Training statistics are computed over each of ``num_splits`` interleaved
    subsets of the local batch (sample i belongs to split ``i % num_splits``,
    matching the reference's channel-folding view); one affine pair is
    shared. Running stats are kept per split; evaluation uses the aggregate
    (mean of means, mean of vars plus the between-split variance) — the
    reference computes this in an explicit ``aggregate_stats()`` call before
    eval, here it is applied on the fly so no sync step exists to forget.

    Per-replica by design: the reference's sync path raises
    (batchnorm_helper.py:25-29), so there is deliberately no cross-replica
    psum here — use plain BatchNorm with ``axis_name`` for that.
    """
    num_splits: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax

        k = self.num_splits
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((k, c), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((k, c), jnp.float32))

        xf = x.astype(jnp.float32)
        if train:
            n = x.shape[0]
            if n % k:
                raise ValueError(
                    f"SubBatchNorm: batch {n} not divisible by "
                    f"num_splits {k}")
            xs = xf.reshape(n // k, k, *x.shape[1:])
            m = jnp.mean(xs, axis=(0, 2, 3, 4))          # [k, c]
            v = jnp.var(xs, axis=(0, 2, 3, 4))
            if not self.is_initializing():
                # torch-parity: running_var updates with the UNBIASED
                # variance of each split (the reference's per-split
                # BatchNorm3d does; see BatchNorm docstring)
                n_el = xs.size // (k * c)
                unbias = n_el / max(n_el - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * m)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * v * unbias)
            xs = (xs - m[None, :, None, None, None, :]) * jax.lax.rsqrt(
                v[None, :, None, None, None, :] + self.epsilon)
            xf = xs.reshape(x.shape)
        else:
            m = jnp.mean(ra_mean.value, axis=0)
            v = (jnp.mean(ra_var.value, axis=0)
                 + jnp.mean((ra_mean.value - m) ** 2, axis=0))
            xf = (xf - m) * jax.lax.rsqrt(v + self.epsilon)
        out = xf * scale + bias
        return out.astype(self.dtype or x.dtype)


class ConvBN(nn.Module):
    """Conv3d (+ optional BN, + optional ReLU), torch-parity hyperparams.

    Matches torch Conv3d(padding=p) + BatchNorm3d(momentum=m, eps=e):
    flax momentum = 1 - torch momentum. ``bn_splits > 1`` swaps the norm for
    SubBatchNorm (split-batch stats, per-replica).
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
    bn_splits: int = 1
    dtype: Optional[Dtype] = None
    axis_name: Optional[AxisName] = None
    kernel_init: Any = nn.initializers.variance_scaling(
        2.0, "fan_out", "normal")  # kaiming_normal(fan_out), models/resnet.py:160
    bn_scale_init: Any = nn.initializers.ones  # zeros for residual-final
    # BN (reference RESNET.ZERO_INIT_FINAL_BN: blocks start as identity)

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
        if self.use_bn and self.bn_splits > 1:
            x = SubBatchNorm(
                num_splits=self.bn_splits,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                scale_init=self.bn_scale_init,
                name="bn",
            )(x, train)
        elif self.use_bn:
            x = BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                dtype=self.dtype,
                axis_name=self.axis_name,
                scale_init=self.bn_scale_init,
                name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


def _max_pool_1d(x: jnp.ndarray, axis: int, k: int, s: int,
                 p: int) -> jnp.ndarray:
    """1-D max pool along one axis as a maximum over k shifted strided
    slices (floor mode, -inf padding)."""
    import functools

    import jax

    d = x.shape[axis]
    if k == 1 and s == 1 and p == 0:
        return x
    out_len = (d + 2 * p - k) // s + 1
    need = (out_len - 1) * s + k          # padded length the slices touch
    if p or need > d:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (p, max(0, need - d - p))
        x = jnp.pad(x, pads, constant_values=-jnp.inf)
    slices = [
        jax.lax.slice_in_dim(x, dt, dt + (out_len - 1) * s + 1, stride=s,
                             axis=axis)
        for dt in range(k)
    ]
    return functools.reduce(jnp.maximum, slices)


def _max_pool3d_separable(x: jnp.ndarray, k, s, p) -> jnp.ndarray:
    """Rectangular max windows are separable: one 1-D pool per axis.

    Exists because jax's reduce_window-max VJP lowers to
    select_and_gather_add (a packed double-width reduce-window that
    downcasts f32 on TPU); decomposed into jnp.maximum chains the
    gradient is plain fusable elementwise selects. S3D-G runs a
    stride-1 3x3x3 max pool inside EVERY inception block (reference
    models/s3dg.py branch3), so this is on the hot path both ways.
    """
    for axis in (1, 2, 3):
        x = _max_pool_1d(x, axis, k[axis - 1], s[axis - 1], p[axis - 1])
    return x


def _rw_pool_stages(x: jnp.ndarray, k, s, p):
    """Per-axis separable reduce_window max pool; returns the stage
    chain [x, after-T, after-H, after-W] (trivial axes repeat the
    previous stage). Shared by the rw-sep pool and the fm custom VJP so
    their forwards cannot diverge."""
    stages = [x]
    for axis in (1, 2, 3):
        ka, sa, pa = k[axis - 1], s[axis - 1], p[axis - 1]
        v = stages[-1]
        if not (ka == 1 and sa == 1 and pa == 0):
            win = [1, 1, 1]
            st = [1, 1, 1]
            pd = [(0, 0), (0, 0), (0, 0)]
            win[axis - 1], st[axis - 1], pd[axis - 1] = ka, sa, (pa, pa)
            v = nn.max_pool(v, window_shape=tuple(win), strides=tuple(st),
                            padding=pd)
        stages.append(v)
    return stages


def _max_pool3d_separable_rw(x: jnp.ndarray, k, s, p) -> jnp.ndarray:
    """Separable max pool via one reduce_window per non-trivial axis.

    Max over a rectangular window factors per axis, so a 3x3x3 window
    becomes three windows of 3. Forward cost is similar (reduce_window
    fuses well either way); the win is the VJP: each axis' backward
    select-and-scatter scans a 3-element window instead of 27 (the
    monolithic 3x3x3 select-and-scatter measured 0.2 TF/s and 23% of the
    whole b128 train step; see CLAUDE.md profiling notes).
    """
    return _rw_pool_stages(x, k, s, p)[-1]


def _pool1d_out_len(d: int, k: int, s: int, p: int) -> int:
    return (d + 2 * p - k) // s + 1


def _pool1d_bwd_fm(vin, vout, g, axis: int, k: int, s: int, p: int):
    """Hand-written VJP of a 1-axis max pool: first-match tie routing,
    pure elementwise XLA (slices, compares, interior-padded adds) — no
    select_and_scatter. The -inf pad cells never equal the (finite)
    window max, so their gradient slots are dropped by the final unpad.
    """
    import jax

    if k == 1 and s == 1 and p == 0:
        return g
    d = vin.shape[axis]
    n = _pool1d_out_len(d, k, s, p)
    span = (n - 1) * s + 1
    pad_hi = max(0, (n - 1) * s + k - d - p)
    pads = [(0, 0)] * vin.ndim
    pads[axis] = (p, pad_hi)
    vpad = jnp.pad(vin, pads, constant_values=-jnp.inf)
    lp = d + p + pad_hi
    matched = jnp.zeros(vout.shape, jnp.bool_)
    acc = None
    zero = jnp.zeros((), g.dtype)
    for off in range(k):
        core = jax.lax.slice_in_dim(vpad, off, off + span, stride=s,
                                    axis=axis)
        eq = core == vout
        take = jnp.logical_and(eq, jnp.logical_not(matched))
        matched = jnp.logical_or(matched, eq)
        val = jnp.where(take, g, zero)
        cfg = [(0, 0, 0)] * vin.ndim
        # lax.pad output length = off + n + (n-1)*(s-1) + hi, and
        # n + (n-1)(s-1) == span, so hi = lp - off - span
        cfg[axis] = (off, lp - off - span, s - 1)
        contrib = jax.lax.pad(val, zero, cfg)
        acc = contrib if acc is None else acc + contrib
    return jax.lax.slice_in_dim(acc, p, p + d, axis=axis)


def _max_pool3d_reshape(x: jnp.ndarray, k) -> jnp.ndarray:
    """stride==window, no-pad max pool as reshape + full-axis max.

    No windowed op at all: S3D-G's pool4 is 2x2x2 stride 2
    (models/s3dg.py via _INC_CHANNELS), where reduce_window runs at ~2
    TF/s forward and its VJP select-and-scatters; a full-axis max lowers
    to a plain reduce and its VJP to elementwise compare+select.
    Floor mode drops the non-divisible tail, like torch MaxPool3d.
    """
    B, T, H, W, C = x.shape
    kt, kh, kw = k
    t, h, w = T // kt, H // kh, W // kw
    x = x[:, :t * kt, :h * kh, :w * kw]
    x = x.reshape(B, t, kt, h, kh, w, kw, C)
    return x.max(axis=(2, 4, 6))


def _chain_pool_stages(x: jnp.ndarray, k, s, p):
    """[x, after-T, after-H, after-W] via the slice/maximum chains
    (elementwise, fuses into one loop per axis — unlike the ~2 TF/s
    forward reduce_windows). Values are exact maxes, bit-equal to the
    reduce_window stages."""
    stages = [x]
    for axis in (1, 2, 3):
        stages.append(_max_pool_1d(stages[-1], axis, k[axis - 1],
                                   s[axis - 1], p[axis - 1]))
    return stages


def _rw1d(v, axis, ka, sa, pa):
    win, st = [1, 1, 1], [1, 1, 1]
    pd = [(0, 0), (0, 0), (0, 0)]
    win[axis - 1], st[axis - 1], pd[axis - 1] = ka, sa, (pa, pa)
    return nn.max_pool(v, window_shape=tuple(win), strides=tuple(st),
                       padding=pd)


def _max_pool3d_hybrid_impl(x, k, s, p):
    return _chain_pool_stages(x, k, s, p)[-1]


def _max_pool3d_hybrid_fwd(x, k, s, p):
    stages = _chain_pool_stages(x, k, s, p)
    return stages[-1], tuple(stages[:-1])


def _max_pool3d_hybrid_bwd(k, s, p, stage_ins, g):
    import jax
    for axis in (3, 2, 1):
        ka, sa, pa = k[axis - 1], s[axis - 1], p[axis - 1]
        if ka == 1 and sa == 1 and pa == 0:
            continue
        # jax.vjp of the single-axis reduce_window: its VJP rule is
        # select_and_scatter_add(g, x) — needs only the stage INPUT, so
        # the forward reduce_window inside is dead code XLA eliminates
        _, vjp = jax.vjp(
            lambda v, a=axis, kk=ka, ss=sa, pp=pa: _rw1d(v, a, kk, ss, pp),
            stage_ins[axis - 1])
        (g,) = vjp(g)
    return (g,)


def _make_max_pool3d_hybrid():
    """Maximum-chain FORWARD + rw-sep select_and_scatter BACKWARD.

    The untested pairing from the round-2 measurements: the 'sep'
    variant's forward fuses to bandwidth but its automatic VJP emits
    unfused pads (dead end); rw-sep's backward is the best measured but
    its forward reduce_windows run at ~2 TF/s (~15 ms of the b128 step).
    This custom VJP takes the best half of each. Opt-in RSPNET_POOL=
    hybrid until A/B'd on the real chip.

    Tie routing in bwd = rw-sep's (select_and_scatter first-match);
    forward values are exact maxes either way.
    """
    import jax

    f = jax.custom_vjp(_max_pool3d_hybrid_impl, nondiff_argnums=(1, 2, 3))
    f.defvjp(_max_pool3d_hybrid_fwd, _max_pool3d_hybrid_bwd)
    return f


_max_pool3d_hybrid = None


def _max_pool3d_fm_impl(x, k, s, p):
    return _max_pool3d_separable_rw(x, k, s, p)


def _max_pool3d_fm_fwd(x, k, s, p):
    stages = _rw_pool_stages(x, k, s, p)
    return stages[-1], tuple(stages)


def _max_pool3d_fm_bwd(k, s, p, stages, g):
    for axis in (3, 2, 1):
        g = _pool1d_bwd_fm(stages[axis - 1], stages[axis], g, axis,
                           k[axis - 1], s[axis - 1], p[axis - 1])
    return (g,)


def _make_max_pool3d_fm():
    """Separable reduce_window forward + first-match elementwise backward.

    STATUS: measured dead end — grad 2-4x SLOWER than rw-sep's 3-window
    select_and_scatter at every pool site (stem 24.4 vs 5.4 ms at b128;
    XLA bare pads don't fuse — same pathology as the "sep" variant).
    Kept opt-in (RSPNET_POOL=fm), tested bit-equal on unique values.

    The idea: the rw-sep VJP lowers each axis to select_and_scatter
    (~10 ms of the b128 step at 0.2 TF/s); this custom VJP replaces it
    with shifted compares + interior-padded adds. Tie routing: the
    first matching window offset per axis takes the whole cotangent
    (torch/XLA-style route-to-one-winner, composed per axis), vs
    jnp.maximum's 0.5/0.5 split — gradient sum conserved either way.
    """
    import jax

    f = jax.custom_vjp(_max_pool3d_fm_impl, nondiff_argnums=(1, 2, 3))
    f.defvjp(_max_pool3d_fm_fwd, _max_pool3d_fm_bwd)
    return f


_max_pool3d_fm = None


def max_pool3d(x: jnp.ndarray, kernel, strides, padding=0) -> jnp.ndarray:
    """Torch MaxPool3d semantics (floor mode, -inf padding).

    Default is the separable reduce_window form (see
    _max_pool3d_separable_rw). RSPNET_POOL=xla selects the monolithic
    reduce_window; RSPNET_POOL=sep the slice/maximum decomposition
    (measured SLOWER in bwd: its slice-transpose pads don't fuse).
    """
    import os

    k = _triple(kernel)
    s = _triple(strides)
    choice = os.environ.get("RSPNET_POOL", "rw-sep")
    if (choice in ("rw-sep-reshape", "hybrid") and k == s
            and _triple(padding) == (0, 0, 0)):
        # stride==window, no pad (S3D-G pool4): reshape + full-axis max —
        # no windowed op forward OR backward. Measured a WASH on the real
        # chip (2026-08-18 interleaved A/B, 2 reps: 1204.0 vs 1208.8
        # clips/s/chip for plain rw-sep) so it is opt-in, not default.
        return _max_pool3d_reshape(x, k)
    if choice == "rw-sep-pure":  # legacy alias of the default
        return _max_pool3d_separable_rw(x, k, s, _triple(padding))
    if choice == "hybrid":
        global _max_pool3d_hybrid
        if _max_pool3d_hybrid is None:
            _max_pool3d_hybrid = _make_max_pool3d_hybrid()
        return _max_pool3d_hybrid(x, k, s, _triple(padding))
    if choice == "xla":
        return nn.max_pool(x, window_shape=k, strides=s,
                           padding=_pad3(padding))
    if choice == "sep":
        return _max_pool3d_separable(x, k, s, _triple(padding))
    if choice == "fm":
        global _max_pool3d_fm
        if _max_pool3d_fm is None:
            _max_pool3d_fm = _make_max_pool3d_fm()
        return _max_pool3d_fm(x, k, s, _triple(padding))
    if choice in ("pallas", "pallas-auto"):
        import jax

        from ..ops.pallas_pool import (max_pool3d_pallas,
                                       pallas_pool_supported)
        p = _triple(padding)
        # pallas-auto: only the geometry where the kernel beats the XLA
        # pool at micro level INCLUDING its fusion-boundary cost (the
        # 7x7-spatial inception sites, where reduce_window is
        # pathological: grad 2.6 vs 11.9 ms at b128)
        want = (choice == "pallas"
                or (x.shape[2] == 7 and x.shape[3] == 7))
        if want and pallas_pool_supported(x.shape, k, s, p, x.dtype):
            return max_pool3d_pallas(
                x, k, s, p, jax.default_backend() == "cpu")
    return _max_pool3d_separable_rw(x, k, s, _triple(padding))


def avg_pool3d(x: jnp.ndarray, kernel, strides, padding=0) -> jnp.ndarray:
    """Torch AvgPool3d semantics (count_include_pad=True)."""
    k = _triple(kernel)
    s = _triple(strides)
    return nn.avg_pool(x, window_shape=k, strides=s, padding=_pad3(padding),
                       count_include_pad=True)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d(1) + flatten: [B, T, H, W, C] -> [B, C]."""
    return jnp.mean(x, axis=(1, 2, 3))
