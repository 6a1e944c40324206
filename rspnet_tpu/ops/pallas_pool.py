"""Pallas TPU kernels: separable max pool forward + backward.

STATUS: measured dead end — kept opt-in (RSPNET_POOL=pallas), correct
and tested, NOT the default. Model-level A/B on the real chip
(utils/bench_model_bwd.py, b128 S3D-G): fwd 20.1→42.1 ms, grad
66.1→118.5 ms vs the rw-sep XLA pools — each pallas_call is a fusion
boundary that forces its input/output through HBM, costing more than
the in-kernel wins; full-model cold compile also exceeded 10 min.
Micro-level the kernels DO win where XLA reduce_window is pathological
(the (4,7,7,512) site: grad 2.6 vs 11.9 ms), so the code is kept as a
working Pallas reference for VMEM-resident window ops.

Original motivation (profile-driven, see CLAUDE.md 2026-08-17): max
pooling was ~41 ms of the 120 ms b128 S3D-G MoCo step. The XLA fix —
one reduce_window per axis (models/common.py:_max_pool3d_separable_rw)
— cut the step to 106 ms, but ~25 ms of pool cost remains:
reduce_window forwards run at ~2 TF/s and each VJP still lowers to a
(3-element) select-and-scatter. Speed-of-light for every pool in the
model is pure HBM traffic (read x [+g], write out [+grad]) ≈ 3-5
ms/step total; these kernels get there by keeping ALL window math in
VMEM:

- forward: one program per (batch, [T-slice]) block; per axis, the
  padded stage is materialized into a VMEM scratch ref and each window
  offset is a STRIDED REF SLICE (tpu.strided_load) — Mosaic-clean, no
  reshapes — folded with jnp.maximum.
- backward: recomputes the per-axis stage outputs in VMEM from x (no
  extra residuals in HBM) and routes the cotangent with FIRST-MATCH tie
  semantics (the d-th window offset gets the gradient only if no earlier
  offset matched) — matching torch/XLA's route-to-one-winner behavior,
  unlike jnp.maximum's 0.5/0.5 tie split, and conserving the gradient
  sum. The scatter adjoint is a strided read-modify-write into a zeroed
  VMEM scratch (tpu.strided_store).

Mosaic limits hit on the way (and designed around): no bf16 vector
compares (equality runs on exact f32 upcasts), no unit-dim-inserting
reshapes / value-level strided slices (everything routes through ref
indexing instead).

Supported geometry (everything the model zoo uses): per-axis kernel
k∈{1,2,3}, stride 1 ≤ s ≤ k (so every input position is covered),
padding p∈{0,1}, p < k, NDHWC layout, pooling over T/H/W only. The
public entry (models/common.py:max_pool3d with RSPNET_POOL=pallas)
falls back to the XLA separable form for unsupported cases.

Reference behavior replaced: torch MaxPool3d (floor mode) as used by
/root/reference/models/s3dg.py:105-126 (branch3 3x3x3 stride-1 pools in
every inception block) and the stage pools.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

Triple = Tuple[int, int, int]


def _out_len(d: int, k: int, s: int, p: int) -> int:
    return (d + 2 * p - k) // s + 1


def _padded_len(d: int, k: int, s: int, p: int) -> int:
    """Length of the padded-stage scratch for one axis: must hold every
    window ((n-1)s + k) and the whole input at offset p (p + d) so the
    bwd unpad slice [p, p+d) is in-bounds."""
    n = _out_len(d, k, s, p)
    return max((n - 1) * s + k, p + d)


def _axis_plans(shape4, k, s, p):
    """Per-axis (axis, k, s, p, d, n, lp) for the non-trivial pooled
    axes of a [T,H,W,C] stage, plus the running stage shapes."""
    plans = []
    stage = list(shape4)
    for ax in range(3):
        ka, sa, pa = k[ax], s[ax], p[ax]
        if ka == 1 and sa == 1 and pa == 0:
            continue
        d = stage[ax]
        plans.append((ax, ka, sa, pa, d, _out_len(d, ka, sa, pa),
                      _padded_len(d, ka, sa, pa)))
        stage[ax] = _out_len(d, ka, sa, pa)
    return plans


def _slice_idx(ndim: int, axis: int, off: int, n: int, s: int):
    idx = [slice(None)] * ndim
    idx[axis] = pl.Slice(off, n, s)
    return tuple(idx)


def _plain_idx(ndim: int, axis: int, lo: int, size: int):
    idx = [slice(None)] * ndim
    idx[axis] = pl.Slice(lo, size)
    return tuple(idx)


def _pool_axis_fwd(v, xpad_ref, axis: int, k: int, s: int, p: int,
                   n: int, d: int):
    """Max pool one axis of a VMEM value via a padded scratch ref:
    torch floor mode, -inf padding. The scratch may be f32 for a bf16
    stage (Mosaic's strided load/store is 32-bit only); the upcast is
    exact and the result is cast back, so values are unchanged."""
    xpad_ref[...] = jnp.full(xpad_ref.shape, -jnp.inf, xpad_ref.dtype)
    xpad_ref[_plain_idx(v.ndim, axis, p, d)] = v.astype(xpad_ref.dtype)
    acc = None
    for off in range(k):
        piece = xpad_ref[_slice_idx(v.ndim, axis, off, n, s)]
        acc = piece if acc is None else jnp.maximum(acc, piece)
    return acc.astype(v.dtype)


def _pool_axis_bwd(xpad_ref, gpad_ref, vout, g, axis: int, k: int,
                   s: int, p: int, n: int, d: int):
    """Gradient wrt the stage input, first-match tie routing.

    xpad_ref still holds the padded stage input from the fwd recompute.
    -inf pad cells never equal the (finite) window max, so they never
    match, and their gradient slots are dropped by the final unpad.
    """
    ndim = g.ndim
    gpad_ref[...] = jnp.zeros(gpad_ref.shape, gpad_ref.dtype)
    matched = jnp.zeros(vout.shape, jnp.bool_)
    # Mosaic has no bf16 vector compare; f32 upcast is exact for bf16
    # values so the equality (and hence tie routing) is unchanged.
    vout_f = vout.astype(jnp.float32)
    for off in range(k):
        sl = _slice_idx(ndim, axis, off, n, s)
        eq = xpad_ref[sl].astype(jnp.float32) == vout_f
        take = jnp.logical_and(eq, jnp.logical_not(matched))
        matched = jnp.logical_or(matched, eq)
        val = jnp.where(take, g, jnp.zeros_like(g))
        gpad_ref[sl] = gpad_ref[sl] + val.astype(gpad_ref.dtype)
    return gpad_ref[_plain_idx(ndim, axis, p, d)].astype(g.dtype)


# ---------------------------------------------------------------------------
# kernels: block = [1, Tb, H, W, C]; grid = (B, T_splits)
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, o_ref, *xpads, plans):
    v = x_ref[0]                     # [Tb, H, W, C]
    for (ax, k, s, p, d, n, _lp), xpad in zip(plans, xpads):
        v = _pool_axis_fwd(v, xpad, ax, k, s, p, n, d)
    o_ref[0] = v


def _bwd_kernel(x_ref, g_ref, o_ref, *scratch, plans):
    m = len(plans)
    xpads, gpads = scratch[:m], scratch[m:]
    v = x_ref[0]
    stages = [v]
    for (ax, k, s, p, d, n, _lp), xpad in zip(plans, xpads):
        v = _pool_axis_fwd(v, xpad, ax, k, s, p, n, d)
        stages.append(v)
    grad = g_ref[0]
    for i in range(m - 1, -1, -1):
        ax, k, s, p, d, n, _lp = plans[i]
        grad = _pool_axis_bwd(xpads[i], gpads[i], stages[i + 1], grad,
                              ax, k, s, p, n, d)
    o_ref[0] = grad


# v5e has 128MiB VMEM/core; leave room for Mosaic temporaries beyond the
# planner's estimate (strided staging, double-buffered block DMA).
_VMEM_LIMIT = 100 * 1024 * 1024
_VMEM_BYTES = 48 * 1024 * 1024


def _tile_bytes(shape4, dtype) -> int:
    """Bytes of one [T,H,W,C] VMEM buffer incl. tiling pad: the lane dim
    C rounds up to a multiple of 128 and the sublane dim W to the
    dtype's sublane tile (8 for 4-byte types, 16 for bf16, 32 for
    1-byte: packed tiles are (32 // itemsize // 4 * 8, 128))."""
    t, h, w, c = shape4
    esize = jnp.dtype(dtype).itemsize
    sublane = 8 * max(1, 4 // esize)
    return (t * h * (-(-w // sublane) * sublane)
            * (-(-c // 128) * 128) * esize)


def _stage_shapes(shape4, plans):
    """[T,H,W,C] shape of each stage input, per plan entry."""
    stage = list(shape4)
    shapes = []
    for ax, k, s, p, d, n, _lp in plans:
        shapes.append(tuple(stage))
        stage[ax] = n
    return shapes, tuple(stage)


def _scratch_dtype(s: int, dtype):
    """Mosaic strided load/store is 32-bit only; strided (s>1) axes
    stage through f32 (exact for bf16), stride-1 axes stay native."""
    if s > 1 and jnp.dtype(dtype).itemsize != 4:
        return jnp.float32
    return dtype


def _scratch_bytes(shape4, plans, dtype, with_grad: bool) -> int:
    total = 0
    stages, _ = _stage_shapes(shape4, plans)
    for (ax, k, s, p, d, n, lp), st in zip(plans, stages):
        padded = list(st)
        padded[ax] = lp
        total += (_tile_bytes(padded, _scratch_dtype(s, dtype))
                  * (2 if with_grad else 1))
    return total


def _plan_tblock(shape, k, s, p, dtype, with_grad: bool):
    """Choose a T-split (only legal when the pool doesn't touch T) so
    the io blocks (double-buffered) + scratch fit the VMEM budget."""
    b, t, h, w, c = shape

    def bytes_for(tb):
        blk = (tb, h, w, c)
        plans = _axis_plans(blk, k, s, p)
        _, out4 = _stage_shapes(blk, plans)
        io = 2 * (_tile_bytes(blk, dtype) + _tile_bytes(out4, dtype))
        if with_grad:
            io += 2 * _tile_bytes(out4, dtype) + 2 * _tile_bytes(blk, dtype)
        return io + _scratch_bytes(blk, plans, dtype, with_grad)

    t_block = t
    if k[0] == 1 and s[0] == 1 and p[0] == 0:
        while t_block > 1 and bytes_for(t_block) > _VMEM_BYTES:
            t_block -= 1
        while t % t_block:
            t_block -= 1
    if bytes_for(t_block) > _VMEM_BYTES:
        return None
    return t_block


def pallas_pool_supported(shape, k: Triple, s: Triple, p: Triple,
                          dtype) -> bool:
    if not _PALLAS_OK:
        return False
    if any(kk not in (1, 2, 3) for kk in k):
        return False
    # stride-1 only: Mosaic strided ref ops are 32-bit with a lane dim
    # of exactly 128 — useless for bf16 stages at c∈{192,480,832}. The
    # strided stage pools stay on the rw-sep XLA path; the Pallas win
    # is the 13 stride-1 3x3x3 inception-branch pools.
    if any(ss != 1 for ss in s):
        return False
    if any(pp not in (0, 1) or pp >= kk for pp, kk in zip(p, k)):
        return False
    if any(_out_len(d, kk, ss, pp) < 1
           for d, kk, ss, pp in zip(shape[1:4], k, s, p)):
        return False
    return _plan_tblock(shape, k, s, p, dtype, with_grad=True) is not None


def _compiler_kwargs(interpret):
    if interpret:
        return {}
    return {"compiler_params":
            pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)}


def _scratch_specs(blk4, plans, dtype, grad_dtype=None):
    stages, _ = _stage_shapes(blk4, plans)
    padded_shapes = []
    strides = []
    for (ax, k, s, p, d, n, lp), st in zip(plans, stages):
        padded = list(st)
        padded[ax] = lp
        padded_shapes.append(tuple(padded))
        strides.append(s)
    specs = [pltpu.VMEM(sh, _scratch_dtype(s, dtype))
             for sh, s in zip(padded_shapes, strides)]
    if grad_dtype is not None:
        specs += [pltpu.VMEM(sh, _scratch_dtype(s, grad_dtype))
                  for sh, s in zip(padded_shapes, strides)]
    return specs


def _run_fwd(x, k, s, p, interpret):
    b, t, h, w, c = x.shape
    t_block = _plan_tblock(x.shape, k, s, p, x.dtype, with_grad=False)
    grid_t = t // t_block
    blk4 = (t_block, h, w, c)
    plans = _axis_plans(blk4, k, s, p)
    _, out4 = _stage_shapes(blk4, plans)
    oshape = (b, _out_len(t, k[0], s[0], p[0]),
              _out_len(h, k[1], s[1], p[1]), _out_len(w, k[2], s[2], p[2]),
              c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, plans=plans),
        grid=(b, grid_t),
        in_specs=[pl.BlockSpec((1, t_block, h, w, c),
                               lambda i, j: (i, j, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, *out4),
                               lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(oshape, x.dtype),
        scratch_shapes=_scratch_specs(blk4, plans, x.dtype),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(x)


def _run_bwd(x, g, k, s, p, interpret):
    b, t, h, w, c = x.shape
    t_block = _plan_tblock(x.shape, k, s, p, x.dtype, with_grad=True)
    grid_t = t // t_block
    blk4 = (t_block, h, w, c)
    plans = _axis_plans(blk4, k, s, p)
    _, out4 = _stage_shapes(blk4, plans)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, plans=plans),
        grid=(b, grid_t),
        in_specs=[
            pl.BlockSpec((1, t_block, h, w, c),
                         lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, *out4),
                         lambda i, j: (i, j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_block, h, w, c),
                               lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, g.dtype),
        scratch_shapes=_scratch_specs(blk4, plans, x.dtype, g.dtype),
        interpret=interpret,
        **_compiler_kwargs(interpret),
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def max_pool3d_pallas(x, k: Triple, s: Triple, p: Triple,
                      interpret: bool = False):
    """NDHWC max pool (torch floor semantics) as a Pallas kernel pair."""
    return _run_fwd(x, k, s, p, interpret)


def _vjp_fwd(x, k, s, p, interpret):
    return _run_fwd(x, k, s, p, interpret), x


def _vjp_bwd(k, s, p, interpret, x, g):
    return (_run_bwd(x, g, k, s, p, interpret),)


max_pool3d_pallas.defvjp(_vjp_fwd, _vjp_bwd)
