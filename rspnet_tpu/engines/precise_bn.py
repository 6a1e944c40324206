"""Precise-BN recalibration (reference: models/slowfast/config/defaults.py:26-30
``BN.USE_PRECISE_STATS`` / ``BN.NUM_BATCHES_PRECISE`` — fvcore-style
``update_bn_stats``: replace EMA running statistics with the average of the
TRUE per-batch statistics over N calibration batches).

Why it exists here: S3D-G pins BatchNorm momentum to the reference's 0.001
(models/s3dg.py, reference s3dg.py:23), so running stats move ~0.1% per step.
A short pretrain (e.g. the synthetic transfer probe's ~240 steps) leaves them
near their init (mean 0 / var 1) while the *weights* train away — the
eval-mode forward (linear probes pin BN to eval, reference
models/__init__.py:83-106) then mis-normalizes at every one of the ~25 BN
layers and the mismatch compounds multiplicatively into ~1e5-scale GAP
features, which diverge any linear probe (measured round 4: val loss ~1e10 at
lr 1e-2 and 1e-3). Recalibration makes eval-mode statistics agree with what
the trained weights actually produce.

Mechanics: flax's mutable pass returns only the EMA-updated value
``s = m*old + (1-m)*b`` and the per-layer momentum ``m`` is not generically
introspectable from a params tree. Both norm layers here (models/common.py
BatchNorm and SubBatchNorm) use that exact affine form, so recover both
unknowns exactly with two passes over the SAME batch: from stats-init ZERO,
``s0 = (1-m)*b``; from stats-init ONE, ``s1 = m + (1-m)*b``. Then per leaf
``m = s1 - s0`` and ``b = s0/(1-m)``. Train-mode normalization uses the
batch statistics, not the running ones, so the stats init cannot perturb
activations — the recovery is exact up to f32 rounding (for s3dg's m=0.999,
1-m is recovered to ~1e-4 relative). Remaining batches need one pass each.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

import jax
import jax.numpy as jnp

tree_map = jax.tree_util.tree_map


def make_stats_fn(model, mesh, axis_name: str = "data") -> Callable:
    """jit(shard_map) one train-mode forward returning the mutated
    batch_stats tree. Cross-replica BN psums its moments inside shard_map,
    so the returned stats are GLOBAL-batch statistics (replicated)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def stats(params, batch_stats, clips, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        _, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        return mut["batch_stats"]

    sharded = shard_map(
        stats, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def recalibrate_batch_stats(model, mesh, params, batch_stats,
                            batches: Iterable[Any], rng,
                            axis_name: str = "data"):
    """Return a new batch_stats tree holding the mean over ``batches`` of
    each layer's true per-batch statistics (mean of means, mean of unbiased
    vars — fvcore semantics). ``batches`` yields augmented device-ready
    clips; the first batch is consumed twice (momentum recovery)."""
    stats_fn = make_stats_fn(model, mesh, axis_name)
    zeros = tree_map(jnp.zeros_like, batch_stats)
    ones = tree_map(jnp.ones_like, batch_stats)

    it: Iterator[Any] = iter(batches)
    try:
        first = next(it)
    except StopIteration:
        raise ValueError("precise-BN: no calibration batches")
    rng, sub = jax.random.split(rng)
    s0 = stats_fn(params, zeros, first, sub)
    s1 = stats_fn(params, ones, first, sub)
    # per-leaf momentum; clip keeps 1-m strictly positive under f32 noise
    m = tree_map(lambda a, b: jnp.clip(b - a, 0.0, 1.0 - 1e-6), s0, s1)
    inv = tree_map(lambda mm: 1.0 / (1.0 - mm), m)

    acc = tree_map(jnp.multiply, s0, inv)
    n = 1
    for clips in it:
        rng, sub = jax.random.split(rng)
        si = stats_fn(params, zeros, clips, sub)
        acc = tree_map(lambda a, s, iv: a + s * iv, acc, si, inv)
        n += 1
    return tree_map(lambda a: a / n, acc)
