"""2-D ``data x model`` MoCo: negative queue sharded along K.

SURVEY.md §2.8 names the optional second mesh axis: "a clean 1-D data
mesh (optionally 2-D data x model to shard the K=16384 negative queue and
large batches)". This module is that option — the tensor-parallel variant
of the fused train step:

- The mesh is ``(data=D, model=M)``; the batch is sharded over BOTH axes
  (D*M-way — no replicated encoder compute anywhere), and the queue
  ``[dim, K]`` is sharded ``K/M`` per device along the model axis.
- The contrastive logits row for a query spans K+1 columns, so with K
  sharded the softmax is DISTRIBUTED: query embeddings are all-gathered
  within each model group (a [B_loc, dim] activation — tiny), each device
  contracts them against its own queue shard, and cross-entropy reduces
  via a psum-logsumexp over the model axis. Top-1/5 accuracies become
  rank counts (#negatives above the positive, psum'd) — identical to
  ``framework.metrics.accuracy`` on the full row (ties favor the positive
  in both formulations).
- The ring-buffer enqueue lands on exactly one shard per step (guarded by
  ``K/M % global_batch == 0`` at trace time), selected with a predicated
  dynamic_update_slice — no cross-shard traffic.

Gradient combine: each device backpropagates the GROUP loss through its
local rows (the all_gather transposes to a psum-scatter, so the local
query cotangent already sums every shard's contribution), hence
``psum`` over model reassembles the group gradient and ``pmean`` over
data averages groups — one collective pair, same cost shape as 1-D DP.

The step BODY is shared with the 1-D layout (step_core.make_step_body):
only the collectives here differ, so ``fused_key_pass=False`` (reference
BN-parity mode) and exact multi-speed work identically in both layouts.

When to use: K at reference scale (16384 x 128 f32 = 8 MB) does not NEED
sharding — this exists for large-K / large-batch scaling and as the
framework's tensor-parallel capability. Engine wiring: config
``parallel: {data: D, model: M}`` (engines/pretrain.py). Exercised by
``__graft_entry__.dryrun_multichip`` and tests/test_sharded_queue.py,
which pins 2-D == 1-D numerics on the same global batch in float64.

Reference equivalence: the training math is MoCoDiffLossTwoFc
(/root/reference/moco/builder_diffspeed_diffloss.py:286-546) exactly as
in builder.py; only the device layout differs.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .step_core import (MoCoConfig, MoCoState, StepLayout, make_eval_body,
                        make_step_body, speed_branch_config)


def sharded_ce_and_rank(l_pos, l_neg_part, model_axis: str):
    """CE(label=0) and positive rank over model-axis-sharded negatives.

    l_pos: [B_g, 1] (already /t); l_neg_part: [B_g, K/M] this device's
    shard of the negative logits (already /t). Returns (mean CE over the
    group rows, [B_g] int rank = #negatives strictly above the positive).
    Both are identical on every member of the model group (post-psum).
    """
    # group max via all_gather, not lax.pmax: pmax has no differentiation
    # rule, and even a stop_gradient'ed result still traces its JVP;
    # all_gather is differentiable (transpose = psum_scatter) and the max
    # is stop_gradient'ed anyway (the logsumexp shift cancels exactly)
    shard_max = jnp.max(l_neg_part, axis=1, keepdims=True)       # [B_g, 1]
    gmax = jnp.max(jax.lax.all_gather(shard_max, model_axis, axis=1,
                                      tiled=True), axis=1, keepdims=True)
    zmax = jax.lax.stop_gradient(jnp.maximum(l_pos, gmax))
    sumexp = jnp.exp(l_pos - zmax) + jax.lax.psum(
        jnp.sum(jnp.exp(l_neg_part - zmax), axis=1, keepdims=True),
        model_axis)
    ce = jnp.mean(jnp.log(sumexp)[:, 0] + zmax[:, 0] - l_pos[:, 0])
    rank = jax.lax.psum(
        jnp.sum((l_neg_part > l_pos).astype(jnp.int32), axis=1), model_axis)
    return ce, rank


def queue_update_sharded(queue_shard, queue_ptr, keys, model_axis: str):
    """Ring enqueue into this device's K-shard (reference :345-359).

    queue_shard: [dim, K/M]; keys: [global_B, dim] (already gathered over
    BOTH mesh axes). The global pointer advances modulo K on every device;
    only the shard whose range contains the pointer writes.
    """
    k_shard = queue_shard.shape[1]
    batch = keys.shape[0]
    # trace-time guard, same rationale as builder.queue_update: XLA CLAMPS
    # dynamic_update_slice starts, and additionally a batch straddling two
    # shards would need a cross-device write. K/M % global_B == 0 makes
    # every enqueue land wholly inside one shard.
    if k_shard % batch != 0:
        raise ValueError(
            f"sharded queue: K/M ({k_shard}) must be divisible by the "
            f"global batch ({batch}) so each enqueue lands inside one "
            f"shard; adjust moco.k or the model-axis size")
    m = jax.lax.axis_index(model_axis).astype(queue_ptr.dtype)
    local = queue_ptr - m * k_shard
    in_range = (local >= 0) & (local < k_shard)
    start = jnp.clip(local, 0, k_shard - batch)
    updated = jax.lax.dynamic_update_slice(
        queue_shard, keys.T.astype(queue_shard.dtype),
        (jnp.zeros((), queue_ptr.dtype), start))
    queue_shard = jnp.where(in_range, updated, queue_shard)
    k_total = k_shard * jax.lax.psum(1, model_axis)
    queue_ptr = (queue_ptr + batch) % k_total
    return queue_shard, queue_ptr


def data_model_layout(cfg: MoCoConfig, data_axis: str = "data",
                      model_axis: str = "model") -> StepLayout:
    """2-D collectives: distributed softmax over queue shards, rank-count
    accuracies, psum(model)+pmean(data) grad combine, predicated enqueue."""

    def fold_rng(rng):
        # flat replica index (data-major, matching the 1-D device order)
        # so each shard draws its own speed/permutation like builder.py
        n_model = jax.lax.psum(1, model_axis)
        flat = (jax.lax.axis_index(data_axis) * n_model
                + jax.lax.axis_index(model_axis))
        return jax.random.fold_in(rng, flat)

    gather_m = lambda v: jax.lax.all_gather(  # noqa: E731
        v, model_axis, axis=0, tiled=True)

    def avid_loss(q_a, k_a, k_neg_a, queue, cfg):
        t = cfg.t
        l_pos_a1 = jnp.sum(q_a * k_a, axis=1, keepdims=True) / t
        l_pos_a2 = jnp.sum(q_a * k_neg_a, axis=1, keepdims=True) / t
        # model-group query gather (transpose = psum-scatter, so each
        # device's backward receives its rows' FULL cotangent)
        q_grp = gather_m(q_a)
        l_neg_part = (q_grp @ jax.lax.stop_gradient(queue)) / t
        ce1, rank1 = sharded_ce_and_rank(
            gather_m(l_pos_a1), l_neg_part, model_axis)
        ce2, rank2 = sharded_ce_and_rank(
            gather_m(l_pos_a2), l_neg_part, model_axis)
        return ce1 + ce2, (rank1, rank2)

    def avid_metrics(aux_a, cfg):
        rank1, rank2 = aux_a
        top5 = min(5, int(cfg.k) + 1)   # accuracy()'s maxk clamp
        acc = lambda r, n: jnp.mean(  # noqa: E731
            (r < n).astype(jnp.float32)) * 100.0
        return {"acc1_A": acc(rank1, 1), "acc5_A": acc(rank1, top5),
                "acc1_A_n": acc(rank2, 1), "acc5_A_n": acc(rank2, top5)}

    def loss_scale():
        # 1/M on the WHOLE loss: under shard_map, AD through the
        # collectives (all_gather -> psum_scatter, psum -> psum) makes
        # each device's grad equal d(sum over group members' losses)/
        # d(theta). The group CE is computed identically by all M
        # members, so its gradient arrives M-fold; the margin term is
        # per-member. Dividing by M makes psum(model) reconstruct
        # exactly [d(group CE) + d(group-mean margin)] and pmean(data)
        # the global objective (verified vs the 1-D step in
        # tests/test_sharded_queue.py — the unscaled version trains
        # the CE M x too hot and diverges from step 2 on).
        return 1.0 / jax.lax.psum(1, model_axis)

    def grad_combine(grads):
        # group grad = psum over model; global grad = mean over groups
        return jax.lax.pmean(jax.lax.psum(grads, model_axis), data_axis)

    def gather_keys(k_neg_a):
        # the global batch of negative-speed keys (both axes)
        return jax.lax.all_gather(gather_m(k_neg_a), data_axis, axis=0,
                                  tiled=True)

    return StepLayout(
        fold_rng=fold_rng,
        avid_loss=avid_loss,
        avid_metrics=avid_metrics,
        loss_scale=loss_scale,
        grad_combine=grad_combine,
        gather_keys=gather_keys,
        queue_update=lambda q, p, keys: queue_update_sharded(
            q, p, keys, model_axis),
        metrics_combine=lambda m: jax.lax.pmean(m, (data_axis, model_axis)),
    )


def make_train_step_2d(model, optimizer, cfg: MoCoConfig,
                       data_axis: str = "data",
                       model_axis: str = "model") -> Callable:
    """Per-device body of the 2-D step (wrap in shard_map via
    make_sharded_train_step_2d). ``model`` must be built with
    ``axis_name=(data_axis, model_axis)`` so BN moments psum over the
    whole mesh (the batch is sharded over both axes)."""
    return make_step_body(model, optimizer, cfg,
                          data_model_layout(cfg, data_axis, model_axis))


def make_eval_step_2d(model, cfg: MoCoConfig, data_axis: str = "data",
                      model_axis: str = "model") -> Callable:
    """No-grad statistics step against the K-sharded queue (2-D analogue
    of builder.make_eval_step, for ``pretrain.py --validate``)."""
    return make_eval_body(model, cfg,
                          data_model_layout(cfg, data_axis, model_axis))


def moco_state_specs_2d(model_axis: str = "model") -> MoCoState:
    """PartitionSpec pytree-prefix for a MoCoState with a K-sharded queue."""
    from jax.sharding import PartitionSpec as P
    return MoCoState(
        params_q=P(), params_k=P(), batch_stats_q=P(), batch_stats_k=P(),
        queue=P(None, model_axis), queue_ptr=P(), opt_state=P(), step=P())


def make_sharded_train_step_2d(model, optimizer, cfg: MoCoConfig, mesh,
                               data_axis: str = "data",
                               model_axis: str = "model",
                               donate: bool = True) -> Callable:
    """jit(shard_map(step)) over a 2-D mesh: batch sharded over BOTH axes,
    queue sharded along K over the model axis, everything else replicated."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    step = make_train_step_2d(model, optimizer, cfg,
                              data_axis=data_axis, model_axis=model_axis)
    state_specs = moco_state_specs_2d(model_axis)
    batch_spec = P((data_axis, model_axis))
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, P()),
        out_specs=(state_specs, P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_sharded_eval_step_2d(model, cfg: MoCoConfig, mesh,
                              data_axis: str = "data",
                              model_axis: str = "model") -> Callable:
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    step = make_eval_step_2d(model, cfg, data_axis=data_axis,
                             model_axis=model_axis)
    state_specs = moco_state_specs_2d(model_axis)
    batch_spec = P((data_axis, model_axis))
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def make_variable_speed_train_steps_2d(model, optimizer, cfg: MoCoConfig,
                                       mesh, data_axis: str = "data",
                                       model_axis: str = "model") -> dict:
    """Exact multi-speed on the 2-D layout: {speed: sharded step} — same
    semantics as builder.make_variable_speed_train_steps (one compiled
    step per speed at the reference's T_real = T//s, host draws the
    speed mesh-uniformly per step)."""
    return {
        s: make_sharded_train_step_2d(
            model, optimizer, speed_branch_config(cfg, s), mesh,
            data_axis=data_axis, model_axis=model_axis)
        for s in cfg.diff_speed
    }


def make_variable_speed_eval_steps_2d(model, cfg: MoCoConfig, mesh,
                                      data_axis: str = "data",
                                      model_axis: str = "model") -> dict:
    return {
        s: make_sharded_eval_step_2d(model, speed_branch_config(cfg, s),
                                     mesh, data_axis=data_axis,
                                     model_axis=model_axis)
        for s in cfg.diff_speed
    }


def shard_moco_state_2d(state: MoCoState, mesh,
                        model_axis: str = "model") -> MoCoState:
    """Place an init_moco_state result on a 2-D mesh: queue K-sharded,
    the rest replicated.

    device_put re-shards existing jax.Arrays device-side (no host
    round-trip — for the large-K regime this module exists for, a
    device_get would force a full host copy over the slow link)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    replicated = NamedSharding(mesh, P())
    qspec = NamedSharding(mesh, P(None, model_axis))
    placed = {
        f: jax.device_put(getattr(state, f),
                          qspec if f == "queue" else replicated)
        for f in state._fields
    }
    return MoCoState(**placed)


def gather_queue_2d(state: MoCoState, mesh) -> MoCoState:
    """Replicate the K-sharded queue (checkpoint-save path: the .pth.tar
    layout stores the dense [dim, K] queue, reference :345-359)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return state._replace(
        queue=jax.device_put(state.queue, NamedSharding(mesh, P())))
