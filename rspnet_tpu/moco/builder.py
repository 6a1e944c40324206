"""MoCo + relative-speed pretraining as pure state transitions (1-D layout).

TPU-native redesign of the reference's eager multi-kernel step (reference:
moco/builder_diffspeed_diffloss.py:286-546). One compiled program per step
fuses: momentum EMA, dual-speed temporal gather, three encoder passes,
logits + loss, grad psum, SGD update, and the ring-buffer queue update.

Design mapping (SURVEY.md §5.8):
- shuffle-BN -> cross-replica BatchNorm (BN modules get ``axis_name='data'``
  so moments psum over the mesh). Removes 4 all_gathers/step and the rank-0
  permutation broadcast while decorrelating BN stats strictly better.
- negative queue -> replicated [dim, K] buffer updated with all-gathered
  keys via dynamic_update_slice; K % global_batch == 0 invariant kept
  (reference :353, utils/moco.py:8-21).
- per-step diff-speed choice -> lax.switch over precomputed index sets with
  STATIC clip length T_real = T // max(diff_speed) (XLA needs static shapes;
  the reference's variable T//s per step is GPU-eager-only. For the shipped
  configs diff_speed=[2] the semantics are identical).

The step BODY (EMA -> gather -> key pass -> query loss -> update -> enqueue
-> metrics) lives in step_core.make_step_body; this module defines only the
1-D data-parallel collectives (StepLayout) and the public step builders.
The 2-D data x model layout with a K-sharded queue is sharded_queue.py.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..framework.metrics import accuracy
# Layout-independent primitives live in step_core; re-exported here so the
# established import surface (moco.builder.real_clip_len etc.) is unchanged.
from .step_core import (MoCoConfig, MoCoState, StepLayout,  # noqa: F401
                        diff_speed_gather, init_moco_state, make_eval_body,
                        make_step_body, momentum_update, packed_frame_subset,
                        real_clip_len, speed_branch_config, speed_index_sets)


def queue_update(queue, queue_ptr, keys):
    """Ring-buffer enqueue of (already globally gathered) keys
    (reference :345-359). keys: [global_B, dim]."""
    batch = keys.shape[0]
    # Load-bearing static check (reference asserts it at runtime,
    # _dequeue_and_enqueue): XLA CLAMPS a dynamic_update_slice start
    # instead of wrapping, so a non-divisible K would silently overwrite
    # live columns while the pointer advances modulo K — writes and
    # pointer permanently disagree, training degrades with no error.
    if queue.shape[1] % batch != 0:
        raise ValueError(
            f"moco.k ({queue.shape[1]}) must be divisible by the global "
            f"batch ({batch}); see utils/moco.py:replace_moco_k_in_config")
    queue = jax.lax.dynamic_update_slice(
        queue, keys.T.astype(queue.dtype),
        # the 0 literal must match queue_ptr's integer width (x64 mode
        # would otherwise promote it to int64 and dynamic_update_slice
        # rejects mixed index types)
        (jnp.zeros((), queue_ptr.dtype), queue_ptr))
    queue_ptr = (queue_ptr + batch) % queue.shape[1]
    return queue, queue_ptr


def moco_loss(logits1, logits2, l_pos_m, l_neg_m, cfg: MoCoConfig):
    """A * (CE(logits1) + CE(logits2)) + M * margin_ranking
    (reference Loss :263-283); labels_A = 0, ranking target = +1."""
    labels = jnp.zeros(logits1.shape[0], jnp.int32)
    ce1 = optax.softmax_cross_entropy_with_integer_labels(logits1, labels).mean()
    ce2 = optax.softmax_cross_entropy_with_integer_labels(logits2, labels).mean()
    ranking = jnp.maximum(0.0, cfg.margin - (l_pos_m - l_neg_m)).mean()
    loss_a = ce1 + ce2
    loss = cfg.loss_lambda_a * loss_a + cfg.loss_lambda_m * ranking
    return loss, loss_a, ranking


def _avid_loss_dense(q_a, k_a, k_neg_a, queue, cfg: MoCoConfig):
    """Dense A-VID logits against the replicated queue (reference
    :521-532): rows [l_pos, l_neg...] / t for both positives."""
    t = cfg.t
    l_pos_a1 = jnp.sum(q_a * k_a, axis=1, keepdims=True)
    l_pos_a2 = jnp.sum(q_a * k_neg_a, axis=1, keepdims=True)
    l_neg_a = q_a @ jax.lax.stop_gradient(queue)
    logits1 = jnp.concatenate([l_pos_a1, l_neg_a], axis=1) / t
    logits2 = jnp.concatenate([l_pos_a2, l_neg_a], axis=1) / t
    labels = jnp.zeros(logits1.shape[0], jnp.int32)
    ce1 = optax.softmax_cross_entropy_with_integer_labels(
        logits1, labels).mean()
    ce2 = optax.softmax_cross_entropy_with_integer_labels(
        logits2, labels).mean()
    return ce1 + ce2, (logits1, logits2)


def _avid_metrics_dense(aux_a, cfg: MoCoConfig) -> dict:
    logits1, logits2 = aux_a
    labels = jnp.zeros(logits1.shape[0], jnp.int32)
    acc1_a, acc5_a = accuracy(logits1, labels, topk=(1, 5))
    acc1_a2, acc5_a2 = accuracy(logits2, labels, topk=(1, 5))
    return {"acc1_A": acc1_a, "acc5_A": acc5_a,
            "acc1_A_n": acc1_a2, "acc5_A_n": acc5_a2}


def data_parallel_layout(axis_name: Optional[str] = "data") -> StepLayout:
    """1-D data-parallel collectives (axis_name=None: single replica, used
    by the float64 reference-parity oracle in tests/test_step_parity.py)."""
    if axis_name is None:
        return StepLayout(
            fold_rng=lambda rng: rng,
            avid_loss=_avid_loss_dense,
            avid_metrics=_avid_metrics_dense,
            loss_scale=lambda: 1.0,
            grad_combine=lambda g: g,
            gather_keys=lambda k: k,
            queue_update=queue_update,
            metrics_combine=lambda m: m,
        )
    return StepLayout(
        # fold in the replica index so each replica draws its OWN speed
        # choice and shard permutation — matching the reference's per-rank
        # RNG (random.choice + local randperm, builder :425-428); with
        # diff_speed=(2,) the speed draw is degenerate either way
        fold_rng=lambda rng: jax.random.fold_in(
            rng, jax.lax.axis_index(axis_name)),
        avid_loss=_avid_loss_dense,
        avid_metrics=_avid_metrics_dense,
        loss_scale=lambda: 1.0,
        # data-parallel gradient mean (replaces DDP allreduce)
        grad_combine=lambda g: jax.lax.pmean(g, axis_name),
        gather_keys=lambda k: jax.lax.all_gather(k, axis_name, axis=0,
                                                 tiled=True),
        queue_update=queue_update,
        metrics_combine=lambda m: jax.lax.pmean(m, axis_name),
    )


def make_train_step(model, optimizer, cfg: MoCoConfig,
                    axis_name: Optional[str] = "data") -> Callable:
    """Build the per-replica train step (to be wrapped in shard_map/jit).

    model: MultiTaskWrapper in pretrain mode (BN axis_name must match).
    Returns step(state, im_q, im_k, rng) -> (state, metrics).
    """
    return make_step_body(model, optimizer, cfg,
                          data_parallel_layout(axis_name))


def make_eval_step(model, cfg: MoCoConfig,
                   axis_name: Optional[str] = "data") -> Callable:
    """No-grad statistics step for `pretrain.py --validate`
    (reference: pretrain.py:300-304 runs one epoch without updates)."""
    return make_eval_body(model, cfg, data_parallel_layout(axis_name))


def make_sharded_eval_step(model, cfg: MoCoConfig, mesh,
                           axis_name: str = "data") -> Callable:
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    step = make_eval_step(model, cfg, axis_name=axis_name)
    sharded = shard_map(step, mesh=mesh,
                        in_specs=(P(), P(axis_name), P(axis_name), P()),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def make_sharded_train_step(model, optimizer, cfg: MoCoConfig, mesh,
                            axis_name: str = "data",
                            donate: bool = True) -> Callable:
    """jit(shard_map(step)): batch sharded on the data axis, state replicated.

    The returned function takes (state, im_q [B_global,...], im_k, rng) and
    runs one fused step over the whole mesh.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    step = make_train_step(model, optimizer, cfg, axis_name=axis_name)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_variable_speed_train_steps(model, optimizer, cfg: MoCoConfig, mesh,
                                    axis_name: str = "data") -> dict:
    """Exact multi-speed training: {speed: sharded step}.

    The reference draws a speed per step (random.choice, builder:431) and
    trains that step at T_real = T//s — a DIFFERENT clip length per draw,
    which XLA cannot express in one program (static shapes). The honest
    TPU mapping is one compiled step per speed with the host drawing the
    speed per step (engines/pretrain.py). Two deliberate deviations,
    documented: the draw is mesh-uniform per step (the reference's is
    per-rank — SPMD shares one program per step), and compile cost is
    x len(diff_speed). Every state array is shape-identical across
    branches, so the steps interleave freely on one MoCoState.
    """
    return {
        s: make_sharded_train_step(
            model, optimizer, speed_branch_config(cfg, s), mesh,
            axis_name=axis_name)
        for s in cfg.diff_speed
    }


def make_variable_speed_eval_steps(model, cfg: MoCoConfig, mesh,
                                   axis_name: str = "data") -> dict:
    return {
        s: make_sharded_eval_step(model, speed_branch_config(cfg, s), mesh,
                                  axis_name=axis_name)
        for s in cfg.diff_speed
    }
