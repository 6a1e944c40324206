"""Shared MoCo primitives + step body — layouts inject only collectives.

Both the 1-D data-parallel step (builder.py) and the 2-D data x model step
with a K-sharded queue (sharded_queue.py) run the SAME training math
(reference: MoCoDiffLossTwoFc, moco/builder_diffspeed_diffloss.py:286-546):

  EMA -> dual-speed gather -> key pass (fused 2B or reference-sequential)
      -> query fwd + loss -> grad combine -> SGD -> queue enqueue -> metrics

What differs between layouts is ONLY where collectives go: how the RNG is
folded per replica, how the A-VID contrastive term is computed against the
(possibly K-sharded) queue, how gradients are combined across the mesh, how
keys are gathered for the enqueue, and how metrics are averaged. Those hooks
live in a :class:`StepLayout`; everything else is written once here so the
two step builders cannot drift (the round-3 hand-forked 2-D body silently
lacked ``fused_key_pass=False`` and exact multi-speed).

This module also holds the layout-independent primitives (config/state
types, EMA, dual-speed index math); builder.py re-exports them so the
public import surface is unchanged.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


class MoCoConfig(NamedTuple):
    dim: int = 128
    k: int = 16384
    m: float = 0.999
    t: float = 0.07
    diff_speed: Tuple[int, ...] = (2,)
    fc_type: str = "linear"
    loss_lambda_a: float = 1.0
    loss_lambda_m: float = 1.0
    margin: float = 2.0              # reference: pretrain.py:49-53
    alpha: float = 0.5               # batch split fraction (reference :334)
    # packed frames: the loader ships only the UNION of frames any speed
    # row can touch (packed_frame_subset) instead of the full T-frame
    # window — e.g. 24 of 32 frames for diff_speed=(2,): 25% less decode
    # and host->device traffic, bit-identical training math. When True,
    # t_load must carry the ORIGINAL window length (temporal size) since
    # the input's frame axis is the packed length.
    packed_frames: bool = False
    t_load: Optional[int] = None
    # exact multi-speed mode: the speeds the LOADER packed for (the exact
    # union, see packed_frame_subset(exact=True)) when this config is a
    # single-speed branch of make_variable_speed_train_steps. None =
    # the subset layout is packed_frame_subset(t_load, diff_speed).
    pack_speeds: Optional[Tuple[int, ...]] = None
    # fused key pass: run both no-grad key clips (real + negative) as ONE
    # 2B-batch forward — half the launches, better MXU tiling. BN batch
    # stats then cover both speed distributions at once instead of the
    # reference's two sequential B-batches (builder:445,512): a deliberate,
    # stats-only deviation. False restores the reference's sequential
    # passes bit-for-bit (used by tests/test_step_parity.py to pin the
    # whole train step against the reference torch modules).
    fused_key_pass: bool = True


class MoCoState(NamedTuple):
    """Full pretraining state threaded through the compiled step."""
    params_q: Any
    params_k: Any
    batch_stats_q: Any
    batch_stats_k: Any
    queue: jnp.ndarray              # [dim, K], L2-normalized columns
    queue_ptr: jnp.ndarray          # [] int32
    opt_state: Any
    step: jnp.ndarray               # [] int32


def init_moco_state(model, cfg: MoCoConfig, optimizer, rng,
                    sample_shape: Tuple[int, ...]) -> MoCoState:
    """Initialize encoders (k = copy of q), queue, and optimizer state."""
    dummy = jnp.zeros(sample_shape, jnp.float32)
    rng_p, rng_queue = jax.random.split(rng)
    variables = model.init({"params": rng_p}, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())

    queue = jax.random.normal(rng_queue, (cfg.dim, cfg.k), jnp.float32)
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)

    return MoCoState(
        params_q=params,
        params_k=jax.tree_util.tree_map(jnp.copy, params),
        batch_stats_q=batch_stats,
        batch_stats_k=jax.tree_util.tree_map(jnp.copy, batch_stats),
        queue=queue,
        queue_ptr=jnp.zeros((), jnp.int32),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def momentum_update(params_q, params_k, m: float):
    """EMA of the key encoder (reference :337-343)."""
    return jax.tree_util.tree_map(
        lambda k, q: k * m + q * (1.0 - m), params_k, params_q)


def real_clip_len(T: int, diff_speed: Sequence[int]) -> int:
    """Static network clip length: T // max(diff_speed).

    The reference's per-step T//s varies with the sampled speed (GPU-eager
    only); XLA needs one static length, so every speed emits the window of
    the FASTEST speed's length (all slower speeds have >= that many frames).
    """
    if not diff_speed:
        raise ValueError(
            "moco.diff_speed must be non-empty: the dual-speed builder "
            "requires at least one speed (the reference asserts the same, "
            "builder:334)")
    return T // max(diff_speed)


def speed_index_sets(T: int, diff_speed: Sequence[int]) -> jnp.ndarray:
    """Precomputed [n_speeds, T_real] temporal index table.

    Row i holds arange(0, T, diff_speed[i])[:T_real]; T_real =
    T // max(diff_speed) so every row is full length.
    """
    t_real = real_clip_len(T, diff_speed)
    rows = [jnp.arange(0, T, s)[:t_real] for s in diff_speed]
    return jnp.stack(rows)


def packed_frame_subset(T: int, diff_speed: Sequence[int],
                        exact: bool = False):
    """Sorted union of window positions any speed row can touch.

    For diff_speed=(2,), T=32: {0..15} ∪ {0,2,..,30} = 24 positions. The
    loader decodes/ships only these; diff_speed_gather addresses the packed
    axis via positions-within-subset, so the training math is bit-identical
    to shipping all T frames.

    ``exact=True`` is the multi-speed variable-length mode (one compiled
    step per speed, T_real = T//s like the reference): each speed s needs
    its OWN slow window range(T//s) plus its fast row, so the union is
    over per-speed needs instead of the single pinned T//max window.
    """
    import numpy as np
    if exact:
        need = set()
        for s in diff_speed:
            t_real = T // s
            need.update(range(t_real))
            need.update(range(0, T, s)[:t_real])
    else:
        t_real = real_clip_len(T, diff_speed)
        need = set(range(t_real))                   # speed-1 window
        for s in diff_speed:
            need.update(range(0, T, s)[:t_real])
    return np.asarray(sorted(need), np.int64)


def diff_speed_gather(im_q, im_k, key, cfg: MoCoConfig):
    """Dual-speed subsampling (reference _diff_speed :421-447).

    im_q/im_k: [B, T, H, W, C] ([B, P, H, W, C] with cfg.packed_frames,
    P = len(packed_frame_subset(cfg.t_load, diff_speed))). Returns
    (im_q_real, im_k_real, im_k_negative) each [B, T_real, H, W, C]: half
    the batch plays at normal speed, half at the sampled fast speed; the
    negative key plays at the *opposite* speed of its query.
    """
    import numpy as np
    B = im_q.shape[0]
    if cfg.packed_frames and cfg.t_load is None:
        raise ValueError(
            "moco.packed_frames=True requires t_load (the unpacked window "
            "length, normally temporal_transforms.size) — the packed input "
            "no longer carries it in its shape")
    T = cfg.t_load if cfg.packed_frames else im_q.shape[1]
    t_real = real_clip_len(T, cfg.diff_speed)
    key_perm, key_speed = jax.random.split(key)

    # which samples get speed-2 (fast) treatment: random half of the batch
    perm = jax.random.permutation(key_perm, B)
    n_s1 = int(B * cfg.alpha)
    is_fast = jnp.zeros((B,), bool).at[perm[n_s1:]].set(True)

    speed1 = jnp.arange(T)[:t_real]                        # normal speed
    table = speed_index_sets(T, cfg.diff_speed)            # fast candidates
    if cfg.packed_frames:
        # remap window positions -> positions within the packed subset
        # (pack_speeds: the loader packed the exact multi-speed union and
        # this cfg is one single-speed branch of it)
        if cfg.pack_speeds is not None:
            subset = packed_frame_subset(T, cfg.pack_speeds, exact=True)
        else:
            subset = packed_frame_subset(T, cfg.diff_speed)
        assert im_q.shape[1] == len(subset), (
            f"packed input has {im_q.shape[1]} frames, subset needs "
            f"{len(subset)} (t_load={T}, diff_speed={cfg.diff_speed})")
        speed1 = jnp.asarray(np.searchsorted(subset, np.arange(t_real)))
        table = jnp.asarray(
            np.searchsorted(subset, np.asarray(
                [np.arange(0, T, s)[:t_real] for s in cfg.diff_speed])))
    s_idx = jax.random.randint(key_speed, (), 0, len(cfg.diff_speed))
    speed2 = table[s_idx]

    # per-sample temporal index rows
    idx_same = jnp.where(is_fast[:, None], speed2[None, :], speed1[None, :])
    idx_opp = jnp.where(is_fast[:, None], speed1[None, :], speed2[None, :])

    def gather_t(x, idx):
        # x: [B, T, H, W, C], idx: [B, T_real]. Batched take along T.
        # Measured alternative (2026-08-17): a one-hot einsum at
        # Precision.HIGHEST (exactness needs f32; default TPU matmul
        # rounds through bf16) was SLOWER — 110.9 vs 106.5 ms/step at
        # b128 — despite the gather's ~2.7 ms of element-gather + layout
        # copies. Whole-T-slice gathers lower fine; only per-PIXEL
        # gathers are poison (see ops/augment.py).
        return jax.vmap(lambda clip, i: jnp.take(clip, i, axis=0))(x, idx)

    im_q_real = gather_t(im_q, idx_same)
    im_k_real = gather_t(im_k, idx_same)
    im_k_negative = gather_t(im_k, idx_opp)
    return im_q_real, im_k_real, im_k_negative


def speed_branch_config(cfg: MoCoConfig, speed: int) -> MoCoConfig:
    """Single-speed branch of an exact multi-speed config.

    The branch trains at the reference's per-speed clip length
    T_real = T//speed (builder_diffspeed_diffloss.py:431-434); when the
    loader ships packed frames it packed the exact multi-speed union, so
    the branch must address THAT layout (pack_speeds)."""
    return cfg._replace(
        diff_speed=(speed,),
        pack_speeds=tuple(cfg.diff_speed) if cfg.packed_frames else None)


# -- the shared step body ------------------------------------------------


class StepLayout(NamedTuple):
    """Collective hooks a mesh layout injects into the shared step body.

    avid_loss(q_a, k_a, k_neg_a, queue, cfg) -> (loss_a, aux_a):
        the A-VID CE sum over both positives, logits already divided by
        cfg.t; ``aux_a`` is whatever avid_metrics later needs (dense
        logits for 1-D, psum'd rank counts for 2-D).
    avid_metrics(aux_a, cfg) -> dict with acc{1,5}_A and acc{1,5}_A_n.
    loss_scale() -> multiplier applied to the WHOLE differentiated loss
        (1 for 1-D; 1/M for the 2-D group objective — under shard_map, AD
        through the group collectives returns d(sum of all M members'
        losses)/d(theta), so a group-identical term backpropagates M-fold;
        see sharded_queue.py).
    grad_combine(grads): mesh-wide gradient reduction (pmean / psum+pmean).
    gather_keys(k_neg_a): local keys -> global batch of keys.
    queue_update(queue, ptr, keys): ring enqueue (dense or K-sharded).
    metrics_combine(dict): mesh-wide metric average.
    fold_rng(rng): per-replica RNG fold (reference draws per rank,
        builder:425-428).
    """
    fold_rng: Callable[[Any], Any]
    avid_loss: Callable[..., Any]
    avid_metrics: Callable[..., dict]
    loss_scale: Callable[[], Any]
    grad_combine: Callable[[Any], Any]
    gather_keys: Callable[[Any], Any]
    queue_update: Callable[[Any, Any, Any], Any]
    metrics_combine: Callable[[dict], dict]


def _apply_encoder(model, params, batch_stats, x, train):
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=train,
        mutable=["batch_stats"] if train else [], rngs=None)
    new_stats = mut["batch_stats"] if train else batch_stats
    return out, new_stats


def _key_pass(model, cfg: MoCoConfig, params_k, batch_stats_k,
              im_k_real, im_k_neg):
    """No-grad key encoding: ONE fused 2B forward (half the launches,
    better MXU tiling) or the reference's two sequential B-batch passes
    (builder:445,512 — BN batch stats over B not 2B; parity-test mode)."""
    b = im_k_real.shape[0]
    if cfg.fused_key_pass:
        k_both = jnp.concatenate([im_k_real, im_k_neg], axis=0)
        (kb_a, kb_m), stats_k = _apply_encoder(
            model, params_k, batch_stats_k, k_both, train=True)
        kb_a = jax.lax.stop_gradient(kb_a)
        kb_m = jax.lax.stop_gradient(kb_m)
        return kb_a[:b], kb_m[:b], kb_a[b:], kb_m[b:], stats_k
    # reference order: negative first (inside _diff_speed, :445), then the
    # real key (forward, :512) — running BN stats update twice sequentially
    (k_neg_a, k_neg_m), stats_k = _apply_encoder(
        model, params_k, batch_stats_k, im_k_neg, train=True)
    (k_a, k_m), stats_k = _apply_encoder(
        model, params_k, stats_k, im_k_real, train=True)
    return (jax.lax.stop_gradient(k_a), jax.lax.stop_gradient(k_m),
            jax.lax.stop_gradient(k_neg_a), jax.lax.stop_gradient(k_neg_m),
            stats_k)


def make_step_body(model, optimizer, cfg: MoCoConfig,
                   layout: StepLayout) -> Callable:
    """The per-replica train step, complete except for layout collectives.

    Returns step(state, im_q, im_k, rng) -> (state, metrics); wrap it in
    shard_map/jit via the layout-specific builders.
    """

    def step(state: MoCoState, im_q, im_k, rng):
        rng = layout.fold_rng(rng)
        rng_speed, _ = jax.random.split(rng)

        # 1. momentum update BEFORE key encoding (reference :507-509)
        params_k = momentum_update(state.params_q, state.params_k, cfg.m)

        # 2. dual-speed sampling (no grad)
        im_q_real, im_k_real, im_k_neg = diff_speed_gather(
            im_q, im_k, rng_speed, cfg)

        # 3. key encoder pass (no grad; cross-replica BN via the model's
        #    axis_name replaces shuffle-BN)
        k_a, k_m, k_neg_a, k_neg_m, stats_k = _key_pass(
            model, cfg, params_k, state.batch_stats_k, im_k_real, im_k_neg)

        # 4. query pass + loss (differentiated)
        t = cfg.t

        def loss_fn(params_q):
            (q_a, q_m), stats_q = _apply_encoder(
                model, params_q, state.batch_stats_q, im_q_real, train=True)
            loss_a, aux_a = layout.avid_loss(q_a, k_a, k_neg_a,
                                             state.queue, cfg)
            l_pos_m = jnp.sum(q_m * k_m, axis=1, keepdims=True) / t
            l_neg_m = jnp.sum(q_m * k_neg_m, axis=1, keepdims=True) / t
            loss_m = jnp.maximum(
                0.0, cfg.margin - (l_pos_m - l_neg_m)).mean()
            loss = (cfg.loss_lambda_a * loss_a
                    + cfg.loss_lambda_m * loss_m) * layout.loss_scale()
            return loss, (stats_q, loss_a, loss_m, aux_a, l_pos_m, l_neg_m)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_q)
        stats_q, loss_a, loss_m, aux_a, l_pos_m, l_neg_m = aux

        # 5. mesh-wide gradient combine (replaces DDP allreduce) + SGD
        grads = layout.grad_combine(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)

        # 6. queue update with globally gathered negative keys
        #    (reference enqueues k_neg_A, :544)
        keys = layout.gather_keys(k_neg_a)
        queue, queue_ptr = layout.queue_update(state.queue, state.queue_ptr,
                                               keys)

        # 7. metrics (percent), averaged over the mesh. "loss" is the
        #    UNSCALED objective (identical across group members in 2-D).
        acc_m = jnp.mean((l_pos_m > l_neg_m).astype(jnp.float32)) * 100.0
        metrics = {
            "loss": (cfg.loss_lambda_a * loss_a
                     + cfg.loss_lambda_m * loss_m),
            "loss_A": loss_a, "loss_M": loss_m,
            **layout.avid_metrics(aux_a, cfg),
            "acc1_M": acc_m,
        }
        metrics = layout.metrics_combine(metrics)

        new_state = MoCoState(
            params_q=params_q, params_k=params_k,
            batch_stats_q=stats_q, batch_stats_k=stats_k,
            queue=queue, queue_ptr=queue_ptr,
            opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return step


def make_eval_body(model, cfg: MoCoConfig, layout: StepLayout) -> Callable:
    """No-grad statistics step for `pretrain.py --validate`
    (reference: pretrain.py:300-304 runs one epoch without updates).

    Same logits/loss/accuracy metrics as training, mutating NOTHING: no
    EMA, no BN stat update (running stats), no queue write, no optimizer.
    """

    def apply_eval(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    def step(state: MoCoState, im_q, im_k, rng):
        rng = layout.fold_rng(rng)
        im_q_real, im_k_real, im_k_neg = diff_speed_gather(
            im_q, im_k, rng, cfg)

        # one fused 2B key forward (eval BN uses running stats, so
        # batching the two clips cannot change any statistic)
        b = im_k_real.shape[0]
        k2_a, k2_m = apply_eval(state.params_k, state.batch_stats_k,
                                jnp.concatenate([im_k_real, im_k_neg],
                                                axis=0))
        k_a, k_neg_a = k2_a[:b], k2_a[b:]
        k_m, k_neg_m = k2_m[:b], k2_m[b:]
        q_a, q_m = apply_eval(state.params_q, state.batch_stats_q, im_q_real)

        t = cfg.t
        loss_a, aux_a = layout.avid_loss(q_a, k_a, k_neg_a, state.queue, cfg)
        l_pos_m = jnp.sum(q_m * k_m, axis=1, keepdims=True) / t
        l_neg_m = jnp.sum(q_m * k_neg_m, axis=1, keepdims=True) / t
        loss_m = jnp.maximum(0.0, cfg.margin - (l_pos_m - l_neg_m)).mean()

        acc_m = jnp.mean((l_pos_m > l_neg_m).astype(jnp.float32)) * 100.0
        metrics = {
            "loss": (cfg.loss_lambda_a * loss_a
                     + cfg.loss_lambda_m * loss_m),
            "loss_A": loss_a, "loss_M": loss_m,
            **layout.avid_metrics(aux_a, cfg),
            "acc1_M": acc_m,
        }
        return layout.metrics_combine(metrics)

    return step
