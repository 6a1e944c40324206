"""MoCo + relative-speed pretraining as pure state transitions.

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
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..framework.metrics import accuracy


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


def make_train_step(model, optimizer, cfg: MoCoConfig,
                    axis_name: Optional[str] = "data"
                    ) -> Callable:
    """Build the per-replica train step (to be wrapped in shard_map/jit).

    model: MultiTaskWrapper in pretrain mode (BN axis_name must match).
    Returns step(state, im_q, im_k, rng) -> (state, metrics).
    """

    def apply_encoder(params, batch_stats, x, train):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=train,
            mutable=["batch_stats"] if train else [],
            rngs=None)
        new_stats = mut["batch_stats"] if train else batch_stats
        return out, new_stats

    def step(state: MoCoState, im_q, im_k, rng):
        # fold in the replica index so each replica draws its OWN speed
        # choice and shard permutation — matching the reference's per-rank
        # RNG (random.choice + local randperm, builder :425-428); with
        # diff_speed=(2,) the speed draw is degenerate either way
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng_speed, _ = jax.random.split(rng)

        # 1. momentum update BEFORE key encoding (reference :507-509)
        params_k = momentum_update(state.params_q, state.params_k, cfg.m)

        # 2. dual-speed sampling (no grad)
        im_q_real, im_k_real, im_k_neg = diff_speed_gather(
            im_q, im_k, rng_speed, cfg)

        # 3. key encoder pass (no grad; cross-replica BN instead of
        #    shuffle-BN). Both key clips run as ONE batched forward — half
        #    the kernel launches and better MXU tiling than the reference's
        #    two sequential passes (builder:445,512); BN then sees both
        #    speed distributions at once, which only stabilizes its stats.
        b = im_k_real.shape[0]
        if cfg.fused_key_pass:
            k_both = jnp.concatenate([im_k_real, im_k_neg], axis=0)
            (kb_a, kb_m), stats_k = apply_encoder(
                params_k, state.batch_stats_k, k_both, train=True)
            kb_a = jax.lax.stop_gradient(kb_a)
            kb_m = jax.lax.stop_gradient(kb_m)
            k_a, k_neg_a = kb_a[:b], kb_a[b:]
            k_m, k_neg_m = kb_m[:b], kb_m[b:]
        else:
            # reference order: negative first (inside _diff_speed, :445),
            # then the real key (forward, :512) — running BN stats update
            # twice sequentially; batch stats per pass cover B samples
            (k_neg_a, k_neg_m), stats_k = apply_encoder(
                params_k, state.batch_stats_k, im_k_neg, train=True)
            (k_a, k_m), stats_k = apply_encoder(
                params_k, stats_k, im_k_real, train=True)
            k_a = jax.lax.stop_gradient(k_a)
            k_m = jax.lax.stop_gradient(k_m)
            k_neg_a = jax.lax.stop_gradient(k_neg_a)
            k_neg_m = jax.lax.stop_gradient(k_neg_m)

        # 4. query pass + loss (differentiated)
        def loss_fn(params_q):
            (q_a, q_m), stats_q = apply_encoder(
                params_q, state.batch_stats_q, im_q_real, train=True)
            l_pos_a1 = jnp.sum(q_a * k_a, axis=1, keepdims=True)
            l_pos_a2 = jnp.sum(q_a * k_neg_a, axis=1, keepdims=True)
            l_neg_a = q_a @ jax.lax.stop_gradient(state.queue)
            l_pos_m = jnp.sum(q_m * k_m, axis=1, keepdims=True)
            l_neg_m = jnp.sum(q_m * k_neg_m, axis=1, keepdims=True)

            t = cfg.t
            logits1 = jnp.concatenate([l_pos_a1, l_neg_a], axis=1) / t
            logits2 = jnp.concatenate([l_pos_a2, l_neg_a], axis=1) / t
            l_pos_m, l_neg_m = l_pos_m / t, l_neg_m / t

            loss, loss_a, loss_m = moco_loss(logits1, logits2, l_pos_m,
                                             l_neg_m, cfg)
            aux = (stats_q, logits1, logits2, l_pos_m, l_neg_m,
                   loss_a, loss_m)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_q)
        stats_q, logits1, logits2, l_pos_m, l_neg_m, loss_a, loss_m = aux

        # 5. data-parallel gradient mean (replaces DDP allreduce);
        #    loss is only consumed through the metrics dict, which is
        #    pmean'd wholesale below — no separate collective needed
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params_q)
        params_q = optax.apply_updates(state.params_q, updates)

        # 6. queue update with globally gathered negative keys
        #    (reference enqueues k_neg_A, :544)
        keys = k_neg_a
        if axis_name is not None:
            keys = jax.lax.all_gather(k_neg_a, axis_name, axis=0,
                                      tiled=True)
        queue, queue_ptr = queue_update(state.queue, state.queue_ptr, keys)

        # 7. metrics (percent), averaged over replicas
        labels = jnp.zeros(logits1.shape[0], jnp.int32)
        acc1_a, acc5_a = accuracy(logits1, labels, topk=(1, 5))
        acc1_a2, acc5_a2 = accuracy(logits2, labels, topk=(1, 5))
        acc_m = jnp.mean((l_pos_m > l_neg_m).astype(jnp.float32)) * 100.0
        metrics = {
            "loss": loss, "loss_A": loss_a, "loss_M": loss_m,
            "acc1_A": acc1_a, "acc5_A": acc5_a,
            "acc1_A_n": acc1_a2, "acc5_A_n": acc5_a2,
            "acc1_M": acc_m,
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = MoCoState(
            params_q=params_q, params_k=params_k,
            batch_stats_q=stats_q, batch_stats_k=stats_k,
            queue=queue, queue_ptr=queue_ptr,
            opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return step


def make_eval_step(model, cfg: MoCoConfig,
                   axis_name: Optional[str] = "data") -> Callable:
    """No-grad statistics step for `pretrain.py --validate`
    (reference: pretrain.py:300-304 runs one epoch without updates).

    Computes the same logits/loss/accuracy metrics as training but mutates
    NOTHING: no EMA, no BN stat update, no queue write, no optimizer.
    """

    def apply_eval(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    def step(state: MoCoState, im_q, im_k, rng):
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        im_q_real, im_k_real, im_k_neg = diff_speed_gather(
            im_q, im_k, rng, cfg)

        # one fused 2B key forward, like the train step (half the kernel
        # launches / dispatches; eval BN uses running stats so batching
        # the two clips cannot change any statistic)
        b = im_k_real.shape[0]
        k2_a, k2_m = apply_eval(state.params_k, state.batch_stats_k,
                                jnp.concatenate([im_k_real, im_k_neg],
                                                axis=0))
        k_a, k_neg_a = k2_a[:b], k2_a[b:]
        k_m, k_neg_m = k2_m[:b], k2_m[b:]
        q_a, q_m = apply_eval(state.params_q, state.batch_stats_q, im_q_real)

        t = cfg.t
        l_neg_a = q_a @ state.queue
        logits1 = jnp.concatenate(
            [jnp.sum(q_a * k_a, axis=1, keepdims=True), l_neg_a], axis=1) / t
        logits2 = jnp.concatenate(
            [jnp.sum(q_a * k_neg_a, axis=1, keepdims=True), l_neg_a],
            axis=1) / t
        l_pos_m = jnp.sum(q_m * k_m, axis=1, keepdims=True) / t
        l_neg_m = jnp.sum(q_m * k_neg_m, axis=1, keepdims=True) / t

        loss, loss_a, loss_m = moco_loss(logits1, logits2, l_pos_m, l_neg_m,
                                         cfg)
        labels = jnp.zeros(logits1.shape[0], jnp.int32)
        acc1_a, acc5_a = accuracy(logits1, labels, topk=(1, 5))
        acc1_a2, acc5_a2 = accuracy(logits2, labels, topk=(1, 5))
        acc_m = jnp.mean((l_pos_m > l_neg_m).astype(jnp.float32)) * 100.0
        metrics = {
            "loss": loss, "loss_A": loss_a, "loss_M": loss_m,
            "acc1_A": acc1_a, "acc5_A": acc5_a,
            "acc1_A_n": acc1_a2, "acc5_A_n": acc5_a2,
            "acc1_M": acc_m,
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return metrics

    return step


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


def speed_branch_config(cfg: MoCoConfig, speed: int) -> MoCoConfig:
    """Single-speed branch of an exact multi-speed config.

    The branch trains at the reference's per-speed clip length
    T_real = T//speed (builder_diffspeed_diffloss.py:431-434); when the
    loader ships packed frames it packed the exact multi-speed union, so
    the branch must address THAT layout (pack_speeds)."""
    return cfg._replace(
        diff_speed=(speed,),
        pack_speeds=tuple(cfg.diff_speed) if cfg.packed_frames else None)


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
