"""Supervised classification steps (finetune/validate), mesh-parallel.

One fused program per step: forward (+multi-crop logit averaging on device),
CE loss, grad pmean, optimizer update (reference: finetune.py EpochContext
:95-146 — reshape_clip/average_logits become static reshapes inside jit).

Linear-probe mode (only_train_fc, reference models/__init__.py:83-106):
gradients are masked to classifier params and BN runs in eval mode.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..framework.metrics import accuracy


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(model, optimizer, rng, sample_shape) -> TrainState:
    dummy = jnp.zeros(sample_shape, jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def fc_only_mask(params, fc_names=("fc", "linear", "head", "new_fc")) -> Any:
    """Pytree mask: True for classifier-head params (reference blacklist,
    finetune.py:296-302 lists head names)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: (k[0] in fc_names) for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def make_classifier_train_step(model, optimizer, *, n_crop: int = 1,
                               axis_name: Optional[str] = "data",
                               only_train_fc: bool = False) -> Callable:
    """step(state, clips [B, n_crop*T, S, S, C], labels [B], rng)
    -> (state, metrics)."""

    def step(state: TrainState, clips, labels, rng):
        train_mode = not only_train_fc  # linear probe pins BN to eval
        if axis_name is not None:
            # independent dropout masks per replica (matches the
            # reference's per-GPU RNG streams)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

        def loss_fn(params):
            B = clips.shape[0]
            x = clips
            if n_crop > 1:
                T = clips.shape[1] // n_crop
                x = clips.reshape((B * n_crop, T) + clips.shape[2:])
            variables = {"params": params, "batch_stats": state.batch_stats}
            if train_mode:
                out, mut = model.apply(
                    variables, x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                new_stats = mut["batch_stats"]
            else:
                out = model.apply(variables, x, train=False)
                new_stats = state.batch_stats
            if n_crop > 1:
                out = out.reshape(B, n_crop, -1).mean(axis=1)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                out, labels).mean()
            return loss, (out, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if only_train_fc:
            mask_tree = fc_only_mask(state.params)
            grads = jax.tree_util.tree_map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, mask_tree)

        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        if only_train_fc:
            # mask UPDATES too: add_decayed_weights would otherwise shrink
            # the frozen backbone every step (the reference freezes via
            # requires_grad=False so torch.SGD skips those params entirely)
            updates = jax.tree_util.tree_map(
                lambda u, m: u if m else jnp.zeros_like(u), updates,
                mask_tree)
        params = optax.apply_updates(state.params, updates)

        accs = accuracy(logits, labels, topk=(1, 5))  # k clamped at C inside
        metrics = {"loss": loss, "acc1": accs[0], "acc5": accs[1]}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        return TrainState(params, new_stats, opt_state,
                          state.step + 1), metrics

    return step


def make_classifier_eval_step(model, *, n_crop: int = 1,
                              axis_name: Optional[str] = "data",
                              return_logits: bool = False) -> Callable:
    """eval(state, clips, labels, mask) -> metrics dict with masked sums.

    Returns SUMS (loss_sum, correct1, correct5, count) so the host can
    aggregate exactly over padded validation tails (replaces the reference's
    num_valid_samples cutting, finetune.py:113-119). return_logits adds the
    all-gathered [B_global, C] logits — skip it in production validation to
    keep the eval step free of interconnect traffic.
    """

    def step(state: TrainState, clips, labels, mask):
        B = clips.shape[0]
        x = clips
        if n_crop > 1:
            T = clips.shape[1] // n_crop
            x = clips.reshape((B * n_crop, T) + clips.shape[2:])
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False)
        if n_crop > 1:
            out = out.reshape(B, n_crop, -1).mean(axis=1)

        per_sample = optax.softmax_cross_entropy_with_integer_labels(
            out, labels)
        maskf = mask.astype(jnp.float32)
        loss_sum = jnp.sum(per_sample * maskf)

        maxk = min(5, out.shape[-1])
        _, pred = jax.lax.top_k(out, maxk)
        correct = (pred == labels[:, None]) & mask[:, None]
        correct1 = jnp.sum(correct[:, :1].astype(jnp.float32))
        correct5 = jnp.sum(correct[:, :maxk].astype(jnp.float32))
        count = jnp.sum(maskf)

        sums = {"loss_sum": loss_sum, "correct1": correct1,
                "correct5": correct5, "count": count}
        if axis_name is not None:
            for k in ("loss_sum", "correct1", "correct5", "count"):
                sums[k] = jax.lax.psum(sums[k], axis_name)
        if return_logits:
            sums["logits"] = (jax.lax.all_gather(out, axis_name, axis=0,
                                                 tiled=True)
                              if axis_name is not None else out)
        return sums

    return step


def shard_classifier_step(step_fn, mesh, axis_name: str = "data",
                          is_eval: bool = False, donate: bool = True):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if is_eval:
        sharded = shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
            out_specs=P(),
            check_vma=False)
        return jax.jit(sharded)
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
