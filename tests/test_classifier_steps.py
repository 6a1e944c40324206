"""Classifier train/eval step tests: linear-probe masking, multi-crop
averaging, masked eval sums, sharded execution."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rspnet_tpu.engines.classifier import (TrainState, fc_only_mask,
                                           init_train_state,
                                           make_classifier_eval_step,
                                           make_classifier_train_step,
                                           shard_classifier_step)
from rspnet_tpu.models import get_model_class
from rspnet_tpu.parallel import create_mesh, replicate_to_mesh, shard_batch

KEY = jax.random.PRNGKey(0)


def _model():
    return get_model_class("resnet10")(num_classes=4)


def test_fc_only_mask_structure():
    m = _model()
    variables = m.init({"params": KEY}, jnp.zeros((1, 8, 32, 32, 3)),
                       train=False)
    mask = fc_only_mask(variables["params"])
    flat = jax.tree_util.tree_leaves(mask)
    assert any(flat) and not all(flat)
    assert all(jax.tree_util.tree_leaves(mask["fc"]))
    assert not any(jax.tree_util.tree_leaves(mask["stem"]))


def test_linear_probe_only_updates_fc():
    m = _model()
    # weight decay included on purpose: add_decayed_weights must not shrink
    # the frozen backbone (code-review regression)
    opt = optax.chain(optax.add_decayed_weights(1e-2), optax.sgd(0.5))
    state = init_train_state(m, opt, KEY, (1, 8, 32, 32, 3))
    step = jax.jit(make_classifier_train_step(
        m, opt, axis_name=None, only_train_fc=True))
    x = jax.random.normal(KEY, (4, 8, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    state2, _ = step(state, x, y, KEY)
    stem_diff = float(jnp.max(jnp.abs(
        state.params["stem"]["conv"]["kernel"]
        - state2.params["stem"]["conv"]["kernel"])))
    fc_diff = float(jnp.max(jnp.abs(
        state.params["fc"]["kernel"] - state2.params["fc"]["kernel"])))
    assert stem_diff == 0.0
    assert fc_diff > 0.0
    # BN stats pinned to eval in probe mode
    bn_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.batch_stats, state2.batch_stats)
    assert max(jax.tree_util.tree_leaves(bn_diff)) == 0.0


def test_multicrop_eval_averages_logits():
    """Eval with n_crop must equal manual per-crop logit averaging."""
    m = _model()
    state = init_train_state(m, optax.identity(), KEY, (1, 4, 32, 32, 3))
    n_crop = 3
    eval_step = jax.jit(make_classifier_eval_step(m, n_crop=n_crop,
                                                  axis_name=None,
                                                  return_logits=True))
    x = jax.random.normal(KEY, (2, n_crop * 4, 32, 32, 3))
    labels = jnp.array([1, 2])
    mask = jnp.array([True, True])
    sums = eval_step(state, x, labels, mask)

    # manual: split crops, forward each, average
    crops = x.reshape(2 * n_crop, 4, 32, 32, 3)
    out = m.apply({"params": state.params,
                   "batch_stats": state.batch_stats}, crops, train=False)
    manual = np.asarray(out.reshape(2, n_crop, -1).mean(axis=1))
    np.testing.assert_allclose(np.asarray(sums["logits"]), manual, atol=1e-5)


def test_eval_mask_excludes_padding():
    m = _model()
    state = init_train_state(m, optax.identity(), KEY, (1, 4, 32, 32, 3))
    eval_step = jax.jit(make_classifier_eval_step(m, n_crop=1,
                                                  axis_name=None))
    x = jax.random.normal(KEY, (4, 4, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 3])
    full = eval_step(state, x, labels, jnp.array([True] * 4))
    half = eval_step(state, x, labels, jnp.array([True, True, False, False]))
    assert float(full["count"]) == 4.0
    assert float(half["count"]) == 2.0
    assert float(half["loss_sum"]) < float(full["loss_sum"])


def test_sharded_classifier_train_step():
    mesh = create_mesh(8)
    m = get_model_class("resnet10")(num_classes=4, axis_name="data")
    opt = optax.sgd(0.1)
    state = init_train_state(m, opt, KEY, (1, 8, 32, 32, 3))
    step = shard_classifier_step(
        make_classifier_train_step(m, opt, axis_name="data"), mesh,
        donate=False)
    x = jax.random.normal(KEY, (16, 8, 32, 32, 3))
    y = jnp.arange(16) % 4
    with mesh:
        state_r = replicate_to_mesh(state, mesh)
        state2, metrics = step(state_r, shard_batch(x, mesh),
                               shard_batch(y, mesh), KEY)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["acc1"]) <= 100.0
    assert int(state2.step) == 1
