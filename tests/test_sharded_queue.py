"""2-D data x model MoCo (K-sharded negative queue) vs the 1-D step.

The 2-D step reformulates the contrastive softmax as a distributed
psum-logsumexp over queue shards and the accuracies as psum'd rank counts
(moco/sharded_queue.py). Same global batch, same per-shard RNG folds, so a
2x4 mesh must reproduce the 8-device 1-D step's training math exactly (up
to f32 reduction order).

Reference math under test: MoCoDiffLossTwoFc
(/root/reference/moco/builder_diffspeed_diffloss.py:286-546).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper, init_moco_state,
                             make_sharded_train_step,
                             make_sharded_train_step_2d, queue_update_sharded,
                             shard_moco_state_2d)
from rspnet_tpu.models import get_model_class
from rspnet_tpu.parallel import create_mesh, create_mesh_2d, shard_batch

KEY = jax.random.PRNGKey(0)


def _model(axis_name):
    return MultiTaskWrapper(
        encoder_factory=get_model_class("resnet10"),
        num_classes=8, finetune=False, fc_type="linear",
        axis_name=axis_name)


def _setup(b_global=16, k=64):
    cfg = MoCoConfig(dim=8, k=k, m=0.99, t=0.07, diff_speed=(2,))
    opt = optax.sgd(0.1, momentum=0.9)
    state = init_moco_state(_model(None), cfg, opt, KEY, (2, 16, 32, 32, 3))
    im_q = jax.random.normal(KEY, (b_global, 32, 32, 32, 3))
    im_k = im_q + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                           (b_global, 32, 32, 32, 3))
    return cfg, opt, state, im_q, im_k


def test_queue_update_sharded_guard():
    """K/M not divisible by the global batch must fail at trace time
    (an enqueue straddling shards would need a cross-device write)."""
    mesh = create_mesh_2d(2, 4)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def body(shard, ptr, keys):
        return queue_update_sharded(shard, ptr, keys, "model")

    queue = jnp.zeros((4, 24))            # 6 per shard, batch 4: 6 % 4 != 0
    ptr = jnp.zeros((), jnp.int32)
    keys = jnp.ones((4, 4))
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(None, "model"), P(), P()),
                  out_specs=(P(None, "model"), P()), check_vma=False)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(f)(queue, ptr, keys)


@pytest.mark.parametrize("dm", [(2, 4), (4, 2)])
def test_2d_matches_1d_step(dm):
    """Two full steps (the second enqueues into a DIFFERENT queue shard):
    params, queue contents, pointer, and every metric must match the 1-D
    data-parallel step on the same global batch."""
    d, m = dm
    cfg, opt, state0, im_q, im_k = _setup(b_global=16, k=64)

    # -- 1-D reference run ---------------------------------------------------
    mesh1 = create_mesh(8)
    step1 = make_sharded_train_step(
        _model("data"), opt, cfg, mesh1, donate=False)
    from jax.sharding import NamedSharding, PartitionSpec as P
    with mesh1:
        s1 = jax.device_put(state0, NamedSharding(mesh1, P()))
        q1, k1 = shard_batch(im_q, mesh1), shard_batch(im_k, mesh1)
        s1, met1_a = step1(s1, q1, k1, KEY)
        s1, met1_b = step1(s1, q1, k1, jax.random.PRNGKey(3))

    # -- 2-D run (batch over both axes, queue K-sharded) ---------------------
    mesh2 = create_mesh_2d(d, m)
    step2 = make_sharded_train_step_2d(
        _model(("data", "model")), opt, cfg, mesh2, donate=False)
    with mesh2:
        s2 = shard_moco_state_2d(state0, mesh2)
        bspec = NamedSharding(mesh2, P(("data", "model")))
        q2, k2 = jax.device_put(im_q, bspec), jax.device_put(im_k, bspec)
        s2, met2_a = step2(s2, q2, k2, KEY)
        s2, met2_b = step2(s2, q2, k2, jax.random.PRNGKey(3))

    assert int(s1.queue_ptr) == int(s2.queue_ptr) == 32
    # strong invariants first: training state must match tightly
    np.testing.assert_allclose(np.asarray(s1.queue), np.asarray(s2.queue),
                               rtol=1e-4, atol=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params_q)
    flat2 = jax.tree_util.tree_leaves(s2.params_q)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # BN running stats also psum over the full mesh in both layouts
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats_q),
                    jax.tree_util.tree_leaves(s2.batch_stats_q)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # measured agreement is ~1e-6 (see the loss-scaling note in
    # sharded_queue.py — an M x CE gradient overcount showed up here as
    # 0.3-level queue divergence before the /n_model fix)
    for m1, m2 in ((met1_a, met2_a), (met1_b, met2_b)):
        assert set(m1) == set(m2)
        for key in m1:
            np.testing.assert_allclose(
                float(m1[key]), float(m2[key]), atol=1e-3, rtol=1e-4,
                err_msg=f"metric {key}")
