"""2-D data x model MoCo (K-sharded negative queue) vs the 1-D step.

The 2-D step reformulates the contrastive softmax as a distributed
psum-logsumexp over queue shards and the accuracies as psum'd rank counts
(moco/sharded_queue.py). Same global batch, same per-shard RNG folds, so a
2x4 mesh must reproduce the 8-device 1-D step's training math exactly.

The equality runs in float64: in f32 the two layouts' different reduction
orders drift up to ~1e-4 on single params after two SGD steps through
batch-2 BN backward (the same amplification that motivated the float64
step-parity oracle, tests/test_step_parity.py) — a tolerance-flaky pin.
In x64 the layouts agree to ~1e-10 and the test pins semantics, not noise.

Reference math under test: MoCoDiffLossTwoFc
(/root/reference/moco/builder_diffspeed_diffloss.py:286-546).
"""
import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper, init_moco_state,
                             make_sharded_eval_step,
                             make_sharded_eval_step_2d,
                             make_sharded_train_step,
                             make_sharded_train_step_2d, queue_update_sharded,
                             shard_moco_state_2d)
from rspnet_tpu.models import get_model_class
from rspnet_tpu.parallel import create_mesh, create_mesh_2d, shard_batch

KEY = jax.random.PRNGKey(0)


@contextlib.contextmanager
def enable_x64():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)


def _model(axis_name):
    return MultiTaskWrapper(
        encoder_factory=get_model_class("resnet10"),
        num_classes=8, finetune=False, fc_type="linear",
        axis_name=axis_name)


def _setup(b_global=16, k=64, dtype=jnp.float32, **cfg_kw):
    cfg = MoCoConfig(dim=8, k=k, m=0.99, t=0.07, diff_speed=(2,), **cfg_kw)
    opt = optax.sgd(0.1, momentum=0.9)
    state = init_moco_state(_model(None), cfg, opt, KEY, (2, 16, 32, 32, 3))
    state = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, state)
    im_q = jax.random.normal(KEY, (b_global, 32, 32, 32, 3), dtype)
    im_k = im_q + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                           (b_global, 32, 32, 32, 3), dtype)
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


def _run_1d(cfg, opt, state0, im_q, im_k):
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh1 = create_mesh(8)
    step1 = make_sharded_train_step(
        _model("data"), opt, cfg, mesh1, donate=False)
    with mesh1:
        s1 = jax.device_put(state0, NamedSharding(mesh1, P()))
        q1, k1 = shard_batch(im_q, mesh1), shard_batch(im_k, mesh1)
        s1, met_a = step1(s1, q1, k1, KEY)
        s1, met_b = step1(s1, q1, k1, jax.random.PRNGKey(3))
    return s1, met_a, met_b, mesh1


def _run_2d(cfg, opt, state0, im_q, im_k, d, m):
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh2 = create_mesh_2d(d, m)
    step2 = make_sharded_train_step_2d(
        _model(("data", "model")), opt, cfg, mesh2, donate=False)
    with mesh2:
        s2 = shard_moco_state_2d(state0, mesh2)
        bspec = NamedSharding(mesh2, P(("data", "model")))
        q2, k2 = jax.device_put(im_q, bspec), jax.device_put(im_k, bspec)
        s2, met_a = step2(s2, q2, k2, KEY)
        s2, met_b = step2(s2, q2, k2, jax.random.PRNGKey(3))
    return s2, met_a, met_b, mesh2


# fused=False pins the SHARED step body's sequential-key-pass branch —
# mesh-shape independent, so one mesh suffices (each combo costs ~5 min
# of x64 full-step compiles on the CPU mesh; the full fused x mesh
# product tripled the suite's wall time for no extra coverage).
@pytest.mark.parametrize("dm,fused",
                         [((2, 4), True), ((4, 2), True), ((2, 4), False)])
def test_2d_matches_1d_step(dm, fused):
    """Two full steps (the second enqueues into a DIFFERENT queue shard):
    params, queue contents, pointer, and every metric must match the 1-D
    data-parallel step on the same global batch — in float64, at 1e-8.

    fused=False also pins the reference's sequential-key-pass parity mode
    through the SHARED step body (round 3's hand-forked 2-D step silently
    lacked it)."""
    d, m = dm
    with enable_x64():
        cfg, opt, state0, im_q, im_k = _setup(
            b_global=16, k=64, dtype=jnp.float64, fused_key_pass=fused)
        s1, met1_a, met1_b, _ = _run_1d(cfg, opt, state0, im_q, im_k)
        s2, met2_a, met2_b, _ = _run_2d(cfg, opt, state0, im_q, im_k, d, m)

        assert int(s1.queue_ptr) == int(s2.queue_ptr) == 32
        np.testing.assert_allclose(np.asarray(s1.queue),
                                   np.asarray(s2.queue),
                                   rtol=1e-8, atol=1e-8)
        for a, b in zip(jax.tree_util.tree_leaves(s1.params_q),
                        jax.tree_util.tree_leaves(s2.params_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-8)
        # BN running stats also psum over the full mesh in both layouts
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats_q),
                        jax.tree_util.tree_leaves(s2.batch_stats_q)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-8)
        for m1, m2 in ((met1_a, met2_a), (met1_b, met2_b)):
            assert set(m1) == set(m2)
            for key in m1:
                np.testing.assert_allclose(
                    float(m1[key]), float(m2[key]), atol=1e-8, rtol=1e-8,
                    err_msg=f"metric {key}")


def test_2d_eval_matches_1d_eval():
    """The distributed no-grad statistics step (--validate on a 2-D mesh)
    reports the same metrics as the 1-D eval step, in float64 at 1e-8."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    with enable_x64():
        cfg, opt, state0, im_q, im_k = _setup(b_global=16, k=64,
                                              dtype=jnp.float64)
        mesh1 = create_mesh(8)
        ev1 = make_sharded_eval_step(_model("data"), cfg, mesh1)
        with mesh1:
            s1 = jax.device_put(state0, NamedSharding(mesh1, P()))
            met1 = ev1(s1, shard_batch(im_q, mesh1),
                       shard_batch(im_k, mesh1), KEY)

        mesh2 = create_mesh_2d(4, 2)
        ev2 = make_sharded_eval_step_2d(_model(("data", "model")), cfg,
                                        mesh2)
        with mesh2:
            s2 = shard_moco_state_2d(state0, mesh2)
            bspec = NamedSharding(mesh2, P(("data", "model")))
            met2 = ev2(s2, jax.device_put(im_q, bspec),
                       jax.device_put(im_k, bspec), KEY)

        assert set(met1) == set(met2)
        for key in met1:
            np.testing.assert_allclose(float(met1[key]), float(met2[key]),
                                       atol=1e-8, rtol=1e-8,
                                       err_msg=f"metric {key}")
        # eval mutates nothing: the sharded state is bit-identical
        for a, b in zip(jax.tree_util.tree_leaves(state0.params_q),
                        jax.tree_util.tree_leaves(s2.params_q)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
