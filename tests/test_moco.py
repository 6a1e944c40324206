"""MoCo layer tests: queue/EMA/diff-speed as pure state transitions, the
wrapper heads, and the full sharded train step on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rspnet_tpu.config.tree import ConfigTree
from rspnet_tpu.models import get_model_class
from rspnet_tpu.moco import (MoCoConfig, MultiTaskWrapper, build_moco_model,
                             diff_speed_gather, init_moco_state,
                             make_sharded_train_step, make_train_step,
                             moco_loss, momentum_update, queue_update,
                             speed_index_sets)
from rspnet_tpu.parallel import create_mesh, shard_batch

KEY = jax.random.PRNGKey(0)


def small_model(fc_type="linear", finetune=False, axis_name=None):
    return MultiTaskWrapper(
        encoder_factory=get_model_class("resnet10"),
        num_classes=8 if not finetune else 5,
        finetune=finetune, fc_type=fc_type, axis_name=axis_name)


# -- pure state transitions ---------------------------------------------------

def test_momentum_update():
    q = {"w": jnp.ones((3,))}
    k = {"w": jnp.zeros((3,))}
    out = momentum_update(q, k, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3),
                               atol=1e-7)


def test_queue_update_ring():
    queue = jnp.zeros((4, 8))
    ptr = jnp.asarray(0, jnp.int32)
    keys1 = jnp.ones((4, 4))
    queue, ptr = queue_update(queue, ptr, keys1)
    assert int(ptr) == 4
    np.testing.assert_array_equal(np.asarray(queue[:, :4]), np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(queue[:, 4:]), np.zeros((4, 4)))
    queue, ptr = queue_update(queue, ptr, 2 * jnp.ones((4, 4)))
    assert int(ptr) == 0  # wrapped
    np.testing.assert_array_equal(np.asarray(queue[:, 4:]), 2 * np.ones((4, 4)))


def test_queue_update_rejects_nondivisible_batch():
    """XLA clamps (not wraps) dynamic_update_slice starts, so K % batch
    != 0 would silently corrupt the ring buffer — must raise instead."""
    queue = jnp.zeros((4, 10))
    ptr = jnp.asarray(0, jnp.int32)
    with pytest.raises(ValueError, match="divisible"):
        queue_update(queue, ptr, jnp.ones((4, 4)))


def test_packed_frames_requires_t_load():
    from rspnet_tpu.moco.builder import diff_speed_gather
    cfg = MoCoConfig(dim=8, k=16, m=0.999, t=0.07, diff_speed=(2,),
                     packed_frames=True)   # t_load left at None
    x = jnp.zeros((2, 24, 4, 4, 3))
    with pytest.raises(ValueError, match="t_load"):
        diff_speed_gather(x, x, jax.random.PRNGKey(0), cfg)


def test_speed_index_sets():
    table = np.asarray(speed_index_sets(32, (2,)))
    np.testing.assert_array_equal(table, [np.arange(0, 32, 2)])
    table = np.asarray(speed_index_sets(64, (4, 2, 1)))
    assert table.shape == (3, 16)
    np.testing.assert_array_equal(table[0], np.arange(0, 64, 4))
    np.testing.assert_array_equal(table[1], np.arange(0, 32, 2))
    np.testing.assert_array_equal(table[2], np.arange(16))


def test_diff_speed_gather_semantics():
    """Query and its positive key play the same speed; the negative key the
    opposite (reference builder:436-443)."""
    cfg = MoCoConfig(diff_speed=(2,))
    B, T = 4, 32
    # encode the frame index in the pixel value
    base = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None, None, None],
                            (B, T, 2, 2, 1))
    im_q = base
    im_k = base + 1000.0  # distinguish k from q
    q, k, k_neg = diff_speed_gather(im_q, im_k, KEY, cfg)
    assert q.shape == (B, 16, 2, 2, 1)

    for b in range(B):
        q_idx = np.asarray(q[b, :, 0, 0, 0]).astype(int)
        k_idx = (np.asarray(k[b, :, 0, 0, 0]) - 1000).astype(int)
        kn_idx = (np.asarray(k_neg[b, :, 0, 0, 0]) - 1000).astype(int)
        np.testing.assert_array_equal(q_idx, k_idx)  # same speed q/k
        normal = np.arange(16)
        fast = np.arange(0, 32, 2)
        if (q_idx == normal).all():
            np.testing.assert_array_equal(kn_idx, fast)
        else:
            np.testing.assert_array_equal(q_idx, fast)
            np.testing.assert_array_equal(kn_idx, normal)


def test_diff_speed_split_is_half():
    cfg = MoCoConfig(diff_speed=(2,))
    B, T = 8, 32
    base = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None, :, None, None, None],
                            (B, T, 1, 1, 1))
    q, _, _ = diff_speed_gather(base, base, KEY, cfg)
    # exactly half the batch runs fast (stride 2 -> second frame == 2)
    n_fast = int(np.sum(np.asarray(q[:, 1, 0, 0, 0]) == 2.0))
    assert n_fast == B // 2


def test_moco_loss_values():
    cfg = MoCoConfig(loss_lambda_a=1.0, loss_lambda_m=1.0, margin=2.0)
    logits = jnp.array([[5.0, 0.0, 0.0]])
    l_pos = jnp.array([[3.0]])
    l_neg = jnp.array([[0.0]])
    loss, loss_a, loss_m = moco_loss(logits, logits, l_pos, l_neg, cfg)
    # ranking margin satisfied (3 - 0 > 2) -> 0; CE small but positive
    assert float(loss_m) == pytest.approx(0.0)
    assert float(loss_a) > 0
    # unsatisfied margin
    _, _, lm = moco_loss(logits, logits, jnp.array([[0.5]]), l_neg, cfg)
    assert float(lm) == pytest.approx(1.5)


# -- wrapper ------------------------------------------------------------------

@pytest.mark.parametrize("fc_type", ["linear", "mlp", "conv", "convbn"])
def test_wrapper_heads_normalized(fc_type):
    m = small_model(fc_type)
    x = jnp.ones((2, 8, 32, 32, 3))
    variables = m.init({"params": KEY}, x, train=False)
    a, s = m.apply(variables, x, train=False)
    assert a.shape == (2, 8) and s.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s), axis=1), 1.0,
                               atol=1e-5)


def test_wrapper_speednet_head():
    m = small_model("speednet")
    x = jnp.ones((2, 8, 32, 32, 3))
    variables = m.init({"params": KEY}, x, train=False)
    a, s = m.apply(variables, x, train=False)
    assert s.shape == (2, 1)
    assert np.all((np.asarray(s) > 0) & (np.asarray(s) < 1))  # sigmoid


def test_wrapper_finetune_mode():
    m = small_model(finetune=True)
    x = jnp.ones((2, 8, 32, 32, 3))
    variables = m.init({"params": KEY}, x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 5)


def test_build_moco_model_from_config():
    cfg = ConfigTree.from_dict({
        "model": {"arch": "resnet18"},
        "moco": {"dim": 128, "k": 1024, "m": 0.999, "t": 0.07,
                 "diff_speed": [2], "fc_type": "linear"},
        "loss_lambda": {"A": 1.0, "M": 1.0},
    })
    model, mcfg = build_moco_model(cfg, axis_name=None)
    assert mcfg.k == 1024 and mcfg.diff_speed == (2,)
    assert model.fc_type == "linear"


# -- full step on the 8-device mesh -------------------------------------------

def _setup_step(axis_name="data", mesh=None, b_global=8):
    cfg = MoCoConfig(dim=8, k=32, m=0.99, t=0.07, diff_speed=(2,))
    model = small_model(axis_name=axis_name)
    opt = optax.sgd(0.1, momentum=0.9)
    state = init_moco_state(model, cfg, opt, KEY, (2, 16, 32, 32, 3))
    im_q = jax.random.normal(KEY, (b_global, 32, 32, 32, 3))
    im_k = im_q + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                           (b_global, 32, 32, 32, 3))
    return cfg, model, opt, state, im_q, im_k


def test_single_replica_train_step():
    cfg, model, opt, state, im_q, im_k = _setup_step(axis_name=None,
                                                     b_global=4)
    step = jax.jit(make_train_step(model, opt, cfg, axis_name=None))
    state2, metrics = step(state, im_q, im_k, KEY)
    assert int(state2.step) == 1
    assert int(state2.queue_ptr) == 4
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params_q, state2.params_q)
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # EMA: k == q at init is a fixed point; after q moves (step 1), step 2's
    # EMA must move params_k toward the new q
    state3, _ = step(state2, im_q, im_k, jax.random.PRNGKey(7))
    kdiff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state2.params_k, state3.params_k)
    assert max(jax.tree_util.tree_leaves(kdiff)) > 0


def test_sharded_train_step_8_devices():
    """Full fused step over the virtual 8-chip mesh: grads psum'd, queue
    gets the *global* batch, metrics replicated."""
    mesh = create_mesh(8)
    cfg, model, opt, state, im_q, im_k = _setup_step(axis_name="data",
                                                     b_global=16)
    step = make_sharded_train_step(model, opt, cfg, mesh, axis_name="data")
    with mesh:
        state_r = jax.device_put(state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))
        im_q_s = shard_batch(im_q, mesh)
        im_k_s = shard_batch(im_k, mesh)
        state2, metrics = step(state_r, im_q_s, im_k_s, KEY)
        # queue advanced by the GLOBAL batch (16), not the local shard (2)
        assert int(state2.queue_ptr) == 16
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["acc1_M"]) >= 0.0
        # second step wraps the 32-deep queue
        state3, _ = step(state2, im_q_s, im_k_s, jax.random.PRNGKey(3))
        assert int(state3.queue_ptr) == 0
        assert int(state3.step) == 2


def test_sharded_matches_single_replica_loss():
    """Same global batch, 1 vs 8 replicas: losses must agree closely.

    BN statistics are cross-replica (psum), so the compiled math is
    identical up to reduction order.
    """
    mesh = create_mesh(8)
    cfg, model8, opt, state8, im_q, im_k = _setup_step(axis_name="data",
                                                       b_global=16)
    model1 = small_model(axis_name=None)
    state1 = init_moco_state(model1, cfg, opt, KEY, (2, 16, 32, 32, 3))

    # identical params for both runs
    state1 = state1._replace(params_q=state8.params_q,
                             params_k=state8.params_k,
                             batch_stats_q=state8.batch_stats_q,
                             batch_stats_k=state8.batch_stats_k,
                             queue=state8.queue)

    # donate=False: state arrays are shared with the single-replica run below
    step8 = make_sharded_train_step(model8, opt, cfg, mesh, donate=False)
    # single-replica reference: same per-sample speed assignment is not
    # guaranteed (rng folds in axis index), so compare only coarse stats
    with mesh:
        _, m8 = step8(jax.device_put(state8, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
            shard_batch(im_q, mesh), shard_batch(im_k, mesh), KEY)
    step1 = jax.jit(make_train_step(model1, opt, cfg, axis_name=None))
    _, m1 = step1(state1, im_q, im_k, KEY)
    # both runs see the same data; losses should be the same scale
    assert abs(float(m8["loss"]) - float(m1["loss"])) < 1.0


def test_diff_speed_multi_choice():
    """Multi-speed configs ([4,2,1]) must compile with static shapes and
    keep the same-speed/opposite-speed pairing per sample."""
    cfg = MoCoConfig(diff_speed=(4, 2, 1))
    B, T = 4, 64
    base = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :, None, None, None],
        (B, T, 1, 1, 1))
    q, k, k_neg = diff_speed_gather(base, base + 1000.0, KEY, cfg)
    assert q.shape == (B, 16, 1, 1, 1)  # T // max(diff_speed)
    for b in range(B):
        q_idx = np.asarray(q[b, :, 0, 0, 0]).astype(int)
        k_idx = (np.asarray(k[b, :, 0, 0, 0]) - 1000).astype(int)
        np.testing.assert_array_equal(q_idx, k_idx)


def test_diff_speed_empty_raises():
    from rspnet_tpu.moco.builder import real_clip_len
    with pytest.raises(ValueError, match="non-empty"):
        real_clip_len(32, ())
