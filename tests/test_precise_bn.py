"""Precise-BN recalibration (engines/precise_bn.py).

Pins: (1) the two-pass momentum recovery is exact — recalibrated stats equal
the average of each layer's TRUE per-batch statistics (mean of means, mean of
unbiased vars, fvcore semantics per reference slowfast defaults.py:26-30) —
including through multiple layers with DIFFERENT momenta (0.999/0.9/0.99) and
SubBatchNorm's (k, c) per-split leaves; (2) the finetune engine's
``bn_recalibrate`` config key runs the pass deterministically (the s3dg
linear-probe divergence fix, round-4 session notes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from rspnet_tpu.engines.precise_bn import recalibrate_batch_stats
from rspnet_tpu.models.common import BatchNorm, SubBatchNorm
from rspnet_tpu.parallel import create_mesh, shard_batch


class TwoBN(nn.Module):
    """Cross-replica BN layers with different momenta + a per-replica
    SubBatchNorm tail (the two norm families used across the zoo)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(momentum=0.999, axis_name="data", name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = BatchNorm(momentum=0.9, axis_name="data", name="bn2")(
            x, use_running_average=not train)
        x = SubBatchNorm(num_splits=2, momentum=0.99, name="sbn")(
            x, train=train)
        return x


def _np_bn_train(x, eps=1e-5):
    """Reference train-mode BN over all-but-last axes. Returns
    (normalized, batch_mean, unbiased_var)."""
    axes = tuple(range(x.ndim - 1))
    mean = x.mean(axes)
    var = x.var(axes)  # biased, used for normalization (torch semantics)
    n = x.size // x.shape[-1]
    y = (x - mean) / np.sqrt(var + eps)
    return y, mean, var * n / (n - 1)


def test_recovery_exact_multi_layer_multi_momentum():
    mesh = create_mesh(8)
    rng = np.random.default_rng(0)
    model = TwoBN()
    # Each global batch tiles one 2-sample base 8x so every shard holds an
    # identical local batch: cross-replica layers see the true global
    # stats, and the per-replica SubBatchNorm's stats are replicated (its
    # split leaves are otherwise shard-dependent under out_specs P()).
    bases = [rng.normal(2.0, 3.0, size=(2, 2, 3, 3, 4)).astype(np.float32)
             for _ in range(3)]  # 5-D video layout (SubBatchNorm requires it)
    batches = [np.tile(b, (8, 1, 1, 1, 1)) for b in bases]

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]))
    params, stats0 = variables["params"], variables["batch_stats"]

    new = recalibrate_batch_stats(
        model, mesh, params, stats0,
        (shard_batch(jnp.asarray(b), mesh) for b in batches),
        jax.random.PRNGKey(1))
    new = jax.device_get(new)

    # expected per-batch stats, layer by layer, in numpy (global batch)
    exp = {"bn1": ([], []), "bn2": ([], []),
           "sbn": ([[], []], [[], []])}  # sbn: per split k
    for x in batches:
        y1, m1, v1 = _np_bn_train(x)
        exp["bn1"][0].append(m1), exp["bn1"][1].append(v1)
        y1 = np.maximum(y1, 0.0)
        y2, m2, v2 = _np_bn_train(y1)
        exp["bn2"][0].append(m2), exp["bn2"][1].append(v2)
        # SubBatchNorm on one shard's local 2-sample view (= the base
        # pair): split k holds local sample k alone
        local = y2[:2]
        for k in range(2):
            part = local[k::2]
            axes = tuple(range(part.ndim - 1))
            m = part.mean(axis=axes)
            v = part.var(axis=axes)
            n = part.size // part.shape[-1]
            exp["sbn"][0][k].append(m)
            exp["sbn"][1][k].append(v * n / (n - 1))

    for layer in ("bn1", "bn2"):
        np.testing.assert_allclose(
            new[layer]["mean"], np.mean(exp[layer][0], axis=0),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            new[layer]["var"], np.mean(exp[layer][1], axis=0),
            rtol=1e-4, atol=1e-5)
    for k in range(2):
        np.testing.assert_allclose(
            new["sbn"]["mean"][k], np.mean(exp["sbn"][0][k], axis=0),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            new["sbn"]["var"][k], np.mean(exp["sbn"][1][k], axis=0),
            rtol=1e-4, atol=1e-5)


def test_engine_bn_recalibrate(tmp_path):
    """bn_recalibrate through the finetune engine: the pass moves the
    stats off their (0, 1) init and is deterministic (pinned calibration
    RNG — both transfer-probe arms see identical calibration augments)."""
    from rspnet_tpu.framework import bootstrap
    from rspnet_tpu.engines.finetune import FinetuneEngine

    args, cfg = bootstrap([
        "-c", "config/finetune/ucf101_resnet18.jsonnet",
        "-e", str(tmp_path / "exp"), "-d", "--no-scale-lr",
        "-x", '{dataset: {name: "synthetic", num_samples: 128, '
        'num_classes: 4, num_frames: 16}, batch_size: 8, num_workers: 2, '
        'only_train_fc: true, bn_recalibrate: 2, '
        'temporal_transforms+: {size: 4, frame_rate: null}, '
        'spatial_transforms+: {size: 32}}'])
    engine = FinetuneEngine(args, cfg)
    try:
        before = jax.device_get(engine.state.batch_stats)
        engine.recalibrate_bn()
        after = jax.device_get(engine.state.batch_stats)
        moved = any(
            not np.allclose(b, a)
            for b, a in zip(jax.tree_util.tree_leaves(before),
                            jax.tree_util.tree_leaves(after)))
        assert moved, "recalibration left batch_stats at init"
        for leaf in jax.tree_util.tree_leaves(after):
            assert np.all(np.isfinite(leaf))
        # deterministic: a second pass reproduces the same stats and the
        # training augment stream is restored (self.rng untouched)
        engine.recalibrate_bn()
        again = jax.device_get(engine.state.batch_stats)
        for a, b in zip(jax.tree_util.tree_leaves(after),
                        jax.tree_util.tree_leaves(again)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    finally:
        engine.close()


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-v"]))
