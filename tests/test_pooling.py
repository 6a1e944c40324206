"""Separable max pool == reduce_window max pool, values and gradients.

The separable decomposition (models/common.py:_max_pool3d_separable)
replaces flax's reduce_window lowering on the hot path because the
reduce_window-max VJP (select_and_gather_add) lowers poorly on TPU;
this pins exact equivalence for every pool geometry the model zoo uses.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspnet_tpu.models.common import (_make_max_pool3d_fm,
                                      _make_max_pool3d_hybrid,
                                      _max_pool3d_reshape,
                                      _max_pool3d_separable,
                                      _max_pool3d_separable_rw, _pad3,
                                      _triple, max_pool3d)

_fm = _make_max_pool3d_fm()
_hybrid = _make_max_pool3d_hybrid()

# (input [T,H,W,C], kernel, stride, pad) — every geometry used by the zoo
CASES = [
    ((8, 56, 56, 4), (1, 3, 3), (1, 2, 2), (0, 1, 1)),   # s3dg stem
    ((8, 14, 14, 6), (3, 3, 3), (1, 1, 1), (1, 1, 1)),   # inception branch3
    ((8, 14, 14, 6), (3, 3, 3), (2, 2, 2), (1, 1, 1)),   # s3dg pool3
    ((4, 8, 8, 6), (2, 2, 2), (2, 2, 2), (0, 0, 0)),     # s3dg pool4
    ((16, 16, 16, 3), (1, 2, 2), (1, 2, 2), (0, 0, 0)),  # c3d pool1
    ((16, 16, 16, 3), (2, 2, 2), (2, 2, 2), (0, 0, 0)),  # c3d pool2-5
    ((8, 15, 15, 5), (3, 3, 3), (2, 2, 2), (1, 1, 1)),   # odd size, floor
    ((5, 9, 9, 2), (3, 3, 3), (3, 3, 3), (0, 0, 0)),     # window == stride
]


def _ref_pool(x, k, s, p):
    return nn.max_pool(x, window_shape=_triple(k), strides=_triple(s),
                       padding=_pad3(p))


@pytest.mark.parametrize("ishape,k,s,p", CASES)
def test_forward_equivalence(ishape, k, s, p):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *ishape), jnp.float32)
    ref = _ref_pool(x, k, s, p)
    for impl in (_max_pool3d_separable, _max_pool3d_separable_rw, _fm,
                 _hybrid):
        sep = impl(x, _triple(k), _triple(s), _triple(p))
        assert ref.shape == sep.shape
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(sep))
    if _triple(k) == _triple(s) and _triple(p) == (0, 0, 0):
        rs = _max_pool3d_reshape(x, _triple(k))
        assert ref.shape == rs.shape
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(rs))


@pytest.mark.parametrize("ishape,k,s,p", CASES)
def test_gradient_equivalence(ishape, k, s, p):
    # distinct values everywhere so the argmax (hence the gradient
    # routing) is unambiguous
    rng = np.random.RandomState(1)
    n = int(np.prod((2, *ishape)))
    x = jnp.asarray(rng.permutation(n).reshape((2, *ishape)), jnp.float32)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, k, s, p)))(x)
    for impl in (_max_pool3d_separable, _max_pool3d_separable_rw, _fm,
                 _hybrid):
        g_sep = jax.grad(lambda x: jnp.sum(
            impl(x, _triple(k), _triple(s), _triple(p))))(x)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_sep))
    if _triple(k) == _triple(s) and _triple(p) == (0, 0, 0):
        g_rs = jax.grad(lambda x: jnp.sum(
            _max_pool3d_reshape(x, _triple(k))))(x)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_rs))


def _pallas_supported_cases():
    """Pallas kernels are stride-1 only (Mosaic strided ref ops are
    32-bit / 128-lane — see ops/pallas_pool.py); strided pools fall
    back to rw-sep."""
    return [c for c in CASES if all(s == 1 for s in _triple(c[2]))]


@pytest.mark.parametrize("ishape,k,s,p", _pallas_supported_cases())
def test_pallas_forward_equivalence(ishape, k, s, p):
    from rspnet_tpu.ops.pallas_pool import (max_pool3d_pallas,
                                            pallas_pool_supported)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, *ishape), jnp.float32)
    kt, st, pt = _triple(k), _triple(s), _triple(p)
    assert pallas_pool_supported(x.shape, kt, st, pt, x.dtype)
    ref = _ref_pool(x, k, s, p)
    out = max_pool3d_pallas(x, kt, st, pt, True)   # interpret mode on CPU
    assert ref.shape == out.shape
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_pallas_strided_unsupported():
    from rspnet_tpu.ops.pallas_pool import pallas_pool_supported
    assert not pallas_pool_supported((2, 8, 56, 56, 4), (1, 3, 3),
                                     (1, 2, 2), (0, 1, 1), jnp.float32)


@pytest.mark.parametrize("ishape,k,s,p", _pallas_supported_cases())
def test_pallas_gradient_equivalence(ishape, k, s, p):
    from rspnet_tpu.ops.pallas_pool import max_pool3d_pallas
    rng = np.random.RandomState(1)
    n = int(np.prod((2, *ishape)))
    x = jnp.asarray(rng.permutation(n).reshape((2, *ishape)), jnp.float32)
    kt, st, pt = _triple(k), _triple(s), _triple(p)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, k, s, p)))(x)
    g_pal = jax.grad(lambda x: jnp.sum(
        max_pool3d_pallas(x, kt, st, pt, True)))(x)
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_pal))


def test_pallas_tie_routing_first_match_conserves_gradient():
    """On exact ties the pallas bwd routes the whole cotangent to the
    FIRST matching window offset (torch-like); gradient sum conserved."""
    from rspnet_tpu.ops.pallas_pool import max_pool3d_pallas
    x = jnp.zeros((1, 1, 1, 4, 1), jnp.float32)     # all tied
    kt, st, pt = (1, 1, 2), (1, 1, 2), (0, 0, 0)
    g = jax.grad(lambda x: jnp.sum(
        max_pool3d_pallas(x, kt, st, pt, True)))(x)
    flat = np.asarray(g).ravel()
    np.testing.assert_array_equal(flat, [1.0, 0.0, 1.0, 0.0])


def test_fm_tie_routing_first_match_conserves_gradient():
    """On exact ties the fm bwd routes the whole cotangent to the FIRST
    matching window offset (torch-like); gradient sum conserved."""
    x = jnp.zeros((1, 1, 1, 4, 1), jnp.float32)     # all tied
    g = jax.grad(lambda x: jnp.sum(
        _fm(x, (1, 1, 2), (1, 1, 2), (0, 0, 0))))(x)
    flat = np.asarray(g).ravel()
    np.testing.assert_array_equal(flat, [1.0, 0.0, 1.0, 0.0])


def test_fm_overlapping_tie_gradient_sum():
    """Overlapping stride-1 windows on tied values: each output window
    routes its unit cotangent to one input; total gradient sum == number
    of output positions."""
    x = jnp.zeros((1, 1, 1, 6, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(
        _fm(x, (1, 1, 3), (1, 1, 1), (0, 0, 1))))(x)
    assert float(np.asarray(g).sum()) == 6.0


def test_public_entry_uses_separable(monkeypatch):
    monkeypatch.delenv("RSPNET_POOL", raising=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 3),
                          jnp.float32)
    out = max_pool3d(x, 3, 2, 1)
    ref = _ref_pool(x, 3, 2, 1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    monkeypatch.setenv("RSPNET_POOL", "xla")
    out2 = max_pool3d(x, 3, 2, 1)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))


def test_default_dispatch_reshape_fast_path(monkeypatch):
    """stride==window, no-pad pools (s3dg pool4, c3d pools): the
    reshape+max path (opt-in RSPNET_POOL=rw-sep-reshape; measured a wash
    on-chip vs the rw-sep default, 2026-08-18) and every other dispatch
    stay bit-equal to the XLA pool (fwd and grad on unique values)."""
    rng = np.random.RandomState(2)
    shape = (1, 4, 8, 8, 3)
    x = jnp.asarray(rng.permutation(int(np.prod(shape))).reshape(shape),
                    jnp.float32)
    ref = _ref_pool(x, 2, 2, 0)
    g_ref = jax.grad(lambda v: jnp.sum(_ref_pool(v, 2, 2, 0)))(x)
    for env in (None, "rw-sep-pure", "rw-sep-reshape", "hybrid"):
        if env is None:
            monkeypatch.delenv("RSPNET_POOL", raising=False)
        else:
            monkeypatch.setenv("RSPNET_POOL", env)
        out = max_pool3d(x, 2, 2, 0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        g = jax.grad(lambda v: jnp.sum(max_pool3d(v, 2, 2, 0)))(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))


def test_hybrid_dispatch_on_windowed_pool(monkeypatch):
    monkeypatch.setenv("RSPNET_POOL", "hybrid")
    rng = np.random.RandomState(3)
    shape = (1, 4, 9, 9, 2)
    x = jnp.asarray(rng.permutation(int(np.prod(shape))).reshape(shape),
                    jnp.float32)
    ref = _ref_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    out = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    g_ref = jax.grad(lambda v: jnp.sum(
        _ref_pool(v, (1, 3, 3), (1, 2, 2), (0, 1, 1))))(x)
    g = jax.grad(lambda v: jnp.sum(
        max_pool3d(v, (1, 3, 3), (1, 2, 2), (0, 1, 1))))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
