"""Model zoo tests: shapes, modes, and exact forward parity against the
reference torch implementations via the weight bridge."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspnet_tpu.models import get_model_class
from rspnet_tpu.models.torch_bridge import flax_to_torch, torch_to_flax
from tests.conftest import REFERENCE_ROOT

KEY = jax.random.PRNGKey(0)


def _init(model, shape=(2, 16, 112, 112, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init({"params": KEY}, x, train=False)
    return variables, x


# -- shape/contract tests ------------------------------------------------------

@pytest.mark.parametrize("arch,feat_ch,feat_thw", [
    ("resnet18", 512, (1, 4, 4)),
    ("resnet34", 512, (1, 4, 4)),
    ("resnet50", 2048, (1, 4, 4)),
    ("c3d", 512, (2, 7, 7)),
    ("r2plus1d-vcop", 512, (2, 7, 7)),
])
def test_backbone_shapes(arch, feat_ch, feat_thw):
    m = get_model_class(arch)(num_classes=101)
    variables, x = _init(m)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 101)
    f = m.apply(variables, x, train=False, method="features")
    assert f.shape == (2, *feat_thw, feat_ch)
    assert m.feature_dim == feat_ch


def test_s3dg_shapes():
    m = get_model_class("s3dg")(num_classes=400)
    x = jnp.zeros((1, 16, 112, 112, 3), jnp.float32)
    variables = m.init({"params": KEY}, x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 400)
    f = m.apply(variables, x, train=False, method="features")
    # 112px input: 112 ->56(sepConv1) ->28 ->14 ->7 ->3; 224px gives 7
    assert f.shape == (1, 2, 3, 3, 1024)
    assert m.feature_dim == 1024


def test_without_classifier_returns_embedding():
    m = get_model_class("resnet18")(num_classes=101, with_classifier=False)
    variables, x = _init(m)
    y = m.apply(variables, x, train=False)
    assert y.shape == (2, 512)


def test_train_mode_updates_bn_stats():
    m = get_model_class("resnet18")(num_classes=10)
    variables, _ = _init(m)
    x = jax.random.normal(KEY, (2, 16, 112, 112, 3))
    before = variables["batch_stats"]["stem"]["bn"]["mean"]
    _, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
    after = mut["batch_stats"]["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_shortcut_type_a_parameter_free():
    mB = get_model_class("resnet18")(num_classes=10, shortcut_type="B")
    mA = get_model_class("resnet18")(num_classes=10, shortcut_type="A")
    vB, x = _init(mA)
    vA, _ = _init(mA)
    nA = sum(p.size for p in jax.tree_util.tree_leaves(vA["params"]))
    vB, _ = _init(mB)
    nB = sum(p.size for p in jax.tree_util.tree_leaves(vB["params"]))
    assert nA < nB  # type A has no downsample convs
    y = mA.apply(vA, x, train=False)
    assert y.shape == (2, 10)


def test_unknown_arch_raises():
    with pytest.raises(ValueError, match="Unknown arch"):
        get_model_class("nope")


# -- forward parity vs reference torch models --------------------------------

def _load_ref_module(name):
    path = os.path.join(REFERENCE_ROOT, "models", f"{name}.py")
    if not os.path.exists(path):
        pytest.skip("reference repo not mounted")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _torch_state_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _compare(arch, torch_model, flax_model, shape=(2, 8, 64, 64, 3),
             atol=1e-4):
    import torch
    torch_model.eval()
    sd = _torch_state_numpy(torch_model)
    params, batch_stats, _ = torch_to_flax(sd, arch)
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(0)
    x = rng.randn(*shape).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(
            np.transpose(x, (0, 4, 1, 2, 3)).copy())).numpy()
    ours = np.asarray(flax_model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-4)
    return sd, variables


def test_resnet18_forward_parity():
    ref = _load_ref_module("resnet")
    # torch model's fixed AvgPool3d kernel must match the test input size
    tm = ref.resnet18(num_classes=17, sample_size=64, sample_duration=8)
    fm = get_model_class("resnet18")(num_classes=17)
    _compare("resnet18", tm, fm)


def test_resnet50_forward_parity():
    ref = _load_ref_module("resnet")
    tm = ref.resnet50(num_classes=7, sample_size=64, sample_duration=8)
    fm = get_model_class("resnet50")(num_classes=7)
    _compare("resnet50", tm, fm)


def test_c3d_forward_parity():
    ref = _load_ref_module("c3d")
    tm = ref.C3D(num_classes=13)
    fm = get_model_class("c3d")(num_classes=13)
    _compare("c3d", tm, fm)


def test_r2plus1d_forward_parity():
    ref = _load_ref_module("r2plus1d_vcop")
    tm = ref.R2Plus1DNet((1, 1, 1, 1), with_classifier=True, num_classes=11)
    fm = get_model_class("r2plus1d-vcop")(num_classes=11)
    _compare("r2plus1d-vcop", tm, fm)


def test_s3dg_forward_parity():
    ref = _load_ref_module("s3dg")
    tm = ref.S3D_G(num_classes=9)
    fm = get_model_class("s3dg")(num_classes=9)
    _compare("s3dg", tm, fm, shape=(1, 8, 64, 64, 3))


def _load_ref_mfnet():
    """Load the reference mfnet package modules (mfnet_3d needs its sibling
    initializer importable)."""
    import sys
    pkg_dir = os.path.join(REFERENCE_ROOT, "models", "mfnet")
    if not os.path.exists(pkg_dir):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, pkg_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_mfnet_initializer", os.path.join(pkg_dir, "initializer.py"))
        initializer = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(initializer)
        spec = importlib.util.spec_from_file_location(
            "ref_mfnet_3d", os.path.join(pkg_dir, "mfnet_3d.py"))
        mfnet_3d = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mfnet_3d)
    finally:
        sys.path.remove(pkg_dir)
    return mfnet_3d, initializer


def test_mfnet_forward_parity():
    mfnet_3d, _ = _load_ref_mfnet()
    tm = mfnet_3d.MFNET_3D(num_classes=15)
    fm = get_model_class("mfnet")(num_classes=15)
    # MFNet stem downsamples T by 2 and pools (8,*) adaptively; 8 frames ok
    _compare("mfnet", tm, fm, shape=(1, 8, 64, 64, 3))


def test_mfnet_2d_inflation_matches_reference():
    """inflate_2d_state_dict reproduces the reference's
    init_3d_from_2d_dict (models/mfnet/initializer.py:54-136) on a synthetic
    2D state dict: same tensors loaded, forward outputs match."""
    import torch
    from rspnet_tpu.models.torch_bridge import inflate_2d_state_dict

    mfnet_3d, initializer = _load_ref_mfnet()
    tm = mfnet_3d.MFNET_3D(num_classes=6)
    tm.eval()

    # synthesize a "2D ImageNet" dict: 4D conv kernels + BN params with the
    # 3D names (that is the real MFNet2D layout), classifier-named head
    rng = np.random.RandomState(3)
    sd2d = {}
    for k, v in tm.state_dict().items():
        a = v.detach().numpy()
        if k.endswith("conv.weight") and a.ndim == 5:
            o, i, kt, kh, kw = a.shape
            sd2d[k] = rng.randn(o, i, kh, kw).astype(np.float32)
        elif k.startswith("fc."):
            # 2D net's head is named 'classifier' and has 1000 classes —
            # must be skipped by both implementations
            shape = (1000, a.shape[-1]) if a.ndim == 2 else (1000,)
            sd2d["classifier." + k.split(".", 1)[1]] = (
                rng.randn(*shape).astype(np.float32))
        elif "num_batches_tracked" not in k:
            sd2d[k] = rng.randn(*a.shape).astype(np.float32) if a.ndim else a
    # The reference initializer's torch calls predate torch 1.0
    # (copy_(..., broadcast=True) no longer exists), so apply its documented
    # semantics (initializer.py:62-68: src/kt replicated kt times along the
    # temporal dim; kt==1 kernels reshaped; exact-shape params copied)
    # directly to the torch model.
    filled = {}
    for k, v in tm.state_dict().items():
        if k in sd2d and sd2d[k].shape == tuple(v.shape):
            filled[k] = torch.from_numpy(np.asarray(sd2d[k]).reshape(v.shape))
        elif k in sd2d and np.asarray(sd2d[k]).ndim == 4 and v.ndim == 5:
            src = np.asarray(sd2d[k])
            kt = v.shape[2]
            if kt == 1:
                filled[k] = torch.from_numpy(src.reshape(v.shape))
            else:
                filled[k] = torch.from_numpy(np.ascontiguousarray(
                    np.broadcast_to((src / float(kt))[:, :, None],
                                    tuple(v.shape))))
        else:
            filled[k] = v  # head / untouched keys keep current init
    tm.load_state_dict(filled)

    fm = get_model_class("mfnet")(num_classes=6)
    variables, x = _init(fm, (1, 8, 64, 64, 3))
    inflated, loaded, _ = inflate_2d_state_dict(variables, sd2d, "mfnet")
    assert len(loaded) > 100  # every conv + BN tensor loaded

    # tensor-level parity for everything the reference loaded
    ref_params, ref_stats, _ = torch_to_flax(_torch_state_numpy(tm), "mfnet")
    for coll, ref_tree in (("params", ref_params), ("batch_stats", ref_stats)):
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_tree)
        flat_new = dict(jax.tree_util.tree_leaves_with_path(inflated[coll]))
        for path, ref_v in flat_ref:
            if "fc" in jax.tree_util.keystr(path):
                continue  # head stays at (different) random init in each
            np.testing.assert_allclose(
                np.asarray(flat_new[path]), np.asarray(ref_v),
                atol=1e-6, err_msg=jax.tree_util.keystr(path))

    # forward parity (heads differ => compare pre-head features)
    with torch.no_grad():
        tfeat = tm.tail(tm.conv5(tm.conv4(tm.conv3(tm.conv2(tm.maxpool(
            tm.conv1(torch.from_numpy(np.transpose(
                np.random.RandomState(0).randn(1, 8, 64, 64, 3)
                .astype(np.float32), (0, 4, 1, 2, 3)).copy()))))))))
    ofeat = fm.apply(inflated, jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 64, 64, 3).astype(np.float32)),
        train=False, method="features")
    np.testing.assert_allclose(
        np.transpose(np.asarray(ofeat), (0, 4, 1, 2, 3)),
        tfeat.numpy(), atol=1e-4, rtol=1e-4)


def test_roundtrip_flax_to_torch():
    """flax -> torch -> flax preserves every mapped tensor exactly."""
    m = get_model_class("resnet18")(num_classes=5)
    variables, _ = _init(m, (1, 8, 32, 32, 3))
    sd = flax_to_torch(variables, "resnet18")
    params2, stats2, missing = torch_to_flax(sd, "resnet18")
    assert not missing
    flat1 = jax.tree_util.tree_leaves(variables["params"])
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
