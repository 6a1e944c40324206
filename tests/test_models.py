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
