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
    # slow pathway subsamples T by alpha; C2D temporal-pools by 2 after res2
    f = m.apply(v, x, train=False, method="features")
    assert f.shape[1] == (4 if two_path else
                          (16 if name.startswith("C2D") else 32))
    # stem spatial max-pool + 3 stage strides => /32 total (64px -> 2px)
    assert f.shape[2] == f.shape[3] == 2


def test_slowfast_all_specs_smoke():
    """Every spec in the table initializes and runs a forward pass."""
    from rspnet_tpu.models.slowfast import SPECS
    for name in sorted(SPECS):
        m = get_model_class(name)(num_classes=3)
        t = 16 if "16x8" in name else 8
        x = jnp.zeros((1, t, 32, 32, 3), jnp.float32)
        v = m.init({"params": KEY}, x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 3), name


def test_slowfast_specs_match_reference_yamls():
    """The static SPECS table equals what spec_from_yaml derives from every
    YAML it covers. The Kinetics YAMLs are vendored (config data) under
    config/slowfast-configs/Kinetics{,/c2}, so this runs standalone —
    no reference mount needed."""
    import glob
    import os

    from rspnet_tpu.models.slowfast import SPECS, spec_from_yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pattern = os.path.join(repo,
                           "config/slowfast-configs/Kinetics/**/*.yaml")
    paths = sorted(glob.glob(pattern, recursive=True))
    assert len(paths) == 30, "vendored Kinetics YAML set incomplete"
    checked = 0
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0]
        base = name.replace("_IN1K", "")  # IN1K twins differ only in solver
        if base not in SPECS:
            continue
        derived = spec_from_yaml(p, name=base)
        assert derived == SPECS[base], f"{base} diverges from {p}"
        checked += 1
    assert checked >= 20  # every yaml (R50+R101+c2 variants) is covered


def test_vendored_yamls_are_byte_identical_to_reference():
    """The vendored copies must never drift from the reference snapshot."""
    import glob
    import os

    from tests.conftest import REFERENCE_ROOT

    ref_dir = os.path.join(REFERENCE_ROOT, "config/slowfast-configs")
    if not os.path.isdir(ref_dir):
        pytest.skip("reference repo not mounted")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_paths = sorted(glob.glob(os.path.join(ref_dir, "**/*.yaml"),
                                 recursive=True))
    # the full reference set: 30 Kinetics + 7 AVA
    assert len(ref_paths) == 37
    for rp in ref_paths:
        rel = os.path.relpath(rp, os.path.join(REFERENCE_ROOT, "config"))
        vp = os.path.join(repo, "config", rel)
        assert os.path.exists(vp), f"missing vendored {rel}"
        with open(rp, "rb") as a, open(vp, "rb") as b:
            assert a.read() == b.read(), f"vendored {rel} drifted"


def test_sub_batchnorm_matches_reference_semantics():
    """SubBatchNorm: per-split training stats (sample i -> split i%k, the
    reference's channel-folding view, batchnorm_helper.py:102-105) and
    mean-of-means + between-split-variance aggregation at eval
    (batchnorm_helper.py:68-96)."""
    from rspnet_tpu.models.common import SubBatchNorm

    k, n, c = 2, 4, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 2, 4, 4, c).astype(np.float32))
    m = SubBatchNorm(num_splits=k, momentum=0.0)  # running <- batch stats
    v = m.init({"params": KEY}, x, train=False)
    y, mut = m.apply(v, x, train=True, mutable=["batch_stats"])

    xs = np.asarray(x).reshape(n // k, k, 2, 4, 4, c)
    mean = xs.mean(axis=(0, 2, 3, 4))
    var = xs.var(axis=(0, 2, 3, 4))
    expect = (xs - mean[None, :, None, None, None]) / np.sqrt(
        var[None, :, None, None, None] + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect.reshape(x.shape),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), mean,
                               rtol=1e-5, atol=1e-6)
    # running_var stores the UNBIASED per-split variance (the reference's
    # per-split torch BatchNorm3d does; n_el elements per split/channel)
    n_el = xs.size // (k * c)
    var_run = var * n_el / (n_el - 1)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               var_run, rtol=1e-5, atol=1e-6)

    # eval: aggregated running stats (normalization uses the stored —
    # unbiased — running vars, like the reference's aggregate_stats)
    y_eval = m.apply({"params": v["params"], "batch_stats":
                      mut["batch_stats"]}, x, train=False)
    agg_m = mean.mean(0)
    agg_v = var_run.mean(0) + ((mean - agg_m) ** 2).mean(0)
    expect_eval = (np.asarray(x) - agg_m) / np.sqrt(agg_v + 1e-5)
    np.testing.assert_allclose(np.asarray(y_eval), expect_eval,
                               rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        m.apply(v, x[:3], train=True, mutable=["batch_stats"])


def test_slowfast_sub_batchnorm_variant_runs():
    """norm_type='sub_batchnorm' is wired through every BN in the net."""
    import dataclasses

    from rspnet_tpu.models.slowfast import SPECS, SlowFast

    spec = dataclasses.replace(SPECS["SLOWFAST_4x16_R50"],
                               norm_type="sub_batchnorm", bn_num_splits=2)
    m = SlowFast(spec=spec, num_classes=3)
    x = jnp.zeros((2, 8, 32, 32, 3), jnp.float32)
    v = m.init({"params": KEY}, x, train=False)
    # split running stats are per-split: [k, c]
    stem_stats = v["batch_stats"]["slow"]["stem"]["bn"]["mean"]
    assert stem_stats.shape == (2, 64)
    y, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                   rngs={"dropout": KEY})
    assert y.shape == (2, 3)


def test_slowfast_spec_from_user_yaml(tmp_path):
    """arch='slowfast' + cfg_file honors a user pyslowfast YAML (the
    reference's yacs surface)."""
    y = tmp_path / "my.yaml"
    y.write_text(
        "MODEL:\n  ARCH: slowfast\nSLOWFAST:\n  ALPHA: 4\n"
        "  FUSION_KERNEL_SZ: 7\nRESNET:\n  DEPTH: 50\n")
    ctor = get_model_class("slowfast", cfg_file=str(y))
    m = ctor(num_classes=5)
    assert m.spec.alpha == 4 and m.spec.fusion_kernel == 7


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


def test_grouped_shift_matches_reference():
    """temporal_shift_grouped == the reference's TemporalShift.shift_group
    (temporal_shift.py:63-104), driven as the actual torch function."""
    import importlib.util
    import os

    torch = pytest.importorskip("torch")
    from rspnet_tpu.models.tsm import temporal_shift_grouped
    from tests.conftest import REFERENCE_ROOT

    path = os.path.join(REFERENCE_ROOT, "models/tsm/temporal_shift.py")
    if not os.path.exists(path):
        pytest.skip("reference repo not mounted")
    spec = importlib.util.spec_from_file_location("ref_tshift", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    B, T, H, W, C = 2, 4, 3, 3, 12
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, H, W, C).astype(np.float32)
    for groups, fold_div in ((2, 3), (3, 2), (4, 4)):
        ours = np.asarray(temporal_shift_grouped(
            jnp.asarray(x), fold_div=fold_div, groups=groups))
        # reference shape: [n*t, c, h, w]
        xt = torch.from_numpy(
            x.transpose(0, 1, 4, 2, 3).reshape(B * T, C, H, W).copy())
        ref = mod.TemporalShift.shift_group(
            xt, n_segment=T, fold_div=fold_div, groups=groups)
        ref = ref.numpy().reshape(B, T, C, H, W).transpose(0, 1, 3, 4, 2)
        np.testing.assert_array_equal(ours, ref)


def test_grouped_shift_rejects_groups_1():
    from rspnet_tpu.models.tsm import temporal_shift_grouped
    with pytest.raises(ValueError):
        temporal_shift_grouped(jnp.zeros((1, 2, 2, 2, 8)), groups=1)


def test_tsm_non_local_identity_at_init_and_trains():
    """Non-local blocks start as identity (zero-init W projection, like
    the reference's constant_(0) init) and inject at the reference's
    stage-2/3 positions; params exist and gradients flow."""
    from rspnet_tpu.models.tsm import get_model_class

    m_nl = get_model_class("resnet50", num_segments=4, non_local=True)(
        num_classes=5)
    m_plain = get_model_class("resnet50", num_segments=4)(num_classes=5)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 4, 32, 32, 3),
                    jnp.float32)
    v_nl = m_nl.init({"params": KEY}, x, train=False)
    v_p = m_plain.init({"params": KEY}, x, train=False)
    # reference injection sites for R50: layer2 blocks 0,2; layer3 0,2,4
    nl_names = {k for k in v_nl["params"] if k.startswith("nl")}
    assert nl_names == {"nl2_0", "nl2_2", "nl3_0", "nl3_2", "nl3_4"}
    # zero-init output projection => same logits as the plain net when
    # sharing the common params
    common = {k: v_nl["params"][k] for k in v_p["params"]}
    common_stats = {k: v_nl["batch_stats"][k] for k in v_p["batch_stats"]}
    y_p = m_plain.apply({"params": common, "batch_stats": common_stats},
                        x, train=False)
    y_nl = m_nl.apply(v_nl, x, train=False)
    np.testing.assert_allclose(np.asarray(y_nl), np.asarray(y_p),
                               atol=1e-5, rtol=1e-5)


def test_tsm_grouped_shift_model_forward():
    from rspnet_tpu.models.tsm import get_model_class
    m = get_model_class("resnet18", num_segments=4, shift_groups=2)(
        num_classes=5)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = m.init({"params": KEY}, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 5)
