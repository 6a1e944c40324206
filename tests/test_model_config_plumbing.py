"""Model-layer review regressions: config plumbing, torchvision mapping,
SlowFast feature contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_model_cfg_keys_reach_the_factory():
    """model.* keys must flow into get_model_class like the reference's
    get_model_class(**cfg.get_config('model')) — dropping them silently
    built a resnet50-based TSM for the tsm-r18 config."""
    from rspnet_tpu.config import load_config
    from rspnet_tpu.moco import build_moco_model
    cfg = load_config("config/pretrain/tsm-r18.jsonnet")
    model, _ = build_moco_model(cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 8, 32, 32, 3)), train=False)
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(v["params"]))
    assert n < 2e7, f"{n} params: BasicBlock r18 expected, got a r50 TSM"


def test_torchvision_r3d18_mapping_paths_exist():
    """Every destination path in the torchvision-resnet18 key mapping
    must exist in the VideoResNet variable tree (and the mapping must
    cover all of its conv/bn/fc params)."""
    from rspnet_tpu.models.torch_bridge import KEY_MAPPERS, _get_path
    from rspnet_tpu.models.video_resnet import r3d_18
    model = r3d_18(num_classes=400)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 4, 32, 32, 3)), train=False)
    mapped = set()
    for torch_key, (coll, path, conv) in KEY_MAPPERS[
            "torchvision-resnet18"]():
        leaf = _get_path(dict(v[coll]), path)   # KeyError = broken path
        assert hasattr(leaf, "shape")
        mapped.add((coll, path))
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    n_params = len(flat)
    n_mapped_params = sum(1 for c, p in mapped if c == "params")
    assert n_mapped_params == n_params, (
        f"mapping covers {n_mapped_params} of {n_params} param leaves")


def test_slowfast_two_pathway_features_match_feature_dim():
    """features() must return feature_dim channels (slow 2048 + fast
    lateral 256 for R50 two-pathway), with GAP(features) equal to the
    concat of per-pathway pools the reference head computes."""
    from rspnet_tpu.models.slowfast import get_model_class
    model = get_model_class("SLOWFAST_4x16_R50")(num_classes=8,
                                                 with_classifier=False)
    x = jnp.zeros((1, 8, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    fmap = model.apply(v, x, train=False, method="features")
    assert fmap.shape[-1] == model.feature_dim
