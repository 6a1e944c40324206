"""Config parity: our config tree must manifest identically to the reference.

For every entry config we ship, the composed ConfigTree must equal the
reference's composed config (evaluated with the same mini-jsonnet engine from
the reference's own jsonnet sources at /root/reference/config). This pins the
full config schema of SURVEY.md §5.6.
"""
import json
import os

import pytest

from rspnet_tpu.config import load_config
from rspnet_tpu.config.tree import ConfigTree
from tests.conftest import REFERENCE_ROOT, REPO_ROOT

REF_CFG = os.path.join(REFERENCE_ROOT, "config")
OUR_CFG = os.path.join(REPO_ROOT, "config")

ENTRY_CONFIGS = [
    "pretrain/c3d.jsonnet",
    "pretrain/resnet18.jsonnet",
    "pretrain/resnet50.jsonnet",
    "pretrain/tsm-r18.jsonnet",
    "pretrain/s3dg.jsonnet",
    "pretrain/r2plus1d.jsonnet",
    "finetune/ucf101_c3d.jsonnet",
    "finetune/ucf101_resnet18.jsonnet",
    "finetune/ucf101_s3dg.jsonnet",
    "finetune/ucf101_r2plus1d.jsonnet",
    "finetune/hmdb51_c3d.jsonnet",
    "finetune/hmdb51_resnet18.jsonnet",
    "finetune/hmdb51_s3dg.jsonnet",
    "finetune/hmdb51_r2plus1d.jsonnet",
    "finetune/smth_smth_c3d.jsonnet",
    "finetune/smth_smth_resnet18.jsonnet",
    "finetune/smth_smth_s3dg.jsonnet",
    "retrieval/ucf101_c3d.jsonnet",
    "retrieval/ucf101_resnet18.jsonnet",
]

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_CFG), reason="reference repo not mounted")


@pytest.mark.parametrize("rel", ENTRY_CONFIGS)
def test_our_config_evaluates(rel):
    cfg = load_config(os.path.join(OUR_CFG, rel))
    assert isinstance(cfg, ConfigTree)
    assert "model" in cfg and "optimizer" in cfg


@needs_reference
@pytest.mark.parametrize("rel", ENTRY_CONFIGS)
def test_manifest_matches_reference(rel):
    ours = load_config(os.path.join(OUR_CFG, rel)).as_plain_dict()
    ref = load_config(os.path.join(REF_CFG, rel)).as_plain_dict()
    assert ours == ref


@needs_reference
@pytest.mark.parametrize("mixin", [
    "add.M0", "add.A0", "add.random_stride", "add.weighted_stride",
    "add.no_random_gray", "add.no_color_jitter", "add.fps25",
])
def test_pretrain_mixins_match_reference(mixin):
    rel = "pretrain/s3dg.jsonnet"
    ours = load_config(os.path.join(OUR_CFG, rel), [mixin]).as_plain_dict()
    ref = load_config(os.path.join(REF_CFG, rel), [mixin]).as_plain_dict()
    assert ours == ref


@needs_reference
@pytest.mark.parametrize("mixin", [
    "add.linear", "add.multitask", "add.sp_224", "add.addtrans",
    "add.model_2stream", "add.finetune", "add.smth_linear", "add.r18k400",
])
def test_finetune_mixins_match_reference(mixin):
    rel = "finetune/ucf101_c3d.jsonnet"
    ours = load_config(os.path.join(OUR_CFG, rel), [mixin]).as_plain_dict()
    ref = load_config(os.path.join(REF_CFG, rel), [mixin]).as_plain_dict()
    assert ours == ref


def test_cli_snippet_override_order():
    cfg = load_config(
        os.path.join(OUR_CFG, "pretrain/s3dg.jsonnet"),
        ["{batch_size: 16}", "{batch_size: 8}"])
    assert cfg.get_int("batch_size") == 8


def test_computed_fields():
    cfg = load_config(os.path.join(OUR_CFG, "pretrain/s3dg.jsonnet"))
    # size = diff_speed[0] * 16 (dual-speed loads 2x frames)
    assert cfg.get_int("temporal_transforms.size") == 32
    assert cfg.get_list("moco.diff_speed") == [2]
    cfg2 = load_config(os.path.join(OUR_CFG, "pretrain/s3dg.jsonnet"),
                       ["{moco+: {diff_speed: []}}"])
    assert cfg2.get_int("temporal_transforms.size") == 16


def test_configtree_api():
    cfg = ConfigTree.from_dict({"a": {"b": 2}, "l": [1, {"x": 1}]})
    assert cfg.get_int("a.b") == 2
    assert cfg.get("a.c", 7) == 7
    cfg.put("a.c.d", 5)
    assert cfg["a.c.d"] == 5
    assert "a.b" in cfg and "z" not in cfg
    assert cfg.get_list("l")[1].get_int("x") == 1
    d = cfg.as_plain_dict()
    assert d["l"][1] == {"x": 1}


@needs_reference
@pytest.mark.parametrize("rel", ENTRY_CONFIGS)
def test_manifest_matches_reference_bytewise(rel):
    """Byte-level JSON parity: dict equality treats 16.0 == 16, which hides
    number-formatting divergence from real jsonnet output."""
    ours = json.dumps(load_config(os.path.join(OUR_CFG, rel)).as_plain_dict(),
                      sort_keys=True)
    ref = json.dumps(load_config(os.path.join(REF_CFG, rel)).as_plain_dict(),
                     sort_keys=True)
    assert ours == ref
