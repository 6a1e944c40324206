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

from tests.config_manifest_lists import (ENTRY_CONFIGS, FINETUNE_MIXINS,
                                         PRETRAIN_MIXINS, golden_name)

REF_CFG = os.path.join(REFERENCE_ROOT, "config")
OUR_CFG = os.path.join(REPO_ROOT, "config")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "configs")

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


@pytest.mark.parametrize("rel,ext", [(r, []) for r in ENTRY_CONFIGS]
                         + [("pretrain/s3dg.jsonnet", [m])
                            for m in PRETRAIN_MIXINS]
                         + [("finetune/ucf101_c3d.jsonnet", [m])
                            for m in FINETUNE_MIXINS])
def test_manifest_matches_golden(rel, ext):
    """Independent oracle: checked-in, human-reviewed golden manifests
    (tests/golden/configs/, generated once by make_config_goldens.py).
    Unlike the same-engine reference comparison above, an evaluator bug
    cannot change both sides of THIS check. Runs without the reference
    mount."""
    ours = load_config(os.path.join(OUR_CFG, rel), list(ext)).as_plain_dict()
    path = os.path.join(GOLDEN_DIR, golden_name(rel, ext))
    with open(path) as f:
        golden = json.load(f)
    assert ours == golden, (
        f"{rel} {ext} diverged from the reviewed golden {path}; if the "
        "config intentionally changed, regenerate with "
        "tests/golden/make_config_goldens.py and re-review")


@needs_reference
@pytest.mark.parametrize("mixin", PRETRAIN_MIXINS)
def test_pretrain_mixins_match_reference(mixin):
    rel = "pretrain/s3dg.jsonnet"
    ours = load_config(os.path.join(OUR_CFG, rel), [mixin]).as_plain_dict()
    ref = load_config(os.path.join(REF_CFG, rel), [mixin]).as_plain_dict()
    assert ours == ref


@needs_reference
@pytest.mark.parametrize("mixin", FINETUNE_MIXINS)
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
