"""dataset.mean/std must flow from config into the device augment.

Reference reads them from config (datasets/classification/__init__.py:
152-162 vid with --debug identity, :222-227 classification always);
round-2 engines hardcoded ImageNet, silently ignoring -x overrides.
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from rspnet_tpu.config import load_config
from rspnet_tpu.engines.normalization import (DEBUG_DISABLED, IMAGENET_MEAN,
                                              IMAGENET_STD,
                                              dataset_normalization)

CFG = str(REPO / "config/finetune/ucf101_resnet18.jsonnet")
OVERRIDE = '{dataset+: {mean: [0.5, 0.5, 0.5], std: [0.1, 0.2, 0.3]}}'


def test_default_configs_carry_imagenet_stats():
    cfg = load_config(CFG)
    assert dataset_normalization(cfg) == (IMAGENET_MEAN, IMAGENET_STD)


def test_x_override_changes_stats():
    cfg = load_config(CFG, [OVERRIDE])
    assert dataset_normalization(cfg) == ((0.5, 0.5, 0.5), (0.1, 0.2, 0.3))


def test_vid_debug_disables_normalization():
    cfg = load_config(CFG, [OVERRIDE])
    assert dataset_normalization(cfg, vid_debug=True) == DEBUG_DISABLED


def test_override_changes_augmented_pixels():
    # through the actual device op the engines call, same inputs, the two
    # stats must yield different pixels: (x - m)/s
    import jax.numpy as jnp
    from rspnet_tpu.ops.augment import eval_preprocess
    cfg_a = load_config(CFG)
    cfg_b = load_config(CFG, [OVERRIDE])
    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, (1, 2, 32, 32, 3), np.uint8)
    boxes = np.array([[0, 0, 32, 32]], np.float32)
    outs = []
    for cfg in (cfg_a, cfg_b):
        mean, std = dataset_normalization(cfg)
        outs.append(np.asarray(eval_preprocess(
            jnp.asarray(clip), boxes, size=(32, 32), mean=mean, std=std)))
    a, b = outs
    assert not np.allclose(a, b)
    # and the override math is exact: b = (a * imagenet_std + imagenet_mean
    #                                      - 0.5) / override_std
    x = a * np.array(IMAGENET_STD) + np.array(IMAGENET_MEAN)
    expect = (x - 0.5) / np.array([0.1, 0.2, 0.3])
    np.testing.assert_allclose(b, expect, rtol=1e-5, atol=1e-5)


def test_engines_read_config_not_constants():
    # every engine must derive self.normalize via dataset_normalization;
    # a hardcoded tuple reappearing is the regression this pins against
    for eng in ("pretrain", "finetune", "retrieval", "visualization"):
        src = (REPO / f"rspnet_tpu/engines/{eng}.py").read_text()
        assert "0.485" not in src, f"{eng}.py hardcodes normalization"
        assert "dataset_normalization(" in src


def test_bad_stats_rejected():
    import pytest
    cfg = load_config(CFG, ['{dataset+: {mean: [0.5, 0.5]}}'])
    with pytest.raises(ValueError):
        dataset_normalization(cfg)
