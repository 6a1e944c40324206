"""End-to-end engine tests on the 8-device CPU mesh with synthetic data.

These drive the actual CLIs (pretrain.py / finetune.py / retrieval.py /
visualization.py) the way a user would, with tiny configs.
"""
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_SYNTH = ('{dataset: {name: "synthetic", num_samples: 16, num_classes: 4, '
          'num_frames: 48, height: 48, width: 64}, batch_size: 1, '
          'num_workers: 2, spatial_transforms+: {size: 32}, ')


@pytest.fixture(scope="module")
def pretrain_run(tmp_path_factory):
    import pretrain
    exp = tmp_path_factory.mktemp("exp_pre")
    pretrain.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "1",
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}}',
    ])
    return exp


def test_pretrain_cli_artifacts(pretrain_run):
    exp = pretrain_run
    assert (exp / "checkpoint.pth.tar").exists()
    assert (exp / "model_best.pth.tar").exists()
    run_dir = next(exp.glob("run_0_*"))
    assert (run_dir / "config.json").exists()
    assert (run_dir / "run.sh").exists()
    assert (run_dir / "experiment.log").exists()
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["moco"]["k"] == 32  # trimmed multiple of global batch 8


def test_pretrain_checkpoint_contents(pretrain_run):
    from rspnet_tpu.framework import load_state
    ckpt = load_state(pretrain_run / "checkpoint.pth.tar")
    assert ckpt["arch"] == "resnet18"
    assert ckpt["epoch"] == 1
    m = ckpt["model"]
    assert set(m) >= {"params_q", "params_k", "batch_stats_q",
                      "batch_stats_k", "queue", "queue_ptr"}
    assert m["queue"].shape == (8, 32)
    assert "scheduler" in ckpt and "optimizer" in ckpt


def test_finetune_cli_with_mc(pretrain_run, tmp_path):
    import finetune
    result = finetune.main([
        "-c", str(REPO / "config/finetune/ucf101_resnet18.jsonnet"),
        "-e", str(tmp_path / "exp_ft"), "-d", "--seed", "1",
        "--mc", str(pretrain_run / "checkpoint.pth.tar"),
        "-x", _SYNTH + 'temporal_transforms+: {size: 8, frame_rate: null, '
        'validate+: {n_crop: 2, final_n_crop: 2}}, '
        'validate: {batch_size: 1}, final_validate: {batch_size: 1}}',
    ])
    assert 0.0 <= result["acc1"] <= 100.0
    exp = tmp_path / "exp_ft"
    assert (exp / "checkpoint.pth.tar").exists()
    assert (exp / "model_best.pth.tar").exists()


def test_retrieval_cli_with_mc(pretrain_run, tmp_path):
    import retrieval
    results = retrieval.main([
        "-c", str(REPO / "config/retrieval/ucf101_resnet18.jsonnet"),
        "-e", str(tmp_path / "exp_ret"), "-d", "--seed", "1",
        "--mc", str(pretrain_run / "checkpoint.pth.tar"),
        "-x", _SYNTH + 'temporal_transforms+: {size: 8, '
        'validate+: {final_n_crop: 2}}, '
        'validate: {batch_size: 1}, final_validate: {batch_size: 1}}',
    ])
    assert set(results) == {"R@1", "R@5", "R@10", "R@20", "R@50"}
    # recall must be monotone in k
    vals = [results[f"R@{k}"] for k in (1, 5, 10, 20, 50)]
    assert vals == sorted(vals)
    run_dir = next((tmp_path / "exp_ret").glob("run_0_*"))
    # reference artifact names (retrieval.py:133-141) + round-2 aliases
    for name in ("train_fold1_feats.npy", "train_fold1_labels.npy",
                 "test_fold1_feats.npy", "test_fold1_labels.npy",
                 "train_feature.npy", "train_class.npy"):
        assert (run_dir / name).exists(), name
    assert (run_dir / "topk_correct.json").exists()


def test_visualization_cli(pretrain_run, tmp_path):
    import visualization
    visualization.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(tmp_path / "exp_vis"), "-d", "--seed", "1",
        "--mc", str(pretrain_run / "checkpoint.pth.tar"),
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}}',
    ])
    run_dir = next((tmp_path / "exp_vis").glob("run_0_*"))
    cams = list((run_dir / "cam").glob("*.png"))
    assert len(cams) > 0


def test_visualization_diff_speed_deterministic(pretrain_run, tmp_path):
    """CAM clips go through the dual-speed pairing (reference builder:458-461)
    deterministically: same seed => byte-identical heatmap strips, and the
    strip covers t_real (=size/max(diff_speed)) frames, not the raw load."""
    import visualization
    outs = []
    for name in ("a", "b"):
        exp = tmp_path / f"exp_vis_{name}"
        visualization.main([
            "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
            "-e", str(exp), "-d", "--seed", "7",
            "--mc", str(pretrain_run / "checkpoint.pth.tar"),
            "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
            'temporal_transforms+: {_size: 8}}',
        ])
        run_dir = next(exp.glob("run_0_*"))
        cams = sorted((run_dir / "cam").glob("*.png"))
        assert cams, "no CAM strips written"
        outs.append({p.name: p.read_bytes() for p in cams})
    assert outs[0] == outs[1]


def test_retrieval_topk_math():
    from rspnet_tpu.engines.retrieval import RetrievalEngine
    train_f = np.eye(4, dtype=np.float32)
    train_l = np.array([0, 1, 2, 3])
    test_f = np.eye(4, dtype=np.float32)[[1, 2]]
    test_l = np.array([1, 0])  # first is a direct hit, second is not
    r = RetrievalEngine.topk_retrieval(train_f, train_l, test_f, test_l)
    assert r["R@1"] == pytest.approx(50.0)
    assert r["R@50"] == pytest.approx(100.0)


def test_lr_schedules():
    from rspnet_tpu.framework.lr_schedule import (CosineLR, MultiStepLR,
                                                  PlateauLR)
    c = CosineLR(1.0, num_epochs=10)
    lrs = [c.step() for _ in range(10)]
    assert lrs[-1] == pytest.approx(0.0, abs=1e-9)
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))

    m = MultiStepLR(1.0, milestones=[2, 4])
    assert m.step() == 1.0          # epoch 1
    assert m.step() == pytest.approx(0.1)    # epoch 2
    assert m.step() == pytest.approx(0.1)
    assert m.step() == pytest.approx(0.01)   # epoch 4

    p = PlateauLR(1.0, patience=1)
    p.step(1.0)
    p.step(1.0)   # bad 1
    assert p.lr == 1.0
    p.step(1.0)   # bad 2 > patience -> decay
    assert p.lr == pytest.approx(0.1)
    p.step(0.5)   # improvement resets
    assert p.lr == pytest.approx(0.1)


# -- 2-D data x model parallelism from config alone (VERDICT r3 #1b) ---------
# `parallel: {data: D, model: M}` makes PretrainEngine build the K-sharded
# 2-D step (moco/sharded_queue.py); the checkpoint stores the DENSE queue
# (reference .pth.tar layout) and --load-checkpoint re-shards it.

_PAR_EXT = (_SYNTH + 'moco+: {k: 32, dim: 8}, '
            'temporal_transforms+: {_size: 8}, '
            'parallel: {data: 4, model: 2}}')


@pytest.fixture(scope="module")
def pretrain_2d_run(tmp_path_factory):
    import pretrain
    exp = tmp_path_factory.mktemp("exp_pre_2d")
    pretrain.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "1", "-x", _PAR_EXT,
    ])
    return exp


def test_pretrain_2d_cli_artifacts(pretrain_2d_run):
    from rspnet_tpu.framework import load_state
    exp = pretrain_2d_run
    assert (exp / "checkpoint.pth.tar").exists()
    ckpt = load_state(exp / "checkpoint.pth.tar")
    # dense reference queue layout even though training ran K-sharded
    assert ckpt["model"]["queue"].shape == (8, 32)
    assert np.isfinite(np.asarray(ckpt["model"]["queue"])).all()
    cfg = json.loads(
        (next(exp.glob("run_0_*")) / "config.json").read_text())
    assert cfg["parallel"] == {"data": 4, "model": 2}


def test_pretrain_2d_checkpoint_roundtrip_validate(pretrain_2d_run):
    """--load-checkpoint re-shards the dense queue over K and the 2-D
    eval step (--validate) runs against it."""
    import pretrain
    exp = pretrain_2d_run
    pretrain.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "1", "-x", _PAR_EXT,
        "--load-checkpoint", str(exp / "checkpoint.pth.tar"),
        "--validate",
    ])


def test_moco_k_trim_respects_model_parallel():
    from rspnet_tpu.utils.moco import trim_moco_k
    # K must be a multiple of global_batch * M so every enqueue lands
    # wholly inside one K-shard
    assert trim_moco_k(100, 8, model_parallel=2) == 96
    assert trim_moco_k(100, 8) == 96
    assert trim_moco_k(100, 12, model_parallel=2) == 96
    assert trim_moco_k(30, 8, model_parallel=4) == 0
