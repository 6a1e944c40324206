"""Reference-format checkpoint export, pretrain --validate, offline tools."""
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
    exp = tmp_path_factory.mktemp("exp_pre2")
    pretrain.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "3",
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}}',
    ])
    return exp


def test_export_reference_checkpoint(pretrain_run, tmp_path):
    """Our checkpoint -> reference torch layout -> loadable by our own
    reference-dialect loader (round trip through the torch format)."""
    import torch

    from rspnet_tpu.engines.export import export_reference_checkpoint
    from rspnet_tpu.engines.transfer import load_pretrained_encoder

    dst = tmp_path / "ref_format.pth.tar"
    out = export_reference_checkpoint(pretrain_run / "checkpoint.pth.tar",
                                      dst)
    assert out["arch"] == "resnet18"

    # torch user view: flat keys with encoder_q./encoder_k. prefixes + queue
    cp = torch.load(str(dst), weights_only=False)
    keys = list(cp["model"].keys())
    assert any(k.startswith("encoder_q.encoder.conv1") or
               k.startswith("encoder_q.encoder.layer1") for k in keys)
    assert any(k.startswith("encoder_q.fc1.2.") for k in keys)
    assert any(k.startswith("encoder_k.encoder.") for k in keys)
    assert cp["model"]["queue"].shape == (8, 32)

    # the reference-dialect --mc loader must accept the exported file
    enc_params, enc_stats = load_pretrained_encoder(dst, "resnet18")
    assert "stem" in enc_params
    assert "stem" in enc_stats

    # weights must round-trip exactly
    from rspnet_tpu.framework import load_state
    ours = load_state(pretrain_run / "checkpoint.pth.tar")
    orig = ours["model"]["params_q"]["encoder"]["stem"]["conv"]["kernel"]
    np.testing.assert_array_equal(enc_params["stem"]["conv"]["kernel"], orig)


def test_pretrain_validate_flag(pretrain_run):
    """--validate runs a no-grad stats epoch and leaves state untouched."""
    import pretrain as pretrain_cli
    from rspnet_tpu.framework import load_state

    before = load_state(pretrain_run / "checkpoint.pth.tar")
    pretrain_cli.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(pretrain_run), "-d", "--seed", "3", "--validate",
        "--load-checkpoint", str(pretrain_run / "checkpoint.pth.tar"),
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}}',
    ])
    after = load_state(pretrain_run / "checkpoint.pth.tar")
    np.testing.assert_array_equal(
        before["model"]["queue_ptr"], after["model"]["queue_ptr"])


def test_verify_video_tool(tmp_path):
    """verify_video flags a corrupt file and passes a good one."""
    import cv2
    d = tmp_path / "vids"
    (d / "cls").mkdir(parents=True)
    good = d / "cls" / "good.avi"
    w = cv2.VideoWriter(str(good), cv2.VideoWriter_fourcc(*"MJPG"), 25,
                        (32, 32))
    for _ in range(10):
        w.write(np.zeros((32, 32, 3), np.uint8))
    w.release()
    bad = d / "cls" / "bad.mp4"
    bad.write_bytes(b"not a video at all")

    sys.argv = ["verify_video.py", str(d)]
    import utils.verify_video as vv
    failed = vv.main()
    names = {p.name for p in failed}
    assert "bad.mp4" in names
    assert "good.avi" not in names


def test_build_kinetics_subset(tmp_path):
    full = tmp_path / "full"
    for name, size in [("aaa", 100), ("bbb", 10), ("ccc", 50)]:
        (full / name).mkdir(parents=True)
        (full / name / "v.mp4").write_bytes(b"x" * size)
    import utils.build_kinetics_subset as bks
    cats = bks.find_smallest_categories(full, 2)
    assert cats == ["bbb", "ccc"]
    dest = tmp_path / "subset"
    bks.build_subset(full, dest, cats)
    assert (dest / "bbb").is_symlink()
    assert (dest / "bbb" / "v.mp4").exists()


def test_pretrain_continue_resumes(tmp_path):
    """--continue picks up config + checkpoint and resumes at the next epoch
    (reference: arguments.py:59-85)."""
    import pretrain as pretrain_cli
    from rspnet_tpu.framework import load_state

    exp = tmp_path / "exp_cont"
    common = [
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "--seed", "4",
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}, num_epochs: "2"}',
    ]
    # first run: only epoch 1 (debug caps at 1)
    pretrain_cli.main(common + ["-d"])
    assert load_state(exp / "checkpoint.pth.tar")["epoch"] == 1

    # --continue without -c: reuses run_0's config.json and the checkpoint,
    # runs the remaining epoch
    pretrain_cli.main(["-e", str(exp), "--seed", "4", "--continue"])
    ckpt = load_state(exp / "checkpoint.pth.tar")
    assert ckpt["epoch"] == 2
    assert ckpt["scheduler"]["epoch"] == 2


def test_export_queue_ptr_shape(pretrain_run, tmp_path):
    """Reference registers queue_ptr as torch.zeros(1): exported shape must
    be exactly (1,)."""
    import torch
    from rspnet_tpu.engines.export import export_reference_checkpoint
    dst = tmp_path / "qp.pth.tar"
    export_reference_checkpoint(pretrain_run / "checkpoint.pth.tar", dst)
    cp = torch.load(str(dst), weights_only=False)
    assert tuple(cp["model"]["queue_ptr"].shape) == (1,)
