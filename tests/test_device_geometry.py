"""Device-geometry input mode: workers ship decode-resolution clips and the
spatial crop + resize runs on-device inside the fused augment program
(pipeline.PipelineConfig.device_geometry). Covers the loader contract and
the pretrain/finetune engine integration end-to-end on the CPU mesh.

Reference behavior being preserved: the crop distribution of
RawVideoRandomCrop / RawVideoCenterMaxCrop (reference
datasets/transforms_video/transforms_spatial.py:42-100) — only WHERE the
crop executes moves (host cv2 loop -> one fused XLA gather).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from rspnet_tpu.data.catalogs import Synthetic
from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader

_SYNTH = ('{dataset: {name: "synthetic", num_samples: 16, num_classes: 4, '
          'num_frames: 48, height: 48, width: 64}, batch_size: 1, '
          'num_workers: 2, device_geometry: true, '
          'spatial_transforms+: {size: 32}, ')


def test_device_geometry_loader_returns_decode_resolution():
    cat = Synthetic(num_samples=8, num_classes=2, num_frames=40,
                    height=48, width=64)
    cfg = PipelineConfig(clip_len=8, out_size=32, num_clips=2, batch_size=4,
                         train=True, num_workers=2, seed=0,
                         device_geometry=True)
    batches = list(VideoDataLoader(cat, cfg))
    assert len(batches) == 2
    b = batches[0]
    # decode resolution, NOT out_size: geometry is applied on device
    assert b["clips"][0].shape == (4, 8, 48, 64, 3)
    assert b["clips"][0].dtype == np.uint8


def test_device_geometry_matches_host_geometry_distribution():
    """Same videos, same temporal selection: the device-geometry clips must
    be the uncropped source of what host geometry crops from."""
    cat = Synthetic(num_samples=4, num_classes=2, num_frames=40,
                    height=48, width=64)
    kw = dict(clip_len=8, out_size=32, num_clips=1, batch_size=4,
              train=False, num_workers=1, seed=0)
    host = next(iter(VideoDataLoader(cat, PipelineConfig(**kw))))
    dev = next(iter(VideoDataLoader(
        cat, PipelineConfig(device_geometry=True, **kw))))
    assert (host["labels"] == dev["labels"]).all()
    # eval host path: center-max crop (48x48) + resize to 32; the device
    # clip must contain that crop exactly
    import cv2
    d = dev["clips"][0][0]                       # [8, 48, 64, 3]
    c = d[:, :, 8:56]                            # center 48x48
    ref = np.stack([cv2.resize(c[t], (32, 32),
                               interpolation=cv2.INTER_LINEAR)
                    for t in range(8)])
    assert np.array_equal(ref, host["clips"][0][0])


@pytest.fixture(scope="module")
def devgeom_pretrain(tmp_path_factory):
    import pretrain
    exp = tmp_path_factory.mktemp("exp_pre_devgeom")
    pretrain.main([
        "-c", str(REPO / "config/pretrain/resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "1",
        "-x", _SYNTH + 'moco+: {k: 32, dim: 8}, '
        'temporal_transforms+: {_size: 8}}',
    ])
    return exp


def test_pretrain_cli_device_geometry(devgeom_pretrain):
    assert (devgeom_pretrain / "checkpoint.pth.tar").exists()


def test_retrieval_cli_device_geometry(devgeom_pretrain, tmp_path):
    import retrieval
    results = retrieval.main([
        "-c", str(REPO / "config/retrieval/ucf101_resnet18.jsonnet"),
        "-e", str(tmp_path / "exp_ret_devgeom"), "-d", "--seed", "1",
        "--mc", str(devgeom_pretrain / "checkpoint.pth.tar"),
        "-x", _SYNTH + 'temporal_transforms+: {size: 8, '
        'validate+: {final_n_crop: 2}}, '
        'validate: {batch_size: 1}, final_validate: {batch_size: 1}}',
    ])
    vals = [results[f"R@{k}"] for k in (1, 5, 10, 20, 50)]
    assert vals == sorted(vals)


def test_finetune_cli_device_geometry(tmp_path):
    import finetune
    exp = tmp_path / "exp_ft_devgeom"
    finetune.main([
        "-c", str(REPO / "config/finetune/ucf101_resnet18.jsonnet"),
        "-e", str(exp), "-d", "--seed", "1",
        "-x", _SYNTH + 'temporal_transforms+: {size: 8, frame_rate: null, '
        'validate+: {n_crop: 2, final_n_crop: 2}}, '
        'validate: {batch_size: 1}, final_validate: {batch_size: 1}}',
    ])
    assert (exp / "checkpoint.pth.tar").exists()
