"""Data pipeline tests: catalogs, readers, loader batching/padding."""
import numpy as np
import pytest

from rspnet_tpu.config.tree import ConfigTree
from rspnet_tpu.data.catalogs import Synthetic, build_catalog
from rspnet_tpu.data.pipeline import PipelineConfig, VideoDataLoader, build_loader
from rspnet_tpu.data.video_reader import SyntheticVideoReader, open_video


def test_synthetic_reader_deterministic():
    url = "synthetic://42?frames=32&h=64&w=80&cls=3"
    r1, r2 = SyntheticVideoReader(url), SyntheticVideoReader(url)
    f1 = r1.get_batch([0, 5, 31])
    f2 = r2.get_batch([0, 5, 31])
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (3, 64, 80, 3) and f1.dtype == np.uint8
    # motion: the square moves between frames
    assert np.abs(f1[0].astype(int) - f1[2].astype(int)).max() > 50


def test_open_video_dispatch():
    r = open_video("synthetic://1?frames=8&h=32&w=32&cls=0")
    assert isinstance(r, SyntheticVideoReader)
    assert r.num_frames == 8


def test_synthetic_catalog():
    cat = Synthetic(num_samples=20, num_classes=5)
    assert len(cat) == 20
    assert cat[7].class_index == 2
    assert cat[7].video_path.startswith("synthetic://")


def test_build_catalog_from_config():
    cfg = ConfigTree.from_dict({
        "dataset": {"name": "synthetic", "num_samples": 8, "num_classes": 2}})
    cat = build_catalog(cfg, "train")
    assert len(cat) == 8


def _loader(train=True, n=10, batch=4, num_clips=1, n_crop=1, **kw):
    cat = Synthetic(num_samples=n, num_classes=3, num_frames=40,
                    height=48, width=64)
    cfg = PipelineConfig(
        clip_len=8, out_size=32, num_clips=num_clips, batch_size=batch,
        train=train, num_workers=2, seed=0, n_crop=n_crop, **kw)
    return VideoDataLoader(cat, cfg)


def test_train_loader_shapes():
    loader = _loader(train=True, n=10, batch=4, num_clips=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last: 10 // 4
    b = batches[0]
    assert len(b["clips"]) == 2
    assert b["clips"][0].shape == (4, 8, 32, 32, 3)
    assert b["clips"][0].dtype == np.uint8
    assert b["labels"].shape == (4,)
    assert b["mask"].all()


def test_eval_loader_pads_tail():
    loader = _loader(train=False, n=10, batch=4)
    batches = list(loader)
    assert len(batches) == 3  # ceil(10/4), padded
    assert batches[2]["mask"].tolist() == [True, True, False, False]
    assert loader.num_valid_samples() == 10


def test_eval_multi_crop_concatenates_time():
    loader = _loader(train=False, n=4, batch=2, n_crop=3)
    b = next(iter(loader))
    assert b["clips"][0].shape == (2, 24, 32, 32, 3)  # 3 crops x 8 frames


def test_epoch_shuffling_changes_order():
    loader = _loader(train=True, n=8, batch=8)
    loader.set_epoch(0)
    l0 = next(iter(loader))["labels"]
    loader.set_epoch(1)
    l1 = next(iter(loader))["labels"]
    assert sorted(l0.tolist()) == sorted(l1.tolist())
    assert l0.tolist() != l1.tolist()


def test_build_loader_from_config():
    cfg = ConfigTree.from_dict({
        "dataset": {"name": "synthetic", "num_samples": 8, "num_classes": 2,
                    "num_frames": 40, "height": 48, "width": 64},
        "batch_size": 2,
        "num_workers": 1,
        "temporal_transforms": {
            "size": 8,
            "strides": [{"stride": 1, "weight": 1}],
            "validate": {"stride": 1, "n_crop": 1, "final_n_crop": 2},
            "frame_rate": None,
        },
        "spatial_transforms": {"size": 32,
                               "crop_area": {"min": 0.25, "max": 1.0}},
        "validate": {"batch_size": 2},
        "final_validate": {"batch_size": 2},
    })
    loader = build_loader(cfg, "train", vid=True, batch_multiplier=2)
    b = next(iter(loader))
    assert len(b["clips"]) == 2          # vid -> q/k pair
    assert b["clips"][0].shape[0] == 4   # 2 * multiplier

    val = build_loader(cfg, "val", final_validate=True)
    bv = next(iter(val))
    assert bv["clips"][0].shape[1] == 16  # final_n_crop=2 x 8 frames


def test_process_mode_matches_thread_mode():
    """use_processes=True must produce the exact same epoch as threads
    (same per-sample seeds)."""
    cat = Synthetic(num_samples=8, num_classes=3, num_frames=40,
                    height=48, width=64)

    def epoch(procs):
        cfg = PipelineConfig(clip_len=8, out_size=32, num_clips=2,
                             batch_size=4, train=True, num_workers=3,
                             seed=5, use_processes=procs)
        ld = VideoDataLoader(cat, cfg)
        ld.set_epoch(1)
        return list(ld)

    a, b = epoch(False), epoch(True)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["labels"], y["labels"])
        for cx, cy in zip(x["clips"], y["clips"]):
            np.testing.assert_array_equal(cx, cy)


def test_multihost_loader_shards_are_exact_slices():
    """With process_count=2, each host loads exactly its half of every
    global batch, and the union reproduces the single-host epoch bit-for-bit
    (replaces the reference's DistributedSampler sharding,
    datasets/classification/__init__.py:130)."""
    full = list(_loader(train=True, n=12, batch=4))
    shards = [list(_loader(train=True, n=12, batch=4,
                           process_index=p, process_count=2))
              for p in (0, 1)]
    assert len(full) == len(shards[0]) == len(shards[1]) == 3
    for b, (fb, s0, s1) in enumerate(zip(full, *shards)):
        np.testing.assert_array_equal(
            fb["labels"], np.concatenate([s0["labels"], s1["labels"]]))
        np.testing.assert_array_equal(
            fb["clips"][0], np.concatenate([s0["clips"][0],
                                            s1["clips"][0]]))
        assert s0["clips"][0].shape[0] == 2


def test_multihost_loader_eval_padding():
    """Validation tail padding masks stay consistent across host shards."""
    full = list(_loader(train=False, n=5, batch=4))
    shards = [list(_loader(train=False, n=5, batch=4,
                           process_index=p, process_count=2))
              for p in (0, 1)]
    gmask = np.concatenate([np.concatenate([a["mask"], b["mask"]])
                            for a, b in zip(*shards)])
    np.testing.assert_array_equal(
        gmask, np.concatenate([b["mask"] for b in full]))
    assert gmask.sum() == 5


def test_multihost_loader_rejects_indivisible_batch():
    loader = _loader(train=True, n=12, batch=5, process_count=2)
    with pytest.raises(ValueError, match="not divisible"):
        next(iter(loader))


def test_synthetic_speed_mode_motion_only():
    """Speed-mode classes differ ONLY in motion: identical square colors for
    the same frame index, different displacement between frames."""
    from rspnet_tpu.data.catalogs import Synthetic
    cat = Synthetic(num_samples=4, num_classes=4, class_mode="speed",
                    num_frames=32, height=64, width=64)
    assert "speed=" in cat[0].video_path
    slow = SyntheticVideoReader(cat[0].video_path)   # cls 0, slowest
    fast = SyntheticVideoReader(cat[3].video_path)   # cls 3, fastest
    f_slow = slow.get_batch([0, 4])
    f_fast = fast.get_batch([0, 4])
    # identical color palettes (class-independent)
    assert set(np.unique(f_slow)) == set(np.unique(f_fast))

    def displacement(fr):
        ys, xs = np.where(fr[..., 1] == 180)
        return np.array([ys.mean(), xs.mean()])

    d_slow = np.linalg.norm(displacement(f_slow[1]) - displacement(f_slow[0]))
    d_fast = np.linalg.norm(displacement(f_fast[1]) - displacement(f_fast[0]))
    assert d_fast > 2 * d_slow > 0


def test_synthetic_direction_mode_color_is_class_independent():
    """Direction mode must not leak the class through color."""
    a = SyntheticVideoReader("synthetic://1?frames=16&h=48&w=48&cls=1")
    b = SyntheticVideoReader("synthetic://1?frames=16&h=48&w=48&cls=7")
    fa, fb = a.get_batch([0]), b.get_batch([0])
    # same seed, same frame index => same background AND same square color;
    # only the square position may differ
    assert set(np.unique(fa)) == set(np.unique(fb))


def test_prefetch_iterator_env_override(monkeypatch):
    """RSPNET_PREFETCH=0 must bypass the producer thread entirely (poison
    on 1-CPU hosts, CLAUDE.md round-2 findings); any depth still yields the
    exact sequence."""
    from rspnet_tpu.data.pipeline import prefetch_iterator
    monkeypatch.setenv("RSPNET_PREFETCH", "0")
    assert list(prefetch_iterator(iter(range(5)))) == list(range(5))
    monkeypatch.setenv("RSPNET_PREFETCH", "3")
    assert list(prefetch_iterator(iter(range(5)))) == list(range(5))


def test_prefetch_iterator_early_exit_releases_source(monkeypatch):
    """A consumer that stops early (debug-mode break, step exception)
    must not strand the producer thread in q.put — that pinned the
    suspended loader generator and leaked its worker pool + fds every
    epoch (the accumulation that aborted the XLA CPU client mid-suite,
    CLAUDE.md round-2)."""
    import threading

    from rspnet_tpu.data.pipeline import prefetch_iterator
    monkeypatch.setenv("RSPNET_PREFETCH", "2")
    released = threading.Event()

    def src():
        try:
            for i in range(10_000):
                yield i
        finally:
            released.set()

    it = prefetch_iterator(src())
    for x in it:
        if x >= 3:
            break
    it.close()           # what GC does when the engine drops the iterator
    assert released.wait(5.0), "producer thread still pinning the source"


def test_prefetch_iterator_propagates_errors(monkeypatch):
    from rspnet_tpu.data.pipeline import prefetch_iterator
    monkeypatch.setenv("RSPNET_PREFETCH", "2")

    def boom():
        yield 1
        raise ValueError("decode failed")

    it = prefetch_iterator(boom())
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="decode failed"):
        list(it)
