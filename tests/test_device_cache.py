"""Device-resident dataset cache (data/device_cache.py).

Validation caching must be EXACT (eval transforms are deterministic);
train caching freezes temporal windows but must keep clip<->label
alignment through per-epoch reshuffles.
"""
import numpy as np
import pytest

from rspnet_tpu.config.tree import ConfigTree
from rspnet_tpu.data.device_cache import DeviceCachedLoader
from rspnet_tpu.data.pipeline import build_loader


def _cfg(n=10, batch=2, cache=False):
    return ConfigTree.from_dict({
        "dataset": {"name": "synthetic", "num_samples": n, "num_classes": 5,
                    "num_frames": 40, "height": 48, "width": 64},
        "batch_size": batch,
        "num_workers": 1,
        "cache_device": cache,
        "temporal_transforms": {
            "size": 8,
            "strides": [{"stride": 1, "weight": 1}],
            "validate": {"stride": 1, "n_crop": 1, "final_n_crop": 2},
            "frame_rate": None,
        },
        "spatial_transforms": {"size": 32,
                               "crop_area": {"min": 0.25, "max": 1.0}},
        "validate": {"batch_size": batch},
        "final_validate": {"batch_size": batch},
    })


def _all_batches(loader, epoch=0):
    loader.set_epoch(epoch)
    return list(iter(loader))


def test_val_cache_exact():
    live = build_loader(_cfg(), "val")
    cached = build_loader(_cfg(cache=True), "val")
    assert isinstance(cached, DeviceCachedLoader)
    assert len(cached) == len(live)
    assert cached.num_valid_samples() == live.num_valid_samples()
    for bl, bc in zip(_all_batches(live), _all_batches(cached)):
        np.testing.assert_array_equal(bl["labels"], bc["labels"])
        np.testing.assert_array_equal(bl["mask"], bc["mask"])
        for cl, cc in zip(bl["clips"], bc["clips"]):
            np.testing.assert_array_equal(cl, np.asarray(cc))


def test_val_tail_padding_preserved():
    # 5 samples, batch 2 -> 3 padded batches of 2; mask marks the pad row
    live = build_loader(_cfg(n=5), "val")
    cached = build_loader(_cfg(n=5, cache=True), "val")
    assert len(cached) == len(live) == 3
    assert cached.num_valid_samples() == 5
    tails = _all_batches(cached)[-1]
    assert tails["mask"].tolist() == [True, False]


def test_train_cache_reshuffles_with_alignment():
    cached = build_loader(_cfg(cache=True), "train", vid=True)
    # map label -> set of clip fingerprints from the cache pass
    fp = {}
    for b in _all_batches(cached, epoch=0):
        for j in range(len(b["labels"])):
            key = int(np.asarray(b["clips"][0][j]).sum())
            fp.setdefault(int(b["labels"][j]), set()).add(key)
    orders = []
    for epoch in (1, 2):
        labels_seen = []
        for b in _all_batches(cached, epoch=epoch):
            for j in range(len(b["labels"])):
                lab = int(b["labels"][j])
                labels_seen.append(lab)
                # the clip rows must travel WITH their labels
                assert int(np.asarray(b["clips"][0][j]).sum()) in fp[lab]
        orders.append(labels_seen)
    assert sorted(orders[0]) == sorted(orders[1])   # same multiset
    assert orders[0] != orders[1]                   # reshuffled


def test_same_epoch_is_deterministic():
    cached = build_loader(_cfg(cache=True), "train", vid=True)
    a = [b["labels"].tolist() for b in _all_batches(cached, epoch=3)]
    b = [b["labels"].tolist() for b in _all_batches(cached, epoch=3)]
    assert a == b


def test_cache_limit_guard(monkeypatch):
    monkeypatch.setenv("RSPNET_CACHE_LIMIT_MB", "0.1")
    with pytest.raises(ValueError, match="preflight"):
        build_loader(_cfg(cache=True), "train", vid=True)


def test_cache_preflight_refuses_before_full_decode(monkeypatch):
    """A too-big dataset must fail after ONE batch, not after decoding
    everything (VERDICT r3 #7: the old guard materialized the whole
    dataset before comparing against the limit)."""
    monkeypatch.setenv("RSPNET_CACHE_LIMIT_MB", "0.1")
    inner = build_loader(_cfg(n=10), "train", vid=True)
    consumed = []
    orig_iter = type(inner).__iter__

    class Counting:
        cfg = inner.cfg
        num_samples = inner.num_samples

        def set_epoch(self, e):
            inner.set_epoch(e)

        def num_valid_samples(self):
            return inner.num_valid_samples()

        def __len__(self):
            return len(inner)

        def __iter__(self):
            for b in orig_iter(inner):
                consumed.append(1)
                yield b

    with pytest.raises(ValueError, match="preflight"):
        DeviceCachedLoader(Counting())
    assert sum(consumed) == 1   # exactly one batch decoded, then refused


def test_cache_train_only_mode():
    cfg = _cfg()
    cfg.put("cache_device", "train")
    assert isinstance(build_loader(cfg, "train", vid=True),
                      DeviceCachedLoader)
    assert not isinstance(build_loader(cfg, "val"), DeviceCachedLoader)
    cfg.put("cache_device", "everything")
    with pytest.raises(ValueError, match="cache_device"):
        build_loader(cfg, "train", vid=True)


def test_multihost_refused():
    live = build_loader(_cfg(), "train", vid=True)
    live.cfg.process_count = 2
    with pytest.raises(ValueError, match="multi-host"):
        DeviceCachedLoader(live)
