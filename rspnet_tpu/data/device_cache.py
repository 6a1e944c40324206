"""Device-resident dataset cache: train from HBM, not the host link.

Materializes every sample ONCE through a wrapped VideoDataLoader (one
host decode pass + one H2D transfer per clip position), then serves
every epoch from device memory: the host draws the epoch permutation
and each batch is a batch-axis `jnp.take` out of the cached arrays.

This is the TPU-native answer to a slow/flow-controlled host->device
link (the axon tunnel sustains ~100-130 MB/s after its burst window —
CLAUDE.md) for datasets that fit in HBM: probes, ablations, debugging,
benchmarks. The reference has no equivalent (its GPU collate re-ships
every batch every epoch, datasets/classification/__init__.py:22-50).

Semantics:
- Validation caching is EXACT: eval temporal (EvenNCrop) and spatial
  (center-max crop) transforms are deterministic, so cached batches are
  bit-identical to re-loaded ones.
- Train caching freezes each sample's TEMPORAL window at cache time
  (the epoch-0 draw). Spatial crop / flip / color jitter / grayscale /
  blur all stay per-step: they run in the engine's fused device augment
  (engines/pretrain.py:_augment_clip), which with `device_geometry`
  samples fresh crop boxes every step. Epoch shuffling stays per-epoch
  (same seeding scheme as the live loader).
- Multi-host runs are refused (each process would cache only its shard;
  a global re-permutation would need cross-host exchange).

Config: `cache_device: true` (see data/pipeline.py:build_loader).
RSPNET_CACHE_LIMIT_MB (default 6144) bounds the cached bytes — a
generous fraction of a v5e's 16 GB HBM; raise it deliberately.
"""
from __future__ import annotations

import logging
import os
from typing import List

import numpy as np

logger = logging.getLogger(__name__)


class DeviceCachedLoader:
    """Wraps a VideoDataLoader; same iteration contract, batches served
    from device memory after a one-time materialization pass."""

    def __init__(self, inner, mesh=None):
        import jax
        import jax.numpy as jnp

        if inner.cfg.process_count > 1:
            raise ValueError(
                "cache_device does not support multi-host loading: each "
                "process sees only its batch shard; run with one process "
                "or disable the cache")
        self._inner = inner
        self.cfg = inner.cfg
        self.epoch = 0

        inner.set_epoch(0)
        limit_mb = float(os.environ.get("RSPNET_CACHE_LIMIT_MB", "6144"))
        clips: List[List[np.ndarray]] = [[] for _ in range(inner.cfg.num_clips)]
        labels, masks = [], []
        first = True
        # Raising mid-iteration would suspend the loader generator inside
        # its `with pool:` block and leak the worker threads/fds until GC
        # (the resource-leak class documented in CLAUDE.md) — close() the
        # iterator before letting the preflight error escape.
        it = iter(inner)
        try:
            for batch in it:
                if first:
                    # preflight: estimate the full cache from the FIRST
                    # batch before paying the whole decode pass (a too-big
                    # dataset used to fail only after minutes-hours of
                    # decoding). Per-sample bytes are uniform (static
                    # shapes).
                    b0 = batch["labels"].shape[0]
                    per_sample = sum(np.asarray(a).nbytes
                                     for a in batch["clips"]) / max(b0, 1)
                    est_mb = per_sample * inner.num_samples / 1e6
                    if est_mb > limit_mb:
                        raise ValueError(
                            f"cache_device preflight: ~{est_mb:.0f} MB "
                            f"estimated ({inner.num_samples} samples x "
                            f"{per_sample / 1e6:.1f} MB) > limit "
                            f"{limit_mb:.0f} MB (RSPNET_CACHE_LIMIT_MB); "
                            f"refusing before the full decode pass")
                    first = False
                for c, arr in enumerate(batch["clips"]):
                    clips[c].append(np.asarray(arr))
                labels.append(np.asarray(batch["labels"]))
                masks.append(np.asarray(batch["mask"]))
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()
        if not labels:
            raise ValueError("cache_device on an empty loader")
        self._labels = np.concatenate(labels)
        self._mask = np.concatenate(masks)

        host = [np.concatenate(c) for c in clips]
        total_mb = sum(a.nbytes for a in host) / 1e6
        if total_mb > limit_mb:
            raise ValueError(
                f"cache_device: dataset is {total_mb:.0f} MB > limit "
                f"{limit_mb:.0f} MB (RSPNET_CACHE_LIMIT_MB); this cache "
                f"must fit in HBM")
        logger.info("cache_device: caching %d samples (%.0f MB) on device",
                    len(self._labels), total_mb)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            put = lambda a: jax.device_put(  # noqa: E731 — replicated:
                a, NamedSharding(mesh, PartitionSpec()))  # any batch
            # gather must be able to read every row on every chip
        else:
            put = jnp.asarray
        self._cache = [put(a) for a in host]
        # settle the transfers so cache-build time isn't billed to the
        # first step (device_put is async; block_until_ready is honest
        # on CPU and at worst a no-op on the tunnel)
        for a in self._cache:
            a.block_until_ready()

    # -- loader contract ----------------------------------------------------
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    @property
    def num_samples(self) -> int:
        return self._inner.num_samples

    def num_valid_samples(self) -> int:
        return self._inner.num_valid_samples()

    def __len__(self) -> int:
        B = self.cfg.batch_size
        return len(self._labels) // B

    def _epoch_order(self) -> np.ndarray:
        n = len(self._labels)
        if self.cfg.train:
            rng = np.random.default_rng(
                self.cfg.seed * 99991 + 7 * self.epoch + 1)
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self):
        import jax.numpy as jnp

        order = self._epoch_order()
        B = self.cfg.batch_size
        for b in range(len(self)):
            idx = order[b * B:(b + 1) * B]
            dev_idx = jnp.asarray(idx, jnp.int32)
            yield {
                # batch-axis whole-sample gather: contiguous rows, NOT a
                # per-pixel gather (those are poison — CLAUDE.md)
                "clips": [jnp.take(c, dev_idx, axis=0) for c in self._cache],
                "labels": self._labels[idx],
                "mask": self._mask[idx],
            }
