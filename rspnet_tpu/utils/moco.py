"""MoCo queue-size fixup (reference: utils/moco.py:8-21).

The queue length K must be a multiple of the global batch so the ring
buffer advances cleanly; on TPU this is a hard requirement — XLA's
dynamic_update_slice clamps out-of-range writes SILENTLY, corrupting the
queue (verified live), where the reference merely asserted.
"""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def trim_moco_k(k: int, global_batch_size: int,
                model_parallel: int = 1) -> int:
    """Largest K' <= K with K' a multiple of global_batch * model_parallel.

    With a K-sharded queue (moco/sharded_queue.py) every enqueue must land
    wholly inside ONE of the ``model_parallel`` shards, so K/M must itself
    be a multiple of the global batch — i.e. K a multiple of B*M.
    """
    quantum = global_batch_size * model_parallel
    return k - k % quantum


def replace_moco_k_in_config(cfg, global_batch_size: int,
                             model_parallel: int = 1) -> None:
    k = cfg.get_int("moco.k")
    new_k = trim_moco_k(k, global_batch_size, model_parallel)
    if new_k != k:
        logger.warning("moco.k trimmed %d -> %d (global batch %d, "
                       "model-parallel %d)", k, new_k, global_batch_size,
                       model_parallel)
    if new_k <= 0:
        raise ValueError(
            f"moco.k={k} smaller than global batch {global_batch_size} x "
            f"model-parallel {model_parallel}")
    cfg.put("moco.k", new_k)
