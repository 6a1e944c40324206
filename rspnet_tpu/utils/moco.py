"""MoCo queue-size fixup (reference: utils/moco.py:8-21).

The queue length K must be a multiple of the global batch so the ring
buffer advances cleanly; on TPU this is a hard requirement — XLA's
dynamic_update_slice clamps out-of-range writes SILENTLY, corrupting the
queue (verified live), where the reference merely asserted.
"""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def trim_moco_k(k: int, global_batch_size: int) -> int:
    return k - k % global_batch_size


def replace_moco_k_in_config(cfg, global_batch_size: int) -> None:
    k = cfg.get_int("moco.k")
    new_k = trim_moco_k(k, global_batch_size)
    if new_k != k:
        logger.warning("moco.k trimmed %d -> %d (global batch %d)",
                       k, new_k, global_batch_size)
    if new_k <= 0:
        raise ValueError(
            f"moco.k={k} smaller than global batch {global_batch_size}")
    cfg.put("moco.k", new_k)
