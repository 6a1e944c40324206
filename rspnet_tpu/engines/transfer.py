"""Checkpoint transfer surgery for --mc / retrieval loading.

Implements the reference's prefix-strip + classifier-blacklist logic
(reference: finetune.py:273-310 strips 'encoder_q.', retrieval.py:88-95
strips 'encoder_q.encoder.'; blacklist fc/linear/head/new_fc/fc8/
encoder_fuse) over BOTH checkpoint dialects:

- ours: pretrain .pth.tar holding nested pytrees
  {model: {params_q: {encoder: ..., fc1: ..., fc2: ...}, batch_stats_q: ...}}
- reference/third-party: flat torch state dicts with dotted keys, converted
  through models.torch_bridge.
"""
from __future__ import annotations

import logging
from typing import Tuple

from ..framework.checkpoint import load_state
from ..models.torch_bridge import torch_to_flax

logger = logging.getLogger(__name__)

_BLACKLIST = ("fc.", "linear", "head", "new_fc", "fc8", "encoder_fuse")


def load_pretrained_encoder(path, arch: str) -> Tuple[dict, dict]:
    """-> (encoder params, encoder batch_stats) flax trees (no classifier)."""
    cp = load_state(path)

    if isinstance(cp, dict) and "model" in cp and "arch" in cp:
        m = cp["model"]
        if isinstance(m, dict) and "params_q" in m:
            # our pretrain checkpoint: nested pytrees
            logger.info("Loading rspnet_tpu MoCo checkpoint from %s (epoch %s)",
                        path, cp.get("epoch"))
            return m["params_q"]["encoder"], m["batch_stats_q"]["encoder"]
        # reference MoCo checkpoint: flat torch keys 'encoder_q.encoder.*'
        logger.info("Loading reference MoCo checkpoint from %s (epoch %s)",
                    path, cp.get("epoch"))
        return _from_torch_flat(m, arch, prefix="encoder_q.encoder.")

    # third-party torch checkpoints (reference: finetune.py:279-291)
    logger.info("Loading third-party model from %s", path)
    state = cp.get("state_dict", cp) if isinstance(cp, dict) else cp
    first_key = next(iter(state.keys()))
    prefix = "module." if first_key.startswith("module") else ""
    return _from_torch_flat(state, arch, prefix=prefix)


def _from_torch_flat(state: dict, arch: str, prefix: str) -> Tuple[dict, dict]:
    def keep(k: str) -> bool:
        if not k.startswith(prefix):
            return False
        rest = k[len(prefix):]
        return not any(rest.startswith(b) for b in _BLACKLIST)

    stripped = {k[len(prefix):]: v for k, v in state.items() if keep(k)}
    if not stripped:
        raise ValueError(
            f"No backbone weights found under prefix {prefix!r}")
    params, stats, missing = torch_to_flax(stripped, arch, strict=False)
    # classifier keys are expected missing (they were blacklisted)
    real_missing = [k for k in missing
                    if not any(k.startswith(b.rstrip(".")) for b in _BLACKLIST)]
    if real_missing:
        logger.warning("Missing backbone keys: %s", real_missing)
    return params, stats


def merge_encoder_into(params: dict, batch_stats: dict, enc_params: dict,
                       enc_stats: dict, model_type: str) -> Tuple[dict, dict]:
    """Place pretrained encoder weights into a classifier model's trees.

    multitask: wrapper has {'encoder': ..., 'fc': ...} (fc stays random,
    reference loads with strict=False and fc missing).
    1stream: the backbone tree itself, minus its classifier.
    """
    params = dict(params)
    batch_stats = dict(batch_stats) if batch_stats else {}
    if model_type == "multitask":
        params["encoder"] = enc_params
        batch_stats["encoder"] = enc_stats
        return params, batch_stats
    # 1stream: overlay everything except classifier heads
    for k, v in enc_params.items():
        if k not in ("fc", "linear", "head", "new_fc"):
            params[k] = v
    for k, v in (enc_stats or {}).items():
        batch_stats[k] = v
    return params, batch_stats
