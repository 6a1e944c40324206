"""Export our pretrain checkpoints to the reference torch layout.

Completes the bidirectional checkpoint contract (SURVEY.md §5.4): the
reference's finetune.py expects flat torch state dicts with
'encoder_q.encoder.*' / 'encoder_q.fc{1,2}.*' keys inside
{'model': ..., 'arch': ..., 'epoch': ...} (reference: finetune.py:277,
retrieval.py:88). torch_bridge handles the backbone tensors; this module
adds the wrapper-level prefixes and head layers.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import numpy as np

from ..framework.checkpoint import load_state, save_state
from ..models.torch_bridge import flax_to_torch

logger = logging.getLogger(__name__)


def _head_to_torch(head_params: dict, prefix: str) -> Dict[str, np.ndarray]:
    """LinearFc/MlpFc flax head -> torch Sequential layout.

    Reference linear head = Sequential(AvgPool, Flatten, Linear) so the
    linear layer is index 2 (reference: split_wrapper.py:163-169); mlp head
    has Linear at 2 and 4 (:171-179).
    """
    out = {}
    if set(head_params) == {"linear"}:
        k = np.asarray(head_params["linear"]["kernel"])
        b = np.asarray(head_params["linear"]["bias"])
        out[f"{prefix}.2.weight"] = k.T
        out[f"{prefix}.2.bias"] = b
    elif set(head_params) == {"hidden", "linear"}:
        out[f"{prefix}.2.weight"] = np.asarray(
            head_params["hidden"]["kernel"]).T
        out[f"{prefix}.2.bias"] = np.asarray(head_params["hidden"]["bias"])
        out[f"{prefix}.4.weight"] = np.asarray(
            head_params["linear"]["kernel"]).T
        out[f"{prefix}.4.bias"] = np.asarray(head_params["linear"]["bias"])
    else:
        logger.warning("Unrecognized head layout %s; skipping %s",
                       sorted(head_params), prefix)
    return out


def export_reference_checkpoint(src: Path, dst: Path, arch: str = None) -> dict:
    """Convert an rspnet_tpu pretrain checkpoint to reference torch format.

    Produces {'epoch', 'arch', 'model': flat state dict with encoder_q./
    encoder_k. prefixes incl. queue buffers, 'best_loss'}.
    """
    cp = load_state(src)
    if not (isinstance(cp.get("model"), dict) and "params_q" in cp["model"]):
        raise ValueError(f"{src} is not an rspnet_tpu pretrain checkpoint")
    arch = arch or cp["arch"]
    m = cp["model"]

    flat: Dict[str, np.ndarray] = {}
    for enc, params_key, stats_key in (
            ("encoder_q", "params_q", "batch_stats_q"),
            ("encoder_k", "params_k", "batch_stats_k")):
        variables = {"params": m[params_key]["encoder"],
                     "batch_stats": m[stats_key]["encoder"]}
        for k, v in flax_to_torch(variables, arch).items():
            flat[f"{enc}.encoder.{k}"] = v
        for head in ("fc1", "fc2"):
            if head in m[params_key]:
                flat.update(_head_to_torch(m[params_key][head],
                                           f"{enc}.{head}"))

    flat["queue"] = np.asarray(m["queue"])
    # reference registers queue_ptr as torch.zeros(1) (builder:361): shape
    # must be exactly (1,) regardless of how ours was serialized
    flat["queue_ptr"] = np.reshape(
        np.asarray(m["queue_ptr"], dtype=np.int64), (1,))

    out = {
        "epoch": cp.get("epoch", 0),
        "arch": arch,
        "model": flat,
        "best_loss": cp.get("best_loss", float("inf")),
    }
    save_state(out, dst)
    logger.info("Exported reference-format checkpoint: %s (%d tensors)",
                dst, len(flat))
    return out
