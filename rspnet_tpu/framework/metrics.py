"""Classification metrics (reference: framework/metrics/classification.py).

Pure JAX so they can live inside jitted eval steps; results are percentages,
matching the reference contract.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def accuracy(output: jnp.ndarray, target: jnp.ndarray,
             topk: Sequence[int] = (1,)) -> List[jnp.ndarray]:
    """Top-k accuracy in percent over the batch.

    output: [B, C] logits; target: [B] int labels.
    """
    # clamp k at C: top-C of C classes always contains the label, so e.g.
    # acc5 on a 2-class head is 100%, matching the eval-step convention
    maxk = min(max(topk), output.shape[-1])
    batch_size = target.shape[0]
    _, pred = jax.lax.top_k(output, maxk)          # [B, maxk]
    correct = (pred == target[:, None])            # [B, maxk]
    res = []
    for k in topk:
        correct_k = jnp.sum(correct[:, :min(k, maxk)].astype(jnp.float32))
        res.append(correct_k * (100.0 / batch_size))
    return res


def masked_accuracy(output: jnp.ndarray, target: jnp.ndarray,
                    mask: jnp.ndarray,
                    topk: Sequence[int] = (1,)) -> List[jnp.ndarray]:
    """accuracy() over valid rows only; mask: [B] bool.

    Used for padded validation tails (the XLA-friendly replacement for the
    reference's num_valid_samples tail cutting,
    datasets/classification/__init__.py:16-19).
    """
    maxk = min(max(topk), output.shape[-1])
    _, pred = jax.lax.top_k(output, maxk)
    correct = (pred == target[:, None]) & mask[:, None]
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    res = []
    for k in topk:
        correct_k = jnp.sum(correct[:, :min(k, maxk)].astype(jnp.float32))
        res.append(correct_k * (100.0 / denom))
    return res


def binary_accuracy(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    batch_size = target.shape[0]
    pred = output > 0.5
    correct = jnp.sum((pred == (target > 0.5)).astype(jnp.float32))
    return correct * (100.0 / batch_size)
