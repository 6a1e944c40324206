"""Reproducibility: seed host RNGs and derive the root JAX key
(reference: framework/utils/reproduction.py:29-39; pretrain seeds seed+rank
per worker at pretrain.py:267 — here ranks are JAX processes)."""
from __future__ import annotations

import random
from typing import Optional

import numpy as np


def initialize_seed(seed: Optional[int], rank: Optional[int] = None):
    """Seed python/numpy and return the root jax.random key.

    The reference entangles python/numpy/torch RNGs per rank (reference
    pretrain.py:267 seeds seed+rank); we keep host RNGs for the data
    pipeline and hand the compiled step a jax PRNG key (split per-step
    inside the train loop). ``rank`` defaults to ``jax.process_index()``
    so multi-host processes draw DIFFERENT augmentation streams — an
    identical seed on every host would duplicate crop/flip/jitter draws
    across corresponding global-batch positions.
    """
    import jax

    if rank is None:
        rank = jax.process_index()
    if seed is None:
        seed = random.SystemRandom().randrange(2 ** 31)
    effective = seed + rank
    random.seed(effective)
    np.random.seed(effective % (2 ** 32))
    return jax.random.PRNGKey(effective)
