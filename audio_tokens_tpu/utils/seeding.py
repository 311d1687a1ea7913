"""Deterministic seeding (reference: utils/set_seed.py:6-12).

JAX threads explicit PRNG keys everywhere, so unlike the reference (which had
to seed four global RNGs and force deterministic cuDNN) only the host-side
``random``/``numpy`` generators need global seeding; device-side randomness is
derived from :func:`key_for` so every stage gets an independent, named stream
off the same root seed.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int = 42) -> None:
    """Seed host-side global RNGs (python + numpy)."""
    random.seed(seed)
    np.random.seed(seed)


def key_for(seed: int, stage: str) -> jax.Array:
    """A per-stage PRNG key: fold a stable stage hash into the root seed.

    Keeps stages independent (fixing SURVEY.md §2.7.3, where the reference's
    cluster and tokenize stages relied on accidental global-RNG coincidence to
    share conv weights — here shared weights come from sharing a stage name).
    """
    root = jax.random.key(seed)
    # Stable (non-salted) string hash; python's hash() is salted per-process.
    h = 2166136261
    for ch in stage.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(root, h)
