"""Baseline MLP over the flattened spectrogram
(reference: models/baseline_MLP_classifier.py:16-28: lazy-inferred input size
-> 512 -> 256 -> num_classes with ReLU).

The reference inferred its input width from the first batch (a torch
lazy-init quirk, SURVEY.md §2.7.7); under XLA the flattened width is static
(max_frames * n_mels) so the layers are declared up front — flax infers the
input dim at ``init`` time, giving the same architecture without the
optimizer-after-first-forward wart.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class BaselineMLPClassifier(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # x: (B, D) already-flattened spectrogram
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.relu(nn.Dense(256, name="fc2")(x))
        return nn.Dense(self.num_classes, name="fc3")(x)
