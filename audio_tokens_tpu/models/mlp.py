"""Baseline MLP over the flattened spectrogram
(reference: models/baseline_MLP_classifier.py:16-28: lazy-inferred input size
-> 512 -> 256 -> num_classes with ReLU).

The reference inferred its input width from the first batch (a torch
lazy-init quirk, SURVEY.md §2.7.7); under XLA the flattened width is static
(max_frames * n_mels) so the layers are declared up front — flax infers the
input dim at ``init`` time, giving the same architecture without the
optimizer-after-first-forward wart.

``compute_dtype`` casts activations and the dense compute to bf16 (params
stay f32; logits return f32).  Measured NEUTRAL here (3.78 f32 vs 3.81 ms
bf16, interleaved in-process A/B at B=64): fc1's (110592, 512) weight
dominates and the per-step f32->bf16 master-weight cast reads the same
bytes the bf16 GEMM saves.  The knob is kept for shape/config consistency
with the cnn/transformer families (where it measures 1.7-1.8x).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class BaselineMLPClassifier(nn.Module):
    num_classes: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # x: (B, D) already-flattened spectrogram
        cd = self.compute_dtype
        x = x.astype(cd)
        x = nn.relu(nn.Dense(512, dtype=cd, name="fc1")(x))
        x = nn.relu(nn.Dense(256, dtype=cd, name="fc2")(x))
        return nn.Dense(self.num_classes, dtype=cd,
                        name="fc3")(x).astype(jnp.float32)
