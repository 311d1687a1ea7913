"""Mean-pool token classifier (reference: models/simple_token_classifier.py:8-16).

Embedding -> temporal mean pool -> linear head.  The reference pools with
``AdaptiveAvgPool1d(1)`` over the *padded* sequence (its attention masks are
degenerate — SURVEY.md §2.7.1); with ``lengths=None`` this module reproduces
that exactly, while passing true lengths gives the fixed masked mean.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class SimpleTokenClassifier(nn.Module):
    vocab_size: int
    hidden_size: int
    num_classes: int

    @nn.compact
    def __call__(self, tokens, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.hidden_size, name="embedding")(tokens)
        if lengths is None:
            pooled = jnp.mean(x, axis=1)
        else:
            t = jnp.arange(x.shape[1])[None, :, None]
            mask = (t < lengths[:, None, None]).astype(x.dtype)
            pooled = (x * mask).sum(axis=1) / jnp.maximum(
                lengths[:, None].astype(x.dtype), 1.0
            )
        return nn.Dense(self.num_classes, name="classifier")(pooled)
