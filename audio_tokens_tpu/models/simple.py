"""Mean-pool token classifier (reference: models/simple_token_classifier.py:8-16).

Embedding -> temporal mean pool -> linear head.  The reference pools with
``AdaptiveAvgPool1d(1)`` over the *padded* sequence (its attention masks are
degenerate — SURVEY.md §2.7.1); with ``lengths=None`` this module reproduces
that exactly, while passing true lengths gives the fixed masked mean.

TPU formulation: mean-of-gathered-embeddings is algebraically a token-count
GEMM — ``pooled = (counts @ table) / denom`` where ``counts[b, v]`` is how
often token v appears in clip b.  The gather's backward pass is a scatter-add
over the embedding table, which TPUs execute serially; the count GEMM keeps
both directions on the MXU (measured 5.2 -> 1.9 ms per B=64 T=1728 train
step on v5e).  One-hot buffers are bf16 (halves the HBM traffic); count
accumulation and the GEMM stay f32, so counts are exact integers.

The (B, T, V) one-hot is only a win while it is small: at the 16k north-star
vocabulary it would be ~3.5 GB per forward, so vocabularies above
``_COUNT_GEMM_V_MAX`` fall back to the gather + masked-mean formulation
(whose backward uses the chunked one-hot GEMM in ``ops/embed.py`` — bounded
memory at any V).  Both paths share the same param tree.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio_tokens_tpu.ops.embed import embed_lookup

# Above this vocabulary the (B, T, V) one-hot outweighs the scatter-add it
# avoids: at B=64, T=1728 a bf16 one-hot is V * 216 KB (500 -> 108 MB fine,
# 16384 -> 3.5 GB not).
_COUNT_GEMM_V_MAX = 2048


class SimpleTokenClassifier(nn.Module):
    vocab_size: int
    hidden_size: int
    num_classes: int

    @nn.compact
    def __call__(self, tokens, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # identity gather materializes the table with the same param tree
        # ({'embedding': {'embedding': ...}}) as the gather formulation
        table = nn.Embed(self.vocab_size, self.hidden_size, name="embedding")(
            jnp.arange(self.vocab_size)
        )
        if self.vocab_size > _COUNT_GEMM_V_MAX:
            pooled = self._gather_mean_pool(table, tokens, lengths)
            return nn.Dense(self.num_classes, name="classifier")(pooled)
        oh = jax.nn.one_hot(tokens, self.vocab_size, dtype=jnp.bfloat16)
        if lengths is None:
            # reference semantics: mean over the full padded length (pad
            # token 0 contributes its real embedding — quirk §2.7.2)
            counts = oh.sum(axis=1, dtype=jnp.float32)  # (B, V), exact ints
            denom = jnp.float32(tokens.shape[1])
        else:
            t = jnp.arange(tokens.shape[1])[None, :, None]
            mask = (t < lengths[:, None, None]).astype(oh.dtype)
            counts = (oh * mask).sum(axis=1, dtype=jnp.float32)
            denom = jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)
        pooled = jnp.dot(
            counts, table, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) / denom
        return nn.Dense(self.num_classes, name="classifier")(pooled)

    @staticmethod
    def _gather_mean_pool(table, tokens, lengths):
        """Large-vocab path: gather embeddings (chunked-GEMM backward) and
        mean-pool — O(B*T*E) memory, independent of V."""
        emb = embed_lookup(table, tokens)  # (B, T, E)
        if lengths is None:
            return emb.mean(axis=1)
        t = jnp.arange(tokens.shape[1])[None, :, None]
        mask = (t < lengths[:, None, None]).astype(emb.dtype)
        denom = jnp.maximum(lengths[:, None].astype(jnp.float32), 1.0)
        return (emb * mask).sum(axis=1) / denom
