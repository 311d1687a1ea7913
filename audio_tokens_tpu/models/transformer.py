"""BERT-style transformer encoder classifier
(reference: models/custom_bert_classifier.py:8-28 — a freshly initialized HF
``BertModel(BertConfig(vocab_size, num_hidden_layers, hidden_size))`` with
input truncated to 512 tokens and a linear head on the position-0 output).

Built in-repo (no HF dependency): learned token + position embeddings with
LayerNorm, post-LN encoder blocks (MHA -> Add&LN -> GELU MLP x4 -> Add&LN),
matching BERT-base block structure (heads = hidden/64, intermediate = 4*
hidden), exact-erf GELU and layer_norm_eps 1e-12 like HF's BertConfig
defaults — under weight transplant the forward FUNCTION matches the actual
HF ``BertModel`` stack the reference instantiated
(tests/test_torch_parity.py::test_bert_forward_logits_match_hf).  Like the
reference, no [CLS] token is inserted — "CLS output" is simply position 0
of the encoded sequence, and with the reference's degenerate all-ones masks
(``lengths=None``) attention is unmasked.

TPU notes: attention and MLP matmuls run in ``compute_dtype`` (bf16 on the
MXU) with fp32 accumulation and fp32 LayerNorm/softmax; ``TP_RULES`` maps
param paths to Megatron-style column/row shardings over a ``model`` mesh axis
(applied by ``parallel.tp_param_specs``).  ``sp_mesh`` (a mesh with a
``sequence`` axis, see ``parallel.make_mesh(seq=...)``) turns on sequence
parallelism for the full-clip mode: activations carry a
(data, sequence, None) sharding constraint at every block boundary, and XLA
inserts the gather/scatter collectives attention needs — the scaling-book
recipe (annotate, let GSPMD place collectives) rather than a hand-written
ring.  The reference has no counterpart (its long-context strategy is
truncation, custom_bert_classifier.py:21-22); SURVEY §2.6/§5 reserves the
axis.
"""

from __future__ import annotations

from typing import Optional

LN_EPS = 1e-12  # HF BertConfig layer_norm_eps — function-level parity

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Tensor-parallel partition rules: param-path substring -> PartitionSpec axes
# over the ('data', 'model') mesh.  Megatron layout: column-parallel up/QKV
# projections, row-parallel down/output projections; everything else
# replicated.  Consumed by parallel.tp_param_spec / __graft_entry__.
TP_RULES = (
    ("mlp_in/kernel", (None, "model")),
    ("mlp_in/bias", ("model",)),
    ("mlp_out/kernel", ("model", None)),
    ("attention/query/kernel", (None, None, "model")),
    ("attention/key/kernel", (None, None, "model")),
    ("attention/value/kernel", (None, None, "model")),
    ("attention/query/bias", (None, "model")),
    ("attention/key/bias", (None, "model")),
    ("attention/value/bias", (None, "model")),
    ("attention/out/kernel", (None, "model", None)),
)


class EncoderBlock(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        # --- self attention (post-LN, BERT style) ---
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.hidden_size,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="attention",
        )(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="attn_ln")(x + attn)
        # --- MLP ---
        h = nn.Dense(4 * self.hidden_size, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="mlp_in")(x)
        h = nn.gelu(h, approximate=False)  # HF BertConfig default 'gelu' = exact erf
        h = nn.Dense(self.hidden_size, dtype=self.compute_dtype,
                     param_dtype=jnp.float32, name="mlp_out")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="mlp_ln")(x + h)


class TransformerClassifier(nn.Module):
    vocab_size: int
    num_layers: int
    num_classes: int
    hidden_size: int = 768
    # 512 = reference compat (input sliced to the first 512 tokens — ~3 s of
    # a 10 s clip, custom_bert_classifier.py:21-22).  Full-clip attention is
    # the TPU-native mode: config.transformer_max_position = max_seq_len
    # attends over every frame (position-embedding table sizes to match).
    max_position: int = 512
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32
    # sequence parallelism: a mesh with a 'sequence' axis; activations are
    # constrained to (data, sequence, None) at block boundaries (no-op None)
    sp_mesh: Optional[Mesh] = None

    def _sp(self, x):
        if self.sp_mesh is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, P("data", "sequence", None)))

    @nn.compact
    def __call__(self, tokens, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        tokens = tokens[:, : self.max_position]
        if jnp.issubdtype(tokens.dtype, jnp.integer):
            b, t = tokens.shape
            from audio_tokens_tpu.ops.embed import embed_lookup

            table = nn.Embed(self.vocab_size, self.hidden_size,
                             name="tok_embed")(jnp.arange(self.vocab_size))
            x = embed_lookup(table, tokens)  # GEMM-grad backward (ops/embed.py)
        else:
            # skip-tokenization branch: raw mel frames (B, T, D) projected to
            # hidden — the transformer counterpart of the LSTM's
            # use_precomputed_embeddings path (exercises the fused STFT alone)
            b, t = tokens.shape[:2]
            x = nn.Dense(self.hidden_size, name="frame_proj")(tokens)
        pos = nn.Embed(self.max_position, self.hidden_size, name="pos_embed")(
            jnp.arange(t)[None, :]
        )
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=jnp.float32, name="embed_ln")(x + pos)
        x = self._sp(nn.Dropout(self.dropout, deterministic=deterministic)(x))

        if lengths is None:
            attn_mask = None  # reference compat: all-ones masks
        else:
            keep = jnp.arange(t)[None, :] < jnp.minimum(lengths, t)[:, None]
            attn_mask = keep[:, None, None, :]  # (B, 1, 1, T) broadcast over queries

        num_heads = max(1, self.hidden_size // 64)
        for i in range(self.num_layers):
            x = self._sp(EncoderBlock(
                self.hidden_size, num_heads, self.dropout,
                compute_dtype=self.compute_dtype, name=f"layer_{i}",
            )(x, attn_mask, deterministic))

        cls = x[:, 0, :]  # position-0 representation, like the reference
        return nn.Dense(self.num_classes, name="classifier")(cls)
