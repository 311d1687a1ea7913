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


# flash kernel block width (sequence padded up to a multiple of this)
_FLASH_BLOCK = 256


class FlashSelfAttention(nn.Module):
    """Self-attention with flax MHDPA's exact parameter tree (DenseGeneral
    query/key/value/out — checkpoints and torch transplants interchange) but
    the score/softmax/value contraction runs as the Pallas flash kernel: the
    (B, h, T, T) score matrix never touches HBM.  MEASURED UNPROFITABLE
    inside the full model on v5e (interleaved in-process A/B, BASELINE.md:
    fwd 1.33x SLOWER at B=8/T=1728, 1.47x at B=32 — XLA's fused attention
    beats the kernel at these shapes despite the kernel winning a
    standalone microbench), so registry 'auto' never routes here; the
    module remains an explicit opt-in for other shapes/hardware.

    Padding/masking ride the kernel's segment ids: the sequence pads up to
    a _FLASH_BLOCK multiple, pad positions (and positions beyond each row's
    ``lengths``) get segment 1 vs the valid tokens' 0, so valid queries
    never attend them; pad rows are sliced off after.

    The kernel has no attention-probability dropout and its backward with
    segment ids measured slower than XLA, so the model routes here only on
    ``deterministic`` (eval / serving) passes; ``attn_fn`` is injectable so
    CPU tests can validate the projection/masking math against flax MHDPA
    exactly."""

    num_heads: int
    hidden_size: int
    compute_dtype: jnp.dtype = jnp.float32
    attn_fn: Optional[object] = None   # (q,k,v,segment_ids,sm_scale) -> out

    @nn.compact
    def __call__(self, x, lengths):
        from functools import partial

        import numpy as np

        dh = self.hidden_size // self.num_heads
        dense = partial(nn.DenseGeneral, dtype=self.compute_dtype,
                        param_dtype=jnp.float32)
        q = dense(features=(self.num_heads, dh), name="query")(x)
        k = dense(features=(self.num_heads, dh), name="key")(x)
        v = dense(features=(self.num_heads, dh), name="value")(x)
        b, t = x.shape[:2]
        t_pad = -(-t // _FLASH_BLOCK) * _FLASH_BLOCK
        pad = t_pad - t

        def heads_first(a):
            a = jnp.transpose(a, (0, 2, 1, 3))  # (B, nh, T, dh)
            return jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        pos = jnp.arange(t_pad)[None, :]
        valid = pos < (jnp.minimum(lengths, t)[:, None] if lengths is not None
                       else t)
        seg = jnp.broadcast_to(jnp.where(valid, 0, 1).astype(jnp.int32),
                               (b, t_pad))
        sm_scale = 1.0 / float(np.sqrt(dh))
        if self.attn_fn is not None:
            out = self.attn_fn(q, k, v, seg, sm_scale)
        else:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            # 256-wide blocks measured fastest at the full-clip shape
            # (library defaults measured 1.4-2.6x slower, BASELINE.md)
            bs = min(_FLASH_BLOCK, t_pad)
            blocks = BlockSizes(
                block_q=bs, block_k_major=bs, block_k=bs, block_b=1,
                block_q_major_dkv=bs, block_k_major_dkv=bs,
                block_k_dkv=bs, block_q_dkv=bs,
                block_k_major_dq=bs, block_k_dq=bs, block_q_dq=bs,
            )
            out = flash_attention(q, k, v,
                                  segment_ids=SegmentIds(q=seg, kv=seg),
                                  causal=False, sm_scale=sm_scale,
                                  block_sizes=blocks)
        out = jnp.transpose(out[:, :, :t, :], (0, 2, 1, 3))  # (B, T, nh, dh)
        return dense(features=self.hidden_size, axis=(-2, -1),
                     name="out")(out)


class EncoderBlock(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float
    compute_dtype: jnp.dtype = jnp.float32
    attention_impl: str = "xla"        # 'xla' | 'flash'
    lengths: Optional[jnp.ndarray] = None  # only consulted by 'flash'

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        # --- self attention (post-LN, BERT style) ---
        if self.attention_impl == "flash":
            attn = FlashSelfAttention(
                num_heads=self.num_heads, hidden_size=self.hidden_size,
                compute_dtype=self.compute_dtype, name="attention",
            )(x, self.lengths)
        else:
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
    # 'xla' (materializing flax MHDPA) or 'flash' (Pallas kernel opt-in,
    # TPU only, deterministic passes; measured slower in-model on v5e —
    # registry 'auto' resolves to 'xla', see BASELINE.md).
    attention_impl: str = "xla"
    # sequence parallelism: a mesh with a 'sequence' axis; activations are
    # constrained to (data, sequence, None) at block boundaries (no-op None)
    sp_mesh: Optional[Mesh] = None
    # Rematerialize each encoder block (jax.checkpoint via nn.remat): the
    # backward stores only block-boundary activations (B, T, H) and
    # recomputes the block forward — including the (B, heads, T, T)
    # attention scores, the O(T^2) residual that dominates full-clip
    # training memory — during backprop.  Numerics unchanged; ~one extra
    # forward of compute.  The lever for big-batch training at
    # max_position = max_seq_len (full-clip attention).
    remat_blocks: bool = False

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

        impl = self.attention_impl
        if impl == "flash" and not deterministic:
            # training steps keep XLA attention: the flash kernel has no
            # attention-prob dropout, and its BACKWARD with segment ids
            # measured ~1.3x slower than XLA at the full-clip shape
            # (BASELINE.md) — the kernel's win is the forward, i.e. eval
            # epochs and serving
            impl = "xla"
        num_heads = max(1, self.hidden_size // 64)
        # deterministic is arg 3 of EncoderBlock.__call__ (self counts as 0)
        block_cls = (nn.remat(EncoderBlock, static_argnums=(3,))
                     if self.remat_blocks else EncoderBlock)
        for i in range(self.num_layers):
            x = self._sp(block_cls(
                self.hidden_size, num_heads, self.dropout,
                compute_dtype=self.compute_dtype, attention_impl=impl,
                lengths=lengths, name=f"layer_{i}",
            )(x, attn_mask, deterministic))

        cls = x[:, 0, :]  # position-0 representation, like the reference
        return nn.Dense(self.num_classes, name="classifier")(cls)
