"""Bidirectional LSTM token classifier
(reference: models/simple_lstm_token_classifier.py:10-43: Embedding(vocab,256)
-> packed biLSTM(256, 512, num_layers) -> concat last fwd/bwd hidden -> ReLU
-> dropout -> Linear(1024, num_classes)).

TPU-native recurrence: cuDNN's packed-sequence LSTM becomes a time-major
``lax.scan`` whose per-step work is a single fused (B, E+H) x (E+H, 4H) gate
GEMM.  Variable lengths are handled with masked carries instead of packing —
at step t a sequence past its length passes its state through unchanged, so
the final forward carry equals the state at t = len-1 and the backward scan
(from T-1 down) ignores the padding it starts in.  With ``lengths=None`` the
mask is all-ones, reproducing the reference's degenerate-mask behavior
(SURVEY.md §2.7.1).

``use_precomputed_embeddings`` (raw STFT frames instead of token IDs,
reference :26-31) is supported by passing float inputs of shape (B, T, D):
they bypass the embedding table through a width-matching projection-free path
(D must equal embed_dim, as in the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_step(w_hh):
    """One masked LSTM step over precomputed input gates (torch gate order).

    carry = (h, c); inp = (gates_x (B, 4H), mask (B, 1)).  Past a sequence's
    end (mask 0) the state passes through unchanged, so the final carry
    equals the state at t = len-1.
    """

    def step(carry, inp):
        h_prev, c_prev = carry
        gates_x, mt = inp
        gates = gates_x + h_prev @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c_prev + i * g
        h_new = o * jnp.tanh(c)
        h_out = mt * h_new + (1 - mt) * h_prev
        c_out = mt * c + (1 - mt) * c_prev
        return (h_out, c_out), h_out

    return step


class LSTMLayer(nn.Module):
    """One direction, one layer; returns (all hidden states, final (h, c)).

    ``unroll=8``: the per-step work (one (B, H) x (H, 4H) gate GEMM + VPU
    activations) is small enough that XLA while-loop per-iteration overhead
    dominates; unrolling 8 steps per loop iteration measured 92 -> 70 ms per
    B=64, T=1728 train step on v5e (unroll 16/32, bf16 gates, and fusing
    both directions into one scan all measured slower — see BASELINE.md).

    ``remat_chunk > 0`` rematerializes the recurrence in time chunks of that
    size: the scan runs as an outer scan over chunks whose body — the input
    gate GEMM plus ``remat_chunk`` recurrence steps — is wrapped in
    ``jax.checkpoint``, so the backward pass stores only the (h, c) carries
    at chunk boundaries (plus this layer's input) instead of every step's
    gate activations, and recomputes each chunk's forward during backprop.
    Residual HBM per direction drops from ~6·T·B·H floats to ~(T/S)·2·B·H +
    one transient chunk, at ~one extra forward of compute in the backward —
    the classic remat trade that lets vmapped LSTM ensembles stack many
    members (train/ensemble.py; a K=4 ensemble at B=64/T=1728/H=512 OOMed
    at 22.8 GB without it).  Numerics are unchanged (same ops, same order).
    Remat forces the scan path (the Pallas sequence kernel saves the same
    per-step residuals remat exists to avoid).
    """

    hidden_dim: int
    reverse: bool = False
    unroll: int = 8
    backend: str = "xla"  # 'xla' scan | 'pallas' sequence kernel | 'pallas_interpret'
    remat_chunk: int = 0

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, T, E) float; mask: (B, T) 1.0 where t < length
        b, t, e = x.shape
        h = self.hidden_dim
        # torch nn.LSTM init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases
        bound = 1.0 / jnp.sqrt(h)
        init = nn.initializers.uniform(scale=2 * bound)

        def shifted(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - bound

        w_ih = self.param("w_ih", shifted, (e, 4 * h))
        w_hh = self.param("w_hh", shifted, (h, 4 * h))
        bias = self.param("bias", shifted, (4 * h,))

        if self.remat_chunk > 0:
            return self._remat_scan(x, mask, w_ih, w_hh, bias)

        xg = jnp.einsum("bte,eg->btg", x, w_ih) + bias  # precompute input gates
        xg = jnp.swapaxes(xg, 0, 1)  # time-major (T, B, 4H)

        # hardware-tile alignment: oddly-shaped configs fall back to the scan
        aligned = b % 8 == 0 and h % 128 == 0
        if self.backend == "pallas_interpret" or (
            self.backend == "pallas" and aligned
        ):
            from audio_tokens_tpu.ops.pallas_lstm import lstm_sequence

            hs, h_last = lstm_sequence(
                xg, jnp.swapaxes(mask, 0, 1), w_hh, self.reverse,
                jax.lax.Precision.DEFAULT,  # matches the scan's gate GEMMs
                self.backend == "pallas_interpret",
            )
            return jnp.swapaxes(hs, 0, 1), h_last

        m = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (T, B, 1)

        init_carry = (
            jnp.zeros((b, h), x.dtype),
            jnp.zeros((b, h), x.dtype),
        )
        (h_last, _), hs = jax.lax.scan(
            _lstm_step(w_hh), init_carry, (xg, m), reverse=self.reverse,
            unroll=self.unroll,
        )
        return jnp.swapaxes(hs, 0, 1), h_last  # (B, T, H), (B, H)

    def _remat_scan(self, x, mask, w_ih, w_hh, bias):
        """Chunked-remat recurrence (see class docstring).  Time is padded to
        a chunk multiple with mask-0 steps — pass-through semantics make the
        padding inert in both directions — and each chunk recomputes its own
        input-gate GEMM inside the checkpoint, so even the (T, B, 4H) ``xg``
        precompute never persists as a residual (only this layer's (B, T, E)
        input does)."""
        b, t, e = x.shape
        h = self.hidden_dim
        s = min(self.remat_chunk, t)
        n_chunks = -(-t // s)
        t_pad = n_chunks * s
        xs = jnp.swapaxes(x, 0, 1)  # (T, B, E)
        m = jnp.swapaxes(mask, 0, 1)[:, :, None]  # (T, B, 1)
        if t_pad != t:
            xs = jnp.pad(xs, ((0, t_pad - t), (0, 0), (0, 0)))
            m = jnp.pad(m, ((0, t_pad - t), (0, 0), (0, 0)))
        xs = xs.reshape(n_chunks, s, b, e)
        m = m.reshape(n_chunks, s, b, 1)
        step = _lstm_step(w_hh)

        # prevent_cse=False: JAX documents CSE prevention as unnecessary (and
        # costly) for checkpoint bodies inside lax.scan, which this is
        @partial(jax.checkpoint, prevent_cse=False)
        def chunk(carry, inp):
            xc, mc = inp
            xg = jnp.einsum("tbe,eg->tbg", xc, w_ih) + bias
            return jax.lax.scan(step, carry, (xg, mc),
                                reverse=self.reverse, unroll=self.unroll)

        init_carry = (
            jnp.zeros((b, h), x.dtype),
            jnp.zeros((b, h), x.dtype),
        )
        (h_last, _), hs = jax.lax.scan(chunk, init_carry, (xs, m),
                                       reverse=self.reverse)
        hs = hs.reshape(t_pad, b, h)[:t]
        return jnp.swapaxes(hs, 0, 1), h_last  # (B, T, H), (B, H)


class SimpleLSTMTokenClassifier(nn.Module):
    vocab_size: int
    embed_dim: int
    hidden_dim: int
    num_layers: int
    num_classes: int
    dropout: float = 0.0
    lstm_backend: str = "xla"
    remat_chunk: int = 0

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        if jnp.issubdtype(x.dtype, jnp.integer):
            from audio_tokens_tpu.ops.embed import embed_lookup

            # identity gather materializes the table (same param tree as a
            # plain Embed); embed_lookup swaps the serial scatter-add
            # backward for a one-hot GEMM (ops/embed.py)
            table = nn.Embed(self.vocab_size, self.embed_dim,
                             name="embedding")(jnp.arange(self.vocab_size))
            emb = embed_lookup(table, x)
        else:
            emb = x  # use_precomputed_embeddings path
        b, t = emb.shape[:2]
        if lengths is None:
            mask = jnp.ones((b, t), emb.dtype)
        else:
            mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(emb.dtype)

        h_fwd = h_bwd = None
        inp = emb
        for layer in range(self.num_layers):
            fwd_hs, h_fwd = LSTMLayer(self.hidden_dim, reverse=False,
                                      backend=self.lstm_backend,
                                      remat_chunk=self.remat_chunk,
                                      name=f"lstm_l{layer}_fwd")(inp, mask)
            bwd_hs, h_bwd = LSTMLayer(self.hidden_dim, reverse=True,
                                      backend=self.lstm_backend,
                                      remat_chunk=self.remat_chunk,
                                      name=f"lstm_l{layer}_bwd")(inp, mask)
            inp = jnp.concatenate([fwd_hs, bwd_hs], axis=-1)

        last = jnp.concatenate([h_fwd, h_bwd], axis=-1)  # (B, 2H)
        last = nn.relu(last)
        last = nn.Dropout(self.dropout, deterministic=deterministic)(last)
        return nn.Dense(self.num_classes, name="fc")(last)
