"""Embedding lookup with a GEMM backward pass.

The forward of an embedding is a gather (fast on TPU); its backward is a
scatter-add over the table, which TPUs execute serially — measured at
4.3 ms of the 31.6 ms B=64 T=1728 LSTM train step.  This op keeps the
gather forward and replaces the backward with a one-hot GEMM:

    dtable = one_hot(tokens).T @ dout        (V, N) x (N, E) on the MXU

run at f32-HIGHEST so the gradient equals the scatter-add up to summation
order.  Worth it whenever N = B*T >> V (always true here: 110k tokens vs a
500-16k vocabulary).

Memory: the (N, V) float32 one-hot is transient but real if XLA doesn't fuse
it into the dot operand — at the 16k north-star vocab with N = 64*1728 that
would be ~7.2 GB of HBM.  The backward therefore chunks the one-hot GEMM over
the N axis (``lax.scan`` with an f32 accumulator) so the live one-hot never
exceeds ``_ONEHOT_BUDGET_ELEMS`` elements (~256 MB) at any vocabulary size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Max elements of the transient (chunk, V) one-hot per scan step (f32):
# 1<<26 elements = 256 MB.  At V=500 the whole N=110k batch fits in one
# chunk (no scan overhead); at V=16384 the chunk is 4096 rows.
_ONEHOT_BUDGET_ELEMS = 1 << 26


@jax.custom_vjp
def embed_lookup(table: jax.Array, tokens: jax.Array) -> jax.Array:
    """table (V, E) float, tokens (...,) int -> (..., E) embeddings."""
    return table[tokens]


def _embed_fwd(table, tokens):
    return table[tokens], (tokens, table.shape[0])


def _onehot_gemm(flat_tok, flat_d, vocab):
    oh = jax.nn.one_hot(flat_tok, vocab, dtype=jnp.float32)
    return jax.lax.dot_general(
        oh, flat_d, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _embed_bwd(res, dout):
    tokens, vocab = res
    e = dout.shape[-1]
    flat_tok = tokens.reshape(-1)
    flat_d = dout.reshape(-1, e)
    n = flat_tok.shape[0]
    chunk = max(128, _ONEHOT_BUDGET_ELEMS // max(vocab, 1))
    if n <= chunk:
        return _onehot_gemm(flat_tok, flat_d, vocab), None

    # chunked accumulation: pad N up with token 0 / zero grads (zero rows of
    # dout contribute nothing to the GEMM, so padding is exact)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        flat_tok = jnp.pad(flat_tok, (0, n_pad - n))
        flat_d = jnp.pad(flat_d, ((0, n_pad - n), (0, 0)))
    tok_chunks = flat_tok.reshape(-1, chunk)
    d_chunks = flat_d.reshape(-1, chunk, e)

    def body(acc, td):
        t, d = td
        return acc + _onehot_gemm(t, d, vocab), None

    dtable, _ = jax.lax.scan(
        body, jnp.zeros((vocab, e), jnp.float32), (tok_chunks, d_chunks)
    )
    return dtable, None  # integer tokens carry no gradient


embed_lookup.defvjp(_embed_fwd, _embed_bwd)
