"""Chunked-remat LSTM (models/lstm.py LSTMLayer.remat_chunk).

``jax.checkpoint`` over time chunks must be a pure memory/compute trade:
forward outputs, gradients, and full AdamW/BCE training trajectories have to
match the plain scan — including variable lengths, a chunk size that does not
divide T, both directions (the model is bidirectional), and the vmapped
ensemble formulation that motivates the feature (train/ensemble.py: a K=4
lstm ensemble at reference default shapes OOMs without remat).

Replaces nothing in the reference (cuDNN LSTM keeps all residuals:
reference models/simple_lstm_token_classifier.py:11-17); this is the
TPU-native memory lever for stacking ensemble members.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models import get_model
from audio_tokens_tpu.utils.seeding import key_for

B, T, VOCAB, NCLS = 4, 50, 37, 11


def _cfg(**kw):
    base = dict(
        model_type="lstm", vocab_size=VOCAB, num_classes=NCLS,
        lstm_embed_dim=16, lstm_hidden_dim=24, num_layers=1,
        lstm_backend="xla", reference_compat=False,
    )
    base.update(kw)
    return AudioTokensConfig(**base)


def _data(seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (B, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, T + 1, (B,)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, (B, NCLS)), jnp.float32)
    return tokens, lengths, labels


@pytest.mark.parametrize("chunk", [7, 16, 50, 128])
def test_forward_and_grads_match_plain_scan(chunk):
    """remat_chunk covers: non-divisor of T (7, 16), exact T (50), and
    chunk > T (clamped)."""
    tokens, lengths, labels = _data()
    plain = get_model(_cfg())
    remat = get_model(_cfg(lstm_remat_chunk=chunk))
    params = plain.init(key_for(0, "model_init"), tokens, lengths=lengths)

    def loss(model, p):
        logits = model.apply(p, tokens, lengths=lengths)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        ), logits

    (l0, logits0), g0 = jax.jit(
        jax.value_and_grad(lambda p: loss(plain, p), has_aux=True))(params)
    (l1, logits1), g1 = jax.jit(
        jax.value_and_grad(lambda p: loss(remat, p), has_aux=True))(params)
    np.testing.assert_allclose(logits1, logits0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l1, l0, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6)


def test_degenerate_mask_path():
    """reference_compat (lengths=None, all-ones mask) through the remat path."""
    tokens, _, _ = _data(1)
    plain = get_model(_cfg())
    remat = get_model(_cfg(lstm_remat_chunk=13))
    params = plain.init(key_for(0, "model_init"), tokens)
    out0 = jax.jit(lambda p: plain.apply(p, tokens))(params)
    out1 = jax.jit(lambda p: remat.apply(p, tokens))(params)
    np.testing.assert_allclose(out1, out0, rtol=1e-6, atol=1e-6)


def test_ensemble_trajectory_matches_without_remat(tmp_path):
    """The motivating formulation: vmapped members (train/ensemble.py) train
    the same trajectory with and without remat."""
    from audio_tokens_tpu.train.ensemble import EnsembleTrainer

    tokens, lengths, labels = _data(2)
    reports = []
    for chunk in (0, 16):
        cfg = _cfg(lstm_remat_chunk=chunk, epochs=2, training_batch_size=2,
                   eval_batch_size=2, learning_rate=3e-3,
                   save_best_checkpoint=False,
                   base_dir=str(tmp_path / f"out{chunk}"))
        tr = EnsembleTrainer(cfg, n_models=2)
        for split in ("train", "validation"):
            tr.set_corpus_arrays(split, np.asarray(tokens),
                                 np.asarray(lengths), np.asarray(labels),
                                 n_real=B, batch_size=2)
        params, opt_state = tr.init_state()
        step = 0
        hist = []
        for epoch in range(cfg.epochs):
            params, opt_state, step, tr_loss, _, _ = tr.train_epoch(
                params, opt_state, epoch, step)
            va_loss, va_map, ens = tr.eval_epoch(params)
            hist.append((tr_loss, va_loss, va_map, ens))
        reports.append(hist)
    for (tl0, vl0, vm0, e0), (tl1, vl1, vm1, e1) in zip(*reports):
        np.testing.assert_allclose(tl1, tl0, rtol=1e-5)
        np.testing.assert_allclose(vl1, vl0, rtol=1e-5)
        np.testing.assert_allclose(vm1, vm0, rtol=1e-5)
        assert abs(e1 - e0) < 1e-5


def test_explicit_pallas_with_remat_rejected():
    """An explicit Pallas backend request must not silently run the remat
    scan (ADVICE r4: the remat check precedes the backend branch)."""
    for backend in ("pallas", "pallas_interpret"):
        with pytest.raises(ValueError, match="lstm_remat_chunk"):
            get_model(_cfg(lstm_backend=backend, lstm_remat_chunk=8))
    # 'auto' and 'xla' remain valid with remat
    get_model(_cfg(lstm_backend="auto", lstm_remat_chunk=8))
    get_model(_cfg(lstm_backend="xla", lstm_remat_chunk=8))
