"""Pallas LSTM sequence kernel vs the XLA scan path (interpret mode on CPU):
forward values, gradients through the custom VJP, masking, both directions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_tokens_tpu.models.lstm import SimpleLSTMTokenClassifier

B, T, E, H, C, V = 8, 24, 16, 128, 7, 50  # pallas-aligned dims (B%8, H%128)


def _models():
    kw = dict(vocab_size=V, embed_dim=E, hidden_dim=H, num_layers=1,
              num_classes=C)
    return (SimpleLSTMTokenClassifier(lstm_backend="xla", **kw),
            SimpleLSTMTokenClassifier(lstm_backend="pallas_interpret", **kw))


def _data(rng, lengths=False):
    toks = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    lens = jnp.asarray(rng.integers(3, T + 1, (B,)), jnp.int32) if lengths else None
    labels = jnp.asarray((rng.random((B, C)) < 0.3), jnp.float32)
    return toks, lens, labels


def test_forward_matches_scan(rng):
    xla, pallas = _models()
    toks, _, _ = _data(rng)
    params = xla.init(jax.random.key(0), toks, lengths=None,
                      deterministic=True)["params"]
    a = xla.apply({"params": params}, toks, lengths=None, deterministic=True)
    b = pallas.apply({"params": params}, toks, lengths=None, deterministic=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                               rtol=1e-5)


def test_forward_matches_scan_masked(rng):
    xla, pallas = _models()
    toks, lens, _ = _data(rng, lengths=True)
    params = xla.init(jax.random.key(1), toks, lengths=lens,
                      deterministic=True)["params"]
    a = xla.apply({"params": params}, toks, lengths=lens, deterministic=True)
    b = pallas.apply({"params": params}, toks, lengths=lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                               rtol=1e-5)


def test_gradients_match_scan(rng):
    """The hand-written VJP must agree with XLA autodiff through the scan."""
    xla, pallas = _models()
    toks, lens, labels = _data(rng, lengths=True)
    params = xla.init(jax.random.key(2), toks, lengths=lens,
                      deterministic=True)["params"]

    def loss(model, p):
        logits = model.apply({"params": p}, toks, lengths=lens,
                             deterministic=True)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    la, ga = jax.value_and_grad(lambda p: loss(xla, p))(params)
    lb, gb = jax.value_and_grad(lambda p: loss(pallas, p))(params)
    assert abs(float(la) - float(lb)) < 1e-6
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, leaf_a in flat_a:
        leaf_b = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(leaf_b), np.asarray(leaf_a), atol=2e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_training_step_trajectory_matches_scan(rng):
    """A few AdamW steps on both backends stay numerically aligned."""
    xla, pallas = _models()
    toks, _, labels = _data(rng)
    params = xla.init(jax.random.key(3), toks, lengths=None,
                      deterministic=True)["params"]
    opt = optax.adamw(1e-3)

    def run(model):
        p = params
        s = opt.init(p)
        losses = []
        for _ in range(4):
            def loss_fn(q):
                logits = model.apply({"params": q}, toks, lengths=None,
                                     deterministic=True)
                return optax.sigmoid_binary_cross_entropy(logits, labels).mean()
            l, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s, p)
            p = optax.apply_updates(p, u)
            losses.append(float(l))
        return losses

    np.testing.assert_allclose(run(pallas), run(xla), atol=5e-5)


def test_unaligned_dims_fall_back_to_scan(rng):
    """backend='pallas' with unaligned shapes must still work (scan path)."""
    m = SimpleLSTMTokenClassifier(vocab_size=V, embed_dim=10, hidden_dim=24,
                                  num_layers=1, num_classes=C,
                                  lstm_backend="pallas")
    toks = jnp.asarray(rng.integers(0, V, (5, 11)), jnp.int32)
    params = m.init(jax.random.key(4), toks, lengths=None,
                    deterministic=True)["params"]
    out = m.apply({"params": params}, toks, lengths=None, deterministic=True)
    assert np.isfinite(np.asarray(out)).all()
