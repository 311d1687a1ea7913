"""Transformer attention-window knob (config.transformer_max_position).

The reference slices every clip to its first 512 tokens
(reference: models/custom_bert_classifier.py:21-22) — that stays the default
for parity.  SURVEY.md §5 names full-clip attention as the TPU-native mode;
these tests pin both behaviors and the registry wiring.
"""

import jax.numpy as jnp
import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models import get_model
from audio_tokens_tpu.utils.seeding import key_for


def _cfg(**kw):
    defaults = dict(model_type="bert", vocab_size=32, num_classes=5,
                    hidden_size=64, num_layers=1, dropout=0.0)
    defaults.update(kw)
    return AudioTokensConfig(**defaults)


def _logits(model, tokens):
    params = model.init({"params": key_for(0, "m")}, tokens,
                        lengths=None, deterministic=True)["params"]
    return params, model.apply({"params": params}, tokens, lengths=None,
                               deterministic=True)


def test_default_truncates_to_512_like_reference():
    model = get_model(_cfg())
    assert model.max_position == 512
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 32, (2, 600)), jnp.int32)
    params, base = _logits(model, toks)
    # tokens beyond the window must not affect the output...
    toks2 = toks.at[:, 550].set((toks[:, 550] + 1) % 32)
    np.testing.assert_array_equal(
        np.asarray(model.apply({"params": params}, toks2, lengths=None,
                               deterministic=True)),
        np.asarray(base))
    # ...but tokens inside it must
    toks3 = toks.at[:, 100].set((toks[:, 100] + 1) % 32)
    assert not np.array_equal(
        np.asarray(model.apply({"params": params}, toks3, lengths=None,
                               deterministic=True)),
        np.asarray(base))


def test_full_clip_window_attends_over_whole_sequence():
    model = get_model(_cfg(transformer_max_position=600))
    assert model.max_position == 600
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 32, (2, 600)), jnp.int32)
    params, base = _logits(model, toks)
    # position-embedding table sized to the window
    assert params["pos_embed"]["embedding"].shape[0] == 600
    # a token past the reference's 512 cut now changes the logits
    toks2 = toks.at[:, 550].set((toks[:, 550] + 1) % 32)
    assert not np.array_equal(
        np.asarray(model.apply({"params": params}, toks2, lengths=None,
                               deterministic=True)),
        np.asarray(base))


def test_window_front_parity_with_default():
    """With identical weights on the shared prefix positions, a full-window
    model restricted to 512 input tokens matches the 512-window model —
    extending the window only ADDS positions, it does not change the
    treatment of existing ones."""
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 32, (2, 512)), jnp.int32)
    short = get_model(_cfg())
    long = get_model(_cfg(transformer_max_position=600))
    p_short = short.init({"params": key_for(0, "m")}, toks,
                         lengths=None, deterministic=True)["params"]
    p_long = long.init({"params": key_for(0, "m")}, toks,
                       lengths=None, deterministic=True)["params"]
    # transplant the short model's weights; widen pos_embed with its rows
    import jax

    p_long = jax.tree_util.tree_map(lambda a: a, p_long)
    pe = np.asarray(p_long["pos_embed"]["embedding"]).copy()
    pe[:512] = np.asarray(p_short["pos_embed"]["embedding"])
    p_t = {k: v for k, v in p_short.items()}
    p_t["pos_embed"] = {"embedding": jnp.asarray(pe)}
    out_short = short.apply({"params": p_short}, toks, lengths=None,
                            deterministic=True)
    out_long = long.apply({"params": p_t}, toks, lengths=None,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(out_long), np.asarray(out_short),
                               rtol=1e-6, atol=1e-6)
