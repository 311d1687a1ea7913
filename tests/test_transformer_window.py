"""Transformer attention-window knob (config.transformer_max_position).

The reference slices every clip to its first 512 tokens
(reference: models/custom_bert_classifier.py:21-22) — that stays the default
for parity.  SURVEY.md §5 names full-clip attention as the TPU-native mode;
these tests pin both behaviors and the registry wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _ref_attn(q, k, v, seg, sm_scale):
    """Reference attention with flash's segment semantics, pure jnp."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    mask = (seg[:, None, :, None] == seg[:, None, None, :])
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)


def test_flash_attention_module_matches_flax_mhdpa():
    """FlashSelfAttention with an injected reference attention reproduces
    flax MultiHeadDotProductAttention bit-tightly under the SAME params —
    i.e. the projection layout, scaling, padding, and segment masking are
    exactly flax's semantics (the TPU kernel itself is A/B'd on hardware,
    BASELINE.md)."""
    import flax.linen as nn

    from audio_tokens_tpu.models.transformer import FlashSelfAttention

    b, t, h, nh = 2, 70, 64, 4  # t deliberately NOT a block multiple
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, h)), jnp.float32)
    lengths = jnp.asarray([70, 33])

    flash_mod = FlashSelfAttention(num_heads=nh, hidden_size=h,
                                   attn_fn=_ref_attn)
    params = flash_mod.init(key_for(0, "attn"), x, lengths)["params"]

    flax_mod = nn.MultiHeadDotProductAttention(
        num_heads=nh, qkv_features=h, param_dtype=jnp.float32,
        dropout_rate=0.0, deterministic=True)
    keep = jnp.arange(t)[None, :] < lengths[:, None]
    ref = flax_mod.apply({"params": params}, x, x,
                         mask=keep[:, None, None, :])
    got = flash_mod.apply({"params": params}, x, lengths)
    # valid rows agree (pad-query rows differ by construction: flash
    # segments exclude valid keys for them, flax's key-mask does not)
    for i in range(b):
        n = int(lengths[i])
        np.testing.assert_allclose(np.asarray(got[i, :n]),
                                   np.asarray(ref[i, :n]),
                                   rtol=1e-5, atol=1e-5)
    # param trees are interchangeable by construction
    assert set(params.keys()) == {"query", "key", "value", "out"}

    # no-lengths mode (reference compat): matches unmasked flax attention
    ref2 = flax_mod.apply({"params": params}, x, x)
    got2 = flash_mod.apply({"params": params}, x, None)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_flash_impl_resolution():
    """'auto' always resolves to XLA (flash measured slower in-model);
    explicit 'flash' passes through, junk is rejected, and a training
    (non-deterministic) call falls back to XLA inside the model."""
    from audio_tokens_tpu.models.registry import (
        _resolve_transformer_attention)

    cfg = AudioTokensConfig(model_type="bert", transformer_max_position=1728)
    # 'auto' is ALWAYS XLA: the flash path measured slower in-model on v5e
    # (BASELINE.md) and is opt-in only
    assert _resolve_transformer_attention(cfg) == "xla"
    cfg.transformer_attention = "flash"
    assert _resolve_transformer_attention(cfg) == "flash"
    cfg.transformer_attention = "Flash"
    with pytest.raises(ValueError, match="transformer_attention"):
        _resolve_transformer_attention(cfg)

    # model-level fallback: flash + training dropout -> xla path used (the
    # run must not crash on CPU, where the kernel cannot lower)
    cfg2 = AudioTokensConfig(model_type="bert", vocab_size=32, num_classes=5,
                             num_layers=1, hidden_size=64, dropout=0.1,
                             transformer_attention="flash",
                             transformer_max_position=64)
    model = get_model(cfg2)
    toks = jnp.zeros((2, 64), jnp.int32)
    # deterministic=False + dropout > 0 takes the XLA fallback everywhere,
    # including init — which is what lets this run on the CPU test backend
    # (forcing flash in a deterministic call would lower the TPU kernel)
    params = model.init({"params": key_for(0, "m"),
                         "dropout": key_for(2, "d0")}, toks, lengths=None,
                        deterministic=False)["params"]
    out = model.apply({"params": params}, toks, lengths=None,
                      deterministic=False,
                      rngs={"dropout": key_for(1, "d")})
    assert np.isfinite(np.asarray(out)).all()
