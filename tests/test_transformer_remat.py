"""Per-block transformer rematerialization (config.transformer_remat).

``nn.remat`` on each encoder block must be a pure memory/compute trade:
logits, loss, and gradients match the plain model.  Gradient comparison is
norm-relative per leaf — elementwise relative comparison is meaningless here
(a 1e-6 param perturbation moves some tiny-norm grad leaves by >100%; the
checkpoint's refused-CSE reordering injects f32-rounding-scale noise that
cancellation then amplifies elementwise, measured while building this).

The capacity claim (full-clip B=32 trains only with remat) is measured on
hardware — BASELINE.md.  Reference counterpart: none (the reference slices
to 512 tokens instead, models/custom_bert_classifier.py:21-22).
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models import get_model
from audio_tokens_tpu.utils.seeding import key_for

KW = dict(model_type="bert", vocab_size=37, num_classes=7, hidden_size=32,
          num_layers=2, transformer_max_position=24, dropout=0.0)


def test_remat_blocks_match_plain_model():
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 37, (3, 24)), jnp.int32)
    lengths = jnp.asarray([24, 10, 17], jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, (3, 7)), jnp.float32)
    grads, logits = {}, {}
    params = None
    for remat in (False, True):
        m = get_model(AudioTokensConfig(**KW, transformer_remat=remat))
        if params is None:
            params = m.init(key_for(0, "model_init"), tokens, lengths=lengths)

        def loss(p, m=m):
            lg = m.apply(p, tokens, lengths=lengths)
            bce = jnp.mean(jnp.maximum(lg, 0) - lg * labels
                           + jnp.log1p(jnp.exp(-jnp.abs(lg))))
            return bce, lg

        (l, lg), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
        grads[remat], logits[remat] = g, lg
    np.testing.assert_allclose(logits[True], logits[False],
                               rtol=1e-6, atol=1e-7)
    for (p0, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads[False]),
            jax.tree_util.tree_leaves_with_path(grads[True])):
        a, b = np.asarray(a), np.asarray(b)
        nr = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
        assert nr < 1e-4, (jax.tree_util.keystr(p0), nr)


def test_remat_dropout_trajectory_matches_plain():
    """With live dropout the RNG stream must survive the lifted transform:
    one train step with the same key produces the same update."""
    import optax

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 37, (4, 24)), jnp.int32)
    lengths = jnp.asarray([24, 9, 17, 12], jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, (4, 7)), jnp.float32)
    outs = {}
    params = None
    for remat in (False, True):
        cfg = AudioTokensConfig(**{**KW, "dropout": 0.25},
                                transformer_remat=remat)
        m = get_model(cfg)
        if params is None:
            params = m.init({"params": key_for(0, "model_init"),
                             "dropout": key_for(0, "dropout_init")},
                            tokens, lengths=lengths)

        def loss(p, m=m):
            lg = m.apply(p, tokens, lengths=lengths, deterministic=False,
                         rngs={"dropout": key_for(7, "step")})
            return jnp.mean(jnp.maximum(lg, 0) - lg * labels
                            + jnp.log1p(jnp.exp(-jnp.abs(lg))))

        g = jax.jit(jax.grad(loss))(params)
        opt = optax.adamw(1e-3)
        upd, _ = opt.update(g, opt.init(params), params)
        outs[remat] = optax.apply_updates(params, upd)
    for a, b in zip(jax.tree_util.tree_leaves(outs[False]),
                    jax.tree_util.tree_leaves(outs[True])):
        a, b = np.asarray(a), np.asarray(b)
        nr = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-30)
        assert nr < 1e-4, nr
