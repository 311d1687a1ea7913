"""Sequence parallelism on the transformer (full-clip attention).

The reference's long-context strategy is truncation to 512 tokens
(reference models/custom_bert_classifier.py:21-22); SURVEY §2.6/§5 reserves a
``sequence`` mesh axis as the TPU-native counterpart.  These tests validate
the GSPMD sequence-sharding path on the virtual 8-device CPU mesh:
activations constrained to (data, sequence, None) must produce the same
logits/loss/gradients as the unsharded program.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_tokens_tpu.models.transformer import TP_RULES, TransformerClassifier
from audio_tokens_tpu.parallel.mesh import make_mesh, tp_shardings
from jax.sharding import NamedSharding, PartitionSpec as P


def _small_model(**kw):
    defaults = dict(vocab_size=64, num_layers=2, num_classes=11,
                    hidden_size=64, max_position=128, dropout=0.0)
    defaults.update(kw)
    return TransformerClassifier(**defaults)


def _data(b=4, t=128, seed=0):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(0, 64, size=(b, t)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 2, size=(b, 11)), jnp.float32)
    return tokens, labels


def test_make_mesh_sequence_axis():
    devs = jax.devices()
    mesh = make_mesh(data=2, model=2, seq=2, devices=devs)
    assert mesh.axis_names == ("data", "sequence", "model")
    assert dict(mesh.shape) == {"data": 2, "sequence": 2, "model": 2}
    # seq=1 keeps the 2-axis shape (existing DP/TP programs unchanged)
    mesh = make_mesh(data=4, model=2, devices=devs)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(data=-1, model=1, seq=3, devices=devs)
    with pytest.raises(ValueError):
        make_mesh(data=8, model=1, seq=2, devices=devs)


def test_sp_forward_matches_unsharded():
    tokens, _ = _data()
    base = _small_model()
    params = base.init({"params": jax.random.PRNGKey(0)}, tokens,
                       deterministic=True)["params"]
    ref = jax.jit(lambda p, x: base.apply(
        {"params": p}, x, deterministic=True))(params, tokens)

    mesh = make_mesh(data=2, model=1, seq=2, devices=jax.devices()[:4])
    sp = base.clone(sp_mesh=mesh)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    x_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", "sequence")))
    got = jax.jit(lambda p, x: sp.apply(
        {"params": p}, x, deterministic=True))(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_lengths_mask_matches_unsharded():
    tokens, _ = _data()
    lengths = jnp.asarray([128, 100, 64, 17], jnp.int32)
    base = _small_model()
    params = base.init({"params": jax.random.PRNGKey(0)}, tokens,
                       lengths=lengths, deterministic=True)["params"]
    ref = base.apply({"params": params}, tokens, lengths=lengths,
                     deterministic=True)

    mesh = make_mesh(data=2, model=1, seq=2, devices=jax.devices()[:4])
    sp = base.clone(sp_mesh=mesh)
    got = jax.jit(lambda p, x, l: sp.apply(
        {"params": p}, x, lengths=l, deterministic=True))(
        jax.device_put(params, NamedSharding(mesh, P())),
        jax.device_put(tokens, NamedSharding(mesh, P("data", "sequence"))),
        jax.device_put(lengths, NamedSharding(mesh, P("data"))),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_train_step_matches_unsharded():
    """Loss and gradients agree with the unsharded program, and an AdamW
    step executes under the mesh.  (Post-Adam params are NOT compared:
    Adam's first step is ~lr*sign(grad), which amplifies reduction-order
    noise in near-zero gradients into lr-sized sign flips.)"""
    tokens, labels = _data()
    base = _small_model()
    params = base.init({"params": jax.random.PRNGKey(0)}, tokens,
                       deterministic=True)["params"]
    optimizer = optax.adamw(1e-3)

    def grads_for(model):
        def loss_fn(p, x, y):
            logits = model.apply({"params": p}, x, deterministic=True)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        return jax.jit(jax.value_and_grad(loss_fn))

    loss_ref, g_ref = grads_for(base)(params, tokens, labels)

    mesh = make_mesh(data=2, model=1, seq=2, devices=jax.devices()[:4])
    sp = base.clone(sp_mesh=mesh)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    x_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", "sequence")))
    y_sh = jax.device_put(labels, NamedSharding(mesh, P("data")))
    loss_sp, g_sp = grads_for(sp)(p_sh, x_sh, y_sh)

    np.testing.assert_allclose(float(loss_sp), float(loss_ref),
                               rtol=1e-6, atol=1e-6)
    for (kp, ref_leaf), sp_leaf in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(
            np.asarray(sp_leaf), np.asarray(ref_leaf), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(kp))

    # the optimizer step itself runs sharded without error
    o_sh = optimizer.init(p_sh)
    updates, _ = jax.jit(optimizer.update)(g_sp, o_sh, p_sh)
    p_new = optax.apply_updates(p_sh, updates)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(p_new))


def test_sp_composes_with_tp():
    """The full 3-axis mesh (data 2 x sequence 2 x model 2): TP params +
    SP activations in one program, logits match unsharded."""
    tokens, _ = _data()
    base = _small_model(hidden_size=128)  # 2 heads so 'model' can split them
    params = base.init({"params": jax.random.PRNGKey(0)}, tokens,
                       deterministic=True)["params"]
    ref = base.apply({"params": params}, tokens, deterministic=True)

    mesh = make_mesh(data=2, model=2, seq=2)
    sp = base.clone(sp_mesh=mesh)
    p_sh = jax.tree_util.tree_map(
        jax.device_put, params, tp_shardings(mesh, params, TP_RULES))
    x_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", "sequence")))
    got = jax.jit(lambda p, x: sp.apply(
        {"params": p}, x, deterministic=True))(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Trainer integration

def test_trainer_sequence_parallel_e2e(tmp_path):
    """sequence_parallel=2 through the real ModelTrainer stage."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.model_trainer import ModelTrainer
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )
    from tests import fixtures

    fixtures.make_workspace(tmp_path)
    cfg = fixtures.test_config(tmp_path)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()

    cfg = fixtures.test_config(
        tmp_path, model_type="bert", hidden_size=64, num_layers=1, epochs=1,
        training_batch_size=8, data_parallel=2, sequence_parallel=2,
        transformer_max_position=64, save_best_checkpoint=False,
    )
    trainer = ModelTrainer(cfg)
    val_loss, _ = trainer.run()
    assert np.isfinite(val_loss)
    assert trainer.mesh is not None
    assert trainer.mesh.shape["sequence"] == 2
    assert trainer.model.sp_mesh is trainer.mesh


def test_sp_requires_transformer(tmp_path):
    from audio_tokens_tpu.processors.model_trainer import ModelTrainer
    from tests import fixtures

    fixtures.make_workspace(tmp_path)
    cfg = fixtures.test_config(tmp_path, model_type="simple",
                               sequence_parallel=2)
    with pytest.raises(ValueError, match="sequence_parallel"):
        ModelTrainer(cfg)


def test_sp_requires_divisible_window(tmp_path):
    from audio_tokens_tpu.processors.model_trainer import ModelTrainer
    from tests import fixtures

    fixtures.make_workspace(tmp_path)
    cfg = fixtures.test_config(tmp_path, model_type="bert",
                               sequence_parallel=3,
                               transformer_max_position=128)
    with pytest.raises(ValueError, match="divisible"):
        ModelTrainer(cfg)
