"""Resume-from-checkpoint, non-compat (true lengths) mode, and the
skip-tokenization transformer branch."""

import numpy as np
import pytest

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
from audio_tokens_tpu.processors.model_trainer import ModelTrainer
from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from tests import fixtures


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("extras_ws")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    return base


def test_resume_from_checkpoint(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=2,
                               learning_rate=3e-3)
    t1 = ModelTrainer(cfg)
    t1.run()

    cfg2 = fixtures.test_config(ws, model_type="simple", epochs=1,
                                learning_rate=3e-3, resume_from="no-wandb-best")
    t2 = ModelTrainer(cfg2)
    val_loss, metrics = t2.run()
    assert np.isfinite(val_loss)


def test_resume_missing_checkpoint_errors(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               resume_from="not-a-checkpoint")
    with pytest.raises(FileNotFoundError):
        ModelTrainer(cfg).run()


def test_non_compat_mode_trains_lstm(ws):
    """reference_compat=False: true lengths drive masking/packing."""
    cfg = fixtures.test_config(
        ws, model_type="lstm", epochs=1, reference_compat=False,
        save_best_checkpoint=False, num_layers=1,
    )
    trainer = ModelTrainer(cfg)
    assert trainer.use_lengths
    val_loss, metrics = trainer.run()
    assert np.isfinite(val_loss)


def test_lstm_masking_final_state_correct(rng):
    """The masked-scan biLSTM's final state must equal running the unpadded
    sequence alone."""
    import jax.numpy as jnp

    from audio_tokens_tpu.models.lstm import SimpleLSTMTokenClassifier
    from audio_tokens_tpu.utils.seeding import key_for

    model = SimpleLSTMTokenClassifier(
        vocab_size=11, embed_dim=8, hidden_dim=6, num_layers=1, num_classes=3
    )
    toks = rng.integers(0, 11, (1, 10)).astype(np.int32)
    padded = np.zeros((1, 16), np.int32)
    padded[0, :10] = toks[0]
    params = model.init(
        {"params": key_for(0, "m")}, jnp.asarray(padded),
        lengths=jnp.asarray([10]), deterministic=True,
    )["params"]
    out_padded = model.apply(
        {"params": params}, jnp.asarray(padded),
        lengths=jnp.asarray([10]), deterministic=True,
    )
    out_exact = model.apply(
        {"params": params}, jnp.asarray(toks),
        lengths=jnp.asarray([10]), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(out_padded), np.asarray(out_exact),
                               atol=1e-5)


def test_transformer_skip_tokenization_branch(ws):
    """bert + use_precomputed_embeddings: raw mel frames -> transformer
    (BASELINE config 4, no VQ involved)."""
    cfg = fixtures.test_config(
        ws, model_type="bert", dataset_type="RawSTFTDataset",
        use_precomputed_embeddings=True, epochs=1, hidden_size=32,
        num_layers=1, save_best_checkpoint=False,
    )
    from audio_tokens_tpu.models.registry import model_input_kind

    assert model_input_kind(cfg) == "spec"
    val_loss, metrics = ModelTrainer(cfg).run()
    assert np.isfinite(val_loss)


def test_tensor_parallel_training(ws):
    """model_parallel=2 over the 8-device mesh: transformer weights sharded
    via TP_RULES, training runs, loss finite."""
    import jax
    from jax.sharding import NamedSharding

    cfg = fixtures.test_config(
        ws, model_type="bert", hidden_size=128, num_layers=1, epochs=1,
        training_batch_size=8, model_parallel=2, data_parallel=4,
        save_best_checkpoint=False,
    )
    trainer = ModelTrainer(cfg)
    val_loss, _ = trainer.run()
    assert np.isfinite(val_loss)
    assert trainer.mesh is not None and trainer.mesh.shape["model"] == 2
    # at least one param must actually be sharded over the model axis
    from audio_tokens_tpu.models.transformer import TP_RULES
    from audio_tokens_tpu.parallel.mesh import tp_param_specs

    specs = tp_param_specs(trainer._final_params, TP_RULES)
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: "model" in str(s), specs,
                               is_leaf=lambda x: not isinstance(x, dict))
    )
    assert any(flat)


def test_tp_requires_transformer(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               training_batch_size=8, model_parallel=2,
                               data_parallel=4, save_best_checkpoint=False)
    with pytest.raises(ValueError, match="model_parallel"):
        ModelTrainer(cfg).run()


def test_evaluate_checkpoint(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1)
    trainer = ModelTrainer(cfg)
    _, train_metrics = trainer.run()
    ev_loss, ev_metrics = ModelTrainer(cfg).evaluate("no-wandb-best")
    assert np.isfinite(ev_loss)
    assert 0.0 <= ev_metrics["mAP"] <= 1.0


def test_diagnostics_hook_runs(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               diagnostics_every=1, save_best_checkpoint=False)
    ModelTrainer(cfg).run()
    from pathlib import Path

    assert list(Path(cfg.checkpoint_dir).glob("no-wandb-gradflow-e0.png"))


def test_resume_params_only_checkpoint_falls_back_to_fresh_opt(ws):
    """A params-only checkpoint (no opt_state dir) must resume with a fresh
    optimizer instead of crashing on a tree-structure mismatch."""
    import shutil

    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               learning_rate=3e-3)
    ModelTrainer(cfg).run()
    opt_dir = ws / "output" / "checkpoints" / "no-wandb-best" / "opt_state"
    assert opt_dir.exists()
    shutil.rmtree(opt_dir)

    cfg2 = fixtures.test_config(ws, model_type="simple", epochs=1,
                                learning_rate=3e-3, resume_from="no-wandb-best")
    val_loss, _ = ModelTrainer(cfg2).run()
    assert np.isfinite(val_loss)


def test_tp_with_indivisible_batch_raises(ws):
    """Requested tensor parallelism must never be silently dropped."""
    cfg = fixtures.test_config(
        ws, model_type="bert", model_parallel=2, data_parallel=4,
        training_batch_size=3, epochs=1,
    )
    with pytest.raises(ValueError, match="model_parallel"):
        ModelTrainer(cfg).run()


def test_shard_map_dp_step_matches_gspmd(ws):
    """Pallas-LSTM DP training runs under shard_map steps; losses/metrics
    must match the GSPMD (scan backend) path on the same data."""
    results = {}
    for backend in ("xla", "pallas_interpret"):
        cfg = fixtures.test_config(
            ws, model_type="lstm", epochs=1, learning_rate=3e-3,
            training_batch_size=8, lstm_backend=backend,
            save_best_checkpoint=False, num_layers=1,
            lstm_embed_dim=16, lstm_hidden_dim=128,  # pallas-aligned H
        )
        trainer = ModelTrainer(cfg)
        val_loss, metrics = trainer.run()
        used_shard_map = trainer._use_shard_map_steps()
        results[backend] = (val_loss, metrics["mAP"], used_shard_map)
    assert results["xla"][2] is False          # GSPMD path
    assert results["pallas_interpret"][2] is True  # shard_map path engaged
    assert abs(results["xla"][0] - results["pallas_interpret"][0]) < 1e-4
    assert abs(results["xla"][1] - results["pallas_interpret"][1]) < 1e-3


def test_simple_count_gemm_matches_gather_mean(rng):
    """The count-GEMM pooling is algebraically the mean of gathered
    embeddings; logits must match the direct formulation."""
    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.models.simple import SimpleTokenClassifier

    m = SimpleTokenClassifier(vocab_size=40, hidden_size=32, num_classes=7)
    toks = jnp.asarray(rng.integers(0, 40, (6, 50)), jnp.int32)
    lens = jnp.asarray(rng.integers(5, 51, (6,)), jnp.int32)
    params = m.init(jax.random.key(0), toks)["params"]

    def direct(params, tokens, lengths):
        table = params["embedding"]["embedding"]
        x = table[tokens]  # gather
        if lengths is None:
            pooled = jnp.mean(x, axis=1)
        else:
            t = jnp.arange(x.shape[1])[None, :, None]
            mask = (t < lengths[:, None, None]).astype(x.dtype)
            pooled = (x * mask).sum(axis=1) / jnp.maximum(
                lengths[:, None].astype(x.dtype), 1.0)
        return pooled @ params["classifier"]["kernel"] + params["classifier"]["bias"]

    for lengths in (None, lens):
        ours = m.apply({"params": params}, toks, lengths=lengths)
        ref = direct(params, toks, lengths)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_embed_lookup_matches_scatter_gradients(rng):
    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.ops.embed import embed_lookup

    table = jnp.asarray(rng.standard_normal((40, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 40, (6, 30)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((6, 30, 16)), jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(embed_lookup(table, toks)), np.asarray(table[toks])
    )
    g_gemm = jax.grad(lambda t: (embed_lookup(t, toks) * cot).sum())(table)
    g_scat = jax.grad(lambda t: (t[toks] * cot).sum())(table)
    np.testing.assert_allclose(np.asarray(g_gemm), np.asarray(g_scat),
                               atol=1e-5, rtol=1e-5)


def test_embed_lookup_chunked_backward_matches_scatter(rng, monkeypatch):
    """Force the N-chunked one-hot GEMM backward (the large-vocab memory
    gate) and check it still equals the scatter-add gradient exactly."""
    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.ops import embed as embed_mod

    # budget of 64*40=2560 elems -> chunk=max(128, 2560//40)=128 rows; the
    # 6*30=180-token batch needs 2 chunks incl. a padded tail
    monkeypatch.setattr(embed_mod, "_ONEHOT_BUDGET_ELEMS", 64 * 40)
    table = jnp.asarray(rng.standard_normal((40, 16)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 40, (6, 30)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((6, 30, 16)), jnp.float32)

    g_gemm = jax.grad(
        lambda t: (embed_mod.embed_lookup(t, toks) * cot).sum()
    )(table)
    g_scat = jax.grad(lambda t: (t[toks] * cot).sum())(table)
    np.testing.assert_allclose(np.asarray(g_gemm), np.asarray(g_scat),
                               atol=1e-5, rtol=1e-5)


def test_simple_large_vocab_gate_matches_count_gemm(rng, monkeypatch):
    """Vocabularies above the gate use the gather+mean path; outputs and
    gradients must match the count-GEMM formulation."""
    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.models import simple as simple_mod

    m = simple_mod.SimpleTokenClassifier(
        vocab_size=40, hidden_size=32, num_classes=7
    )
    toks = jnp.asarray(rng.integers(0, 40, (6, 50)), jnp.int32)
    lens = jnp.asarray(rng.integers(5, 51, (6,)), jnp.int32)
    params = m.init(jax.random.key(0), toks)["params"]

    def logits_and_grad(tokens, lengths):
        def loss(p):
            return m.apply({"params": p}, tokens, lengths=lengths).sum()

        out = m.apply({"params": params}, tokens, lengths=lengths)
        return np.asarray(out), jax.grad(loss)(params)

    for lengths in (None, lens):
        out_gemm, g_gemm = logits_and_grad(toks, lengths)
        monkeypatch.setattr(simple_mod, "_COUNT_GEMM_V_MAX", 8)  # force gate
        out_gather, g_gather = logits_and_grad(toks, lengths)
        monkeypatch.undo()
        np.testing.assert_allclose(out_gemm, out_gather, atol=1e-4, rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(g_gemm),
                        jax.tree_util.tree_leaves(g_gather)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_trainer_rejects_pallas_lstm_with_tp():
    """Explicit lstm_backend='pallas' with model_parallel>1 must fail with a
    descriptive error, not an opaque SPMD compile error."""
    import pytest

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.train.trainer import Trainer

    cfg = AudioTokensConfig(
        model_type="lstm", lstm_backend="pallas", model_parallel=2,
        base_dir="/tmp/att-reject-test",
    )
    with pytest.raises(ValueError, match="DP-only mesh"):
        Trainer(cfg)


def test_prefetch_threads_released_on_early_break():
    """max_train_steps breaks out of the epoch loop mid-stream; the prefetch
    producer must notice (stop event) and exit instead of blocking forever
    on its queue with device batches pinned."""
    import gc
    import threading
    import time as _time

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.tools.bench_training import _MemLoader
    from audio_tokens_tpu.train.trainer import Trainer

    cfg = AudioTokensConfig(
        model_type="simple", vocab_size=16, hidden_size=8, num_classes=5,
        max_seq_len=12, training_batch_size=4, dropout=0.0,
        save_best_checkpoint=False, base_dir="/tmp/att-prefetch-test",
        max_train_steps=1,
    )
    rng = np.random.default_rng(0)
    batches = [{
        "inputs": rng.integers(0, 16, (4, 12)).astype(np.int32),
        "lengths": np.full((4,), 12, np.int32),
        "labels": (rng.random((4, 5)) < 0.3).astype(np.float32),
        "n_valid": 4,
    } for _ in range(20)]
    trainer = Trainer(cfg)
    loader = _MemLoader(batches)
    params, opt_state = trainer._init_state(loader)
    train_step, _ = trainer._build_steps()
    before = threading.active_count()
    step = 0
    for epoch in range(5):  # every epoch breaks after 1 of 20 batches
        params, opt_state, step, _, _ = trainer._train_epoch(
            train_step, params, opt_state, loader, epoch, 0
        )
    gc.collect()
    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    # producers exit within the stop-event timeout; no one thread per epoch
    assert threading.active_count() <= before + 1, (
        f"leaked prefetch threads: {threading.active_count()} vs {before}"
    )


def test_token_cache_matches_per_file_loads(tmp_path):
    """The memory-mapped token cache returns the same sequences as per-clip
    np.load, rebuilds when an artifact changes, and is disabled cleanly."""
    import json as _json

    from audio_tokens_tpu.data.datasets import TokenizedSpecDataset
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor

    fixtures.make_workspace(tmp_path, n_clips=4)
    cfg = fixtures.test_config(tmp_path)
    tok_dir = tmp_path / "tokenized_audio" / "train"
    tok_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    split = _json.loads((tmp_path / "metadata" /
                         "balanced_train_segments.csv").read_text()
                        ) if False else None
    from audio_tokens_tpu.data.splitter import DatasetSplitter

    meta = AudiosetMetadataProcessor(cfg)
    DatasetSplitter(cfg).create_split_file(meta)
    ytids = _json.loads(open(cfg.split_file).read())["train"]
    for i, y in enumerate(ytids):
        np.save(tok_dir / f"{y}.npy",
                rng.integers(0, cfg.vocab_size, 20 + i).astype(np.int64))

    ds = TokenizedSpecDataset(cfg, meta, "train")
    assert ds._cache is not None
    ref = [np.load(f).astype(np.int32) for f in ds.files]
    for i in range(len(ds)):
        np.testing.assert_array_equal(ds.load_features(i), ref[i])

    # staleness: touch one artifact with new content -> cache rebuilds
    np.save(ds.files[0], rng.integers(0, cfg.vocab_size, 33).astype(np.int64))
    import os as _os
    _os.utime(ds.files[0], (ds.files[0].stat().st_atime,
                            ds.files[0].stat().st_mtime + 5))
    ds2 = TokenizedSpecDataset(cfg, meta, "train")
    np.testing.assert_array_equal(
        ds2.load_features(0), np.load(ds.files[0]).astype(np.int32))

    # disabled path
    cfg_off = fixtures.test_config(tmp_path, token_cache=False)
    ds3 = TokenizedSpecDataset(cfg_off, meta, "train")
    assert ds3._cache is None
    np.testing.assert_array_equal(ds3.load_features(1), ds2.load_features(1))


def test_spec_cache_matches_per_file_loads(tmp_path):
    """The flat cache generalizes to the raw-spectrogram datasets (cnn /
    baseline families): cached loads equal per-file np.load().T."""
    import json as _json

    from audio_tokens_tpu.data.datasets import (
        RawSTFTDataset, RawSTFTFlatDataset,
    )
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter

    fixtures.make_workspace(tmp_path, n_clips=4)
    cfg = fixtures.test_config(tmp_path)
    meta = AudiosetMetadataProcessor(cfg)
    DatasetSplitter(cfg).create_split_file(meta)
    ytids = _json.loads(open(cfg.split_file).read())["train"]
    spec_dir = tmp_path / "spectrograms" / "train"
    spec_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, y in enumerate(ytids):
        np.save(spec_dir / f"{y}.npy",
                rng.standard_normal((cfg.n_mels, 15 + i)).astype(np.float32))

    ds = RawSTFTDataset(cfg, meta, "train")
    assert ds._cache is not None
    for i, f in enumerate(ds.files):
        np.testing.assert_array_equal(
            ds.load_features(i), np.load(f).T.astype(np.float32))
    # the flat variant shares the same cache file
    ds_flat = RawSTFTFlatDataset(cfg, meta, "train")
    assert ds_flat._cache is not None
    np.testing.assert_array_equal(ds_flat.load_features(1),
                                  ds.load_features(1))
    assert len(list((tmp_path / "spectrograms").glob("*.bin"))) == 1


def test_early_stopping_patience(ws):
    """early_stopping_patience halts training once val mAP stops improving
    (the reference's stub never fired, processors/model_trainer.py:192-193;
    ours is a real knob).  lr=0 freezes the params so the epoch-1 metric is
    never beaten; patience=2 must stop the run before the epoch budget."""
    import json
    from pathlib import Path

    cfg = fixtures.test_config(
        ws, model_type="simple", epochs=20, learning_rate=0.0,
        early_stopping_patience=2, save_best_checkpoint=True,
    )
    metrics_path = Path(cfg.checkpoint_dir) / "no-wandb-metrics.jsonl"
    # the module-scoped workspace shares the run name: count THIS run's lines
    before = (len(metrics_path.read_text().splitlines())
              if metrics_path.exists() else 0)
    ModelTrainer(cfg).run()
    epochs_run = len(metrics_path.read_text().splitlines()) - before
    assert epochs_run <= 4, f"early stopping never fired ({epochs_run} epochs)"


def test_profile_dir_writes_trace(ws, tmp_path):
    """config.profile_dir wraps stages in jax.profiler.trace (SURVEY §5
    tracing subsystem) — the stage must emit a trace artifact."""
    import os

    prof = tmp_path / "trace"
    cfg = fixtures.test_config(ws, profile_dir=str(prof))
    SpecTokenizer(cfg).run()
    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert found, "profiler trace directory is empty"


def test_wandb_disabled_without_package(ws):
    """use_wandb=True must degrade to local logging when wandb is not
    importable (this image has no wandb)."""
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               use_wandb=True, save_best_checkpoint=False)
    val_loss, metrics = ModelTrainer(cfg).run()
    assert np.isfinite(val_loss)


def test_resume_continues_epoch_schedule(ws):
    """Resume restores the EPOCH counter too: a run that checkpointed at
    epoch E and is restarted with the same budget trains only the remaining
    epochs (restarting at 0 would replay consumed shuffle permutations and
    train cfg.epochs extra epochs)."""
    import json
    from pathlib import Path

    cfg = fixtures.test_config(ws, model_type="simple", epochs=2,
                               learning_rate=3e-3)
    ModelTrainer(cfg).run()
    meta = json.loads(
        (Path(cfg.checkpoint_dir) / "no-wandb-best" / "meta.json").read_text())
    assert 1 <= meta["epoch"] <= 2

    metrics_path = Path(cfg.checkpoint_dir) / "no-wandb-metrics.jsonl"
    before = len(metrics_path.read_text().splitlines())
    cfg2 = fixtures.test_config(ws, model_type="simple", epochs=4,
                                learning_rate=3e-3,
                                resume_from="no-wandb-best")
    val_loss, _ = ModelTrainer(cfg2).run()
    ran = len(metrics_path.read_text().splitlines()) - before
    assert ran == 4 - meta["epoch"]
    assert np.isfinite(val_loss)


def test_resume_exhausted_budget_evaluates(ws):
    """Resuming a finished run (checkpoint epoch >= cfg.epochs) trains
    nothing but still returns the checkpoint's validation metrics."""
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               learning_rate=3e-3)
    ModelTrainer(cfg).run()
    cfg2 = fixtures.test_config(ws, model_type="simple", epochs=1,
                                learning_rate=3e-3,
                                resume_from="no-wandb-best")
    val_loss, metrics = ModelTrainer(cfg2).run()
    assert np.isfinite(val_loss)
    assert 0.0 <= metrics["mAP"] <= 1.0


def test_device_corpus_invalid_value_raises(ws):
    cfg = fixtures.test_config(ws, model_type="simple", epochs=1,
                               device_corpus="disabled")
    with pytest.raises(ValueError, match="device_corpus"):
        ModelTrainer(cfg).run()
