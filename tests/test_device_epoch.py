"""Device-resident epoch programs (train/device_epoch.py).

Covers: exact on-device mAP vs the numpy/sklearn-parity implementation
(tie groups, zero-positive classes, padded-row exclusion), trajectory
equality between the whole-epoch device programs and the streaming per-step
Trainer paths (both the single-device jit and the 8-device shard_map mesh),
Trainer.run() integration (auto engagement + budget fallback), and
max_train_steps truncation.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from audio_tokens_tpu.data.datasets import DataLoaderCreator
from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.train.device_epoch import DeviceEpochRunner
from audio_tokens_tpu.train.trainer import Trainer
from audio_tokens_tpu.utils.device_metrics import macro_map_device
from audio_tokens_tpu.utils.metrics import macro_mean_average_precision
from tests import fixtures

N_CLIPS = 18


# ---------------------------------------------------------------------------
# on-device exact mAP
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("quantize", [0, 4, 1])  # 0 = continuous, else ties
def test_macro_map_device_matches_numpy(rng, quantize):
    n, c = 120, 9
    scores = rng.random((n, c)).astype(np.float32)
    if quantize:
        scores = np.round(scores * quantize) / quantize  # heavy ties
    labels = (rng.random((n, c)) < 0.3).astype(np.float32)
    labels[:, -1] = 0.0  # a zero-positive class (must be excluded)
    valid = np.ones(n, bool)
    valid[100:] = False  # padded tail rows (must be excluded exactly)

    got = float(macro_map_device(scores, labels, valid))
    want = macro_mean_average_precision(labels[:100], scores[:100])
    assert got == pytest.approx(want, abs=1e-6)


def test_macro_map_device_no_positives(rng):
    scores = rng.random((16, 3)).astype(np.float32)
    labels = np.zeros((16, 3), np.float32)
    assert float(macro_map_device(scores, labels, np.ones(16, bool))) == 0.0


def test_macro_map_device_saturated_ties(rng):
    """Saturated sigmoids (exact 0.0/1.0 runs) — the tie case trained models
    actually hit."""
    n, c = 64, 5
    scores = rng.choice([0.0, 0.25, 1.0], size=(n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.4).astype(np.float32)
    got = float(macro_map_device(scores, labels, np.ones(n, bool)))
    want = macro_mean_average_precision(labels, scores)
    assert got == pytest.approx(want, abs=1e-6)


# ---------------------------------------------------------------------------
# synthetic tokenized workspace (no audio stages needed)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def token_ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("dev_epoch_ws")
    meta = base / "metadata"
    meta.mkdir(parents=True)
    fixtures.make_ontology(meta / "ontology.json")
    fixtures.make_segments_csv(meta / "balanced_train_segments.csv",
                               n_clips=N_CLIPS)
    (base / "output").mkdir()
    cfg = fixtures.test_config(base, max_seq_len=48)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    split = json.loads(Path(cfg.split_file).read_text())
    rng = np.random.default_rng(3)
    for sp in ("train", "validation"):
        d = Path(cfg.dest_tokenized_path) / sp
        d.mkdir(parents=True)
        for y in split[sp]:
            n = int(rng.integers(30, 48))
            np.save(d / f"{y}.npy",
                    rng.integers(0, cfg.vocab_size, n).astype(np.int64))
    return base


def _cfg(base, **kw):
    defaults = dict(model_type="simple", epochs=2, dropout=0.0,
                    max_seq_len=48, save_best_checkpoint=False,
                    learning_rate=3e-3)
    defaults.update(kw)
    return fixtures.test_config(base, **defaults)


def _tree_allclose(a, b, rtol=1e-4, atol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# trajectory equality vs the streaming paths
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("batch", [4, 8])  # 4: mesh None (jit); 8: shard_map
def test_device_epoch_matches_streaming(token_ws, batch):
    cfg = _cfg(token_ws, training_batch_size=batch, device_corpus="off")
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
    params0, opt0 = trainer._init_state(train_loader)
    if batch == 8:
        assert trainer.mesh is not None  # 8 CPU devices
    else:
        assert trainer.mesh is None
    train_step, eval_step = trainer._build_steps()

    p1, o1, step = params0, opt0, 0
    stream_losses, stream_maps = [], []
    for epoch in range(cfg.epochs):
        p1, o1, step, loss, m = trainer._train_epoch(
            train_step, p1, o1, train_loader, epoch, step)
        stream_losses.append(loss)
        stream_maps.append(m["mAP"])
    ev_loss, ev_m = trainer._eval_epoch(eval_step, p1, val_loader)

    runner = DeviceEpochRunner(trainer.model, trainer.optimizer, cfg,
                               trainer.mesh, trainer.use_lengths)
    runner.set_corpus("train", train_loader.ds, batch, cfg.max_seq_len)
    runner.set_corpus("validation", val_loader.ds, cfg.eval_batch_size,
                      cfg.max_seq_len)
    # the train programs DONATE params/opt_state (HBM), so the streaming
    # pass consumed params0/opt0 — re-init (seeded: bit-identical values)
    p2, o2 = trainer._init_state(train_loader)
    step = 0
    for epoch in range(cfg.epochs):
        p2, o2, step, loss, m = runner.train_epoch(
            p2, o2, trainer._root_key, epoch, step)
        # identical batch composition + objective => same per-epoch numbers
        assert loss == pytest.approx(stream_losses[epoch], rel=1e-4, abs=1e-6)
        assert m["mAP"] == pytest.approx(stream_maps[epoch], abs=1e-4)
    dv_loss, dv_m = runner.eval_epoch(p2)
    assert dv_loss == pytest.approx(ev_loss, rel=1e-4, abs=1e-6)
    assert dv_m["mAP"] == pytest.approx(ev_m["mAP"], abs=1e-4)
    _tree_allclose(p1, p2)


def test_device_epoch_lstm_and_bert(token_ws):
    """The scan-wrapped epoch compiles and trains the recurrent and
    transformer families too (single epoch, finite results)."""
    for model_type in ("lstm", "bert"):
        cfg = _cfg(token_ws, model_type=model_type, epochs=1, num_layers=1,
                   training_batch_size=8, device_corpus="on")
        val_loss, val_m = Trainer(cfg).run()
        assert np.isfinite(val_loss)
        assert 0.0 <= val_m["mAP"] <= 1.0


# ---------------------------------------------------------------------------
# Trainer.run() integration
# ---------------------------------------------------------------------------
def test_run_engages_device_corpus_by_default(token_ws, caplog):
    cfg = _cfg(token_ws, epochs=1)
    with caplog.at_level("INFO", logger="audio_tokens_tpu.train.device_epoch"):
        val_loss, val_m = Trainer(cfg).run()
    assert any("device corpus train" in r.message for r in caplog.records)
    assert np.isfinite(val_loss)


def test_budget_falls_back_to_streaming(token_ws, caplog):
    cfg = _cfg(token_ws, epochs=1, device_corpus_budget_mb=0)
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
    trainer._init_state(train_loader)
    with caplog.at_level("INFO", logger="audio_tokens_tpu.train.trainer"):
        runner = trainer._maybe_device_runner(train_loader, val_loader)
    assert runner is None
    assert any("streaming batches instead" in r.message
               for r in caplog.records)


def test_device_corpus_off_respected(token_ws):
    cfg = _cfg(token_ws, epochs=1, device_corpus="off")
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
    trainer._init_state(train_loader)
    assert trainer._maybe_device_runner(train_loader, val_loader) is None


def test_max_train_steps_truncates_epoch(token_ws):
    cfg = _cfg(token_ws, training_batch_size=4, device_corpus="on")
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
    params, opt = trainer._init_state(train_loader)
    runner = trainer._maybe_device_runner(train_loader, val_loader)
    assert runner is not None
    full_steps = runner.corpora["train"].n_steps
    assert full_steps >= 2
    params, opt, step, loss, m = runner.train_epoch(
        params, opt, trainer._root_key, 0, 0, max_steps=full_steps - 1)
    assert step == full_steps - 1
    assert np.isfinite(loss)
    # exhausted budget: a further call is a no-op
    _, _, step2, loss2, _ = runner.train_epoch(
        params, opt, trainer._root_key, 1, step, max_steps=full_steps - 1)
    assert step2 == step and np.isnan(loss2)


# ---------------------------------------------------------------------------
# spec-input families (cnn / baseline) — resident float32 spec corpus
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def spec_ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("dev_epoch_spec_ws")
    meta = base / "metadata"
    meta.mkdir(parents=True)
    fixtures.make_ontology(meta / "ontology.json")
    fixtures.make_segments_csv(meta / "balanced_train_segments.csv",
                               n_clips=N_CLIPS)
    (base / "output").mkdir()
    cfg = fixtures.test_config(base, max_seq_len=32, n_mels=16)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    split = json.loads(Path(cfg.split_file).read_text())
    rng = np.random.default_rng(5)
    for sp in ("train", "validation"):
        d = Path(cfg.source_spec_path) / sp
        d.mkdir(parents=True)
        for y in split[sp]:
            t = int(rng.integers(20, 32))
            np.save(d / f"{y}.npy",
                    rng.standard_normal((cfg.n_mels, t)).astype(np.float32))
    return base


@pytest.mark.parametrize("model_type,dataset_type", [
    ("cnn", "RawSTFTDataset"),
    ("baseline", "RawSTFTFlatDataset"),
])
def test_device_epoch_spec_families(spec_ws, model_type, dataset_type):
    """The float32 spec corpus rides the same residency path (budget-gated);
    cnn/baseline train a device-resident epoch and match the streaming
    trainer's numbers.  compute_dtype is pinned to f32: this test asserts
    PATH equality (scan-epoch vs per-step programs), and at bf16 compute the
    two programs' fusion/rounding orders legitimately differ beyond the
    tolerance; the bf16 training path is covered by test_training."""
    results = {}
    for mode in ("on", "off"):
        cfg = fixtures.test_config(
            spec_ws, model_type=model_type, dataset_type=dataset_type,
            epochs=2, dropout=0.0, max_seq_len=32, n_mels=16,
            training_batch_size=8, save_best_checkpoint=False,
            learning_rate=3e-3, device_corpus=mode,
            compute_dtype="float32",
        )
        results[mode] = Trainer(cfg).run()
    (on_loss, on_m), (off_loss, off_m) = results["on"], results["off"]
    assert on_loss == pytest.approx(off_loss, rel=1e-4, abs=1e-6)
    assert on_m["mAP"] == pytest.approx(off_m["mAP"], abs=1e-4)


def test_device_corpus_bf16_spec(spec_ws):
    """device_corpus_dtype='bfloat16' halves the resident spec corpus (one
    round-to-nearest of the inputs) and trains to ~the float32 trajectory."""
    import ml_dtypes

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = fixtures.test_config(
            spec_ws, model_type="baseline", dataset_type="RawSTFTFlatDataset",
            epochs=2, dropout=0.0, max_seq_len=32, n_mels=16,
            training_batch_size=8, save_best_checkpoint=False,
            learning_rate=3e-3, device_corpus="on",
            device_corpus_dtype=dtype,
        )
        trainer = Trainer(cfg)
        results[dtype] = trainer.run()
    # storage dtype verified via the packer itself
    from audio_tokens_tpu.data.datasets import DataLoaderCreator
    from audio_tokens_tpu.train.device_epoch import corpus_arrays

    loader, _ = DataLoaderCreator(cfg).get_dataloaders()
    inputs, _, _, _ = corpus_arrays(loader.ds, 8, 32)
    assert inputs.dtype == np.dtype(ml_dtypes.bfloat16)
    (f_loss, f_m), (b_loss, b_m) = results["float32"], results["bfloat16"]
    assert np.isfinite(b_loss)
    # one bf16 rounding of the inputs: same loss trajectory to ~1e-2.  (mAP
    # is NOT compared tightly — on this 12-clip val set a single rank flip
    # moves it by ~0.07, so it only gets a sanity range.)
    assert b_loss == pytest.approx(f_loss, rel=2e-2, abs=2e-2)
    assert 0.0 <= b_m["mAP"] <= 1.0


def test_device_corpus_dtype_rejects_unknown(spec_ws):
    from audio_tokens_tpu.train.device_epoch import _feature_dtype

    cfg = fixtures.test_config(spec_ws, device_corpus_dtype="fp8")
    with pytest.raises(ValueError, match="device_corpus_dtype"):
        _feature_dtype(cfg)


@pytest.mark.parametrize("batch", [4, 8])  # 4: jit; 8: shard_map DP mesh
def test_epoch_gather_matches_step_gather(token_ws, batch):
    """device_epoch_gather='epoch' (bulk permuted gather + contiguous
    slices) feeds bit-identical batch values to every step — a slice of the
    gathered corpus IS the per-step gather (VERDICT r4 #2).  The two compiled
    programs may still fuse reductions differently (observed: a 1-ulp
    difference in one epoch's loss-sum with identical params/mAP), so the
    trajectory comparison is tight-tolerance, not bitwise."""
    cfg = _cfg(token_ws, training_batch_size=batch, device_corpus="off")
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()

    results = {}
    for materialize in (False, True):
        runner = DeviceEpochRunner(trainer.model, trainer.optimizer, cfg,
                                   trainer.mesh, trainer.use_lengths,
                                   materialize_train=materialize)
        runner.set_corpus("train", train_loader.ds, batch, cfg.max_seq_len)
        runner.set_corpus("validation", val_loader.ds, cfg.eval_batch_size,
                          cfg.max_seq_len)
        p, o = trainer._init_state(train_loader)  # seeded: identical values
        step = 0
        hist = []
        for epoch in range(cfg.epochs):
            p, o, step, loss, m = runner.train_epoch(
                p, o, trainer._root_key, epoch, step)
            hist.append((loss, m["mAP"]))
        hist.append(runner.eval_epoch(p))
        results[materialize] = (hist, jax.device_get(p))

    (h0, p0), (h1, p1) = results[False], results[True]
    for (l0, m0), (l1, m1) in zip(h0, h1):
        assert l1 == pytest.approx(l0, abs=1e-6)
        v0 = m0["mAP"] if isinstance(m0, dict) else m0
        v1 = m1["mAP"] if isinstance(m1, dict) else m1
        assert v1 == pytest.approx(v0, abs=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-7)


def test_trainer_auto_materializes_for_spec(spec_ws, caplog):
    """'auto' picks the epoch gather for spec/flat corpora within budget and
    the step gather for token corpora."""
    cfg = fixtures.test_config(
        spec_ws, model_type="baseline", dataset_type="RawSTFTFlatDataset",
        epochs=1, max_seq_len=32, n_mels=16, training_batch_size=8,
        save_best_checkpoint=False, device_corpus="on")
    trainer = Trainer(cfg)
    train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
    trainer._init_state(train_loader)
    runner = trainer._maybe_device_runner(train_loader, val_loader)
    assert runner is not None and runner.materialize_train

    # forced 'step' turns it off; forced 'epoch' turns it on even over budget
    import dataclasses
    for gmode, want in (("step", False), ("epoch", True)):
        t2 = Trainer(dataclasses.replace(cfg, device_epoch_gather=gmode))
        t2._init_state(train_loader)
        r2 = t2._maybe_device_runner(train_loader, val_loader)
        assert r2 is not None and r2.materialize_train is want


# ---------------------------------------------------------------------------
# binned (histogram) on-device mAP — VERDICT r4 #3
# ---------------------------------------------------------------------------
def test_binned_map_matches_host_streaming(rng):
    """The device histogram metric is the exact twin of the host
    StreamingMAP at the SAME bin count (same bucketing, same tie
    semantics) — f32 vs f64 only."""
    from audio_tokens_tpu.utils.device_metrics import (
        binned_map_init, binned_map_result, binned_map_update,
    )
    from audio_tokens_tpu.utils.metrics import StreamingMAP

    n, c, bins = 200, 9, 512
    scores = rng.random((n, c)).astype(np.float32)
    scores[:20] = np.round(scores[:20] * 4) / 4  # saturated/tied buckets
    labels = (rng.random((n, c)) < 0.3).astype(np.float32)
    labels[:, -1] = 0.0  # zero-positive class excluded by both
    valid = np.ones(n, bool)
    valid[180:] = False  # padding rows: device excludes via the mask

    host = StreamingMAP(c, bins=bins)
    host.update(labels[:180], scores[:180])

    hist = binned_map_init(c, bins)
    for lo in range(0, n, 32):  # batched updates, like the epoch scan
        hist = binned_map_update(hist, scores[lo:lo + 32],
                                 labels[lo:lo + 32], valid[lo:lo + 32])
    got = float(binned_map_result(hist))
    assert got == pytest.approx(host.result()["mAP"], abs=1e-6)


def test_binned_map_close_to_exact(rng):
    """At a real bin count the histogram metric tracks the exact metric to
    well under the binning error bound (~1/bins)."""
    from audio_tokens_tpu.utils.device_metrics import (
        binned_map_init, binned_map_result, binned_map_update,
    )

    n, c, bins = 400, 7, 8192
    scores = rng.random((n, c)).astype(np.float32)
    labels = (rng.random((n, c)) < 0.2).astype(np.float32)
    valid = np.ones(n, bool)
    exact = float(macro_map_device(scores, labels, valid))
    hist = binned_map_update(binned_map_init(c, bins), scores, labels, valid)
    assert float(binned_map_result(hist)) == pytest.approx(exact, abs=2e-3)


@pytest.mark.parametrize("batch", [4, 8])  # 4: jit; 8: shard_map DP mesh
def test_binned_epoch_trajectory_identical_metric_close(token_ws, batch):
    """device_map_bins changes ONLY the metric: losses and params are
    bit-identical to the exact-metric run (the histogram rides the same
    scan), and the binned mAP stays within the binning error of exact."""
    results = {}
    for bins in (0, 4096):
        cfg = _cfg(token_ws, training_batch_size=batch, device_corpus="off",
                   device_map_bins=bins)
        trainer = Trainer(cfg)
        train_loader, val_loader = DataLoaderCreator(cfg).get_dataloaders()
        runner = DeviceEpochRunner(trainer.model, trainer.optimizer, cfg,
                                   trainer.mesh, trainer.use_lengths)
        runner.set_corpus("train", train_loader.ds, batch, cfg.max_seq_len)
        runner.set_corpus("validation", val_loader.ds, cfg.eval_batch_size,
                          cfg.max_seq_len)
        p, o = trainer._init_state(train_loader)
        step, hist = 0, []
        for epoch in range(cfg.epochs):
            p, o, step, loss, m = runner.train_epoch(
                p, o, trainer._root_key, epoch, step)
            hist.append((loss, m["mAP"]))
        ev_loss, ev_m = runner.eval_epoch(p)
        hist.append((ev_loss, ev_m["mAP"]))
        results[bins] = (hist, jax.device_get(p))

    (h0, p0), (h1, p1) = results[0], results[4096]
    for (l0, m0), (l1, m1) in zip(h0, h1):
        assert l1 == pytest.approx(l0, abs=1e-7)   # same training program
        # binned vs exact metric: early-training sigmoids cluster near 0.5
        # and the splits have 13/5 rows, so ONE bucket collision moves a
        # class AP by ~1/n_pos — the tolerance is the fixture's, not the
        # estimator's (semantics are pinned to 1e-6 against StreamingMAP
        # above; accuracy at real row counts in
        # test_binned_map_close_to_exact)
        assert m1 == pytest.approx(m0, abs=6e-2)
    for x, y in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-8)


def test_budget_forced_corpus_scale_residency(tmp_path, caplog):
    """A corpus whose EXACT-metric prediction buffers blow the budget (the
    2M-clip shape scaled down: many rows x 543 classes, so the 4x preds
    term dominates the token bytes) still trains device-resident end-to-end
    with device_map_bins set; with bins unset the trainer logs the
    device_map_bins hint and streams (VERDICT r4 #3 done-criterion)."""
    import logging

    from audio_tokens_tpu.train.device_epoch import corpus_nbytes

    n_clips, n_classes, bins = 600, 543, 128
    meta = tmp_path / "metadata"
    meta.mkdir(parents=True)
    fixtures.make_ontology(meta / "ontology.json")
    fixtures.make_segments_csv(meta / "balanced_train_segments.csv",
                               n_clips=n_clips)
    (tmp_path / "output").mkdir()
    base_kw = dict(epochs=1, num_classes=n_classes, max_seq_len=48,
                   training_batch_size=8, device_corpus="auto",
                   save_best_checkpoint=False)
    cfg = fixtures.test_config(tmp_path, **base_kw)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    split = json.loads(Path(cfg.split_file).read_text())
    rng = np.random.default_rng(5)
    for sp in ("train", "validation"):
        d = Path(cfg.dest_tokenized_path) / sp
        d.mkdir(parents=True)
        for y in split[sp]:
            np.save(d / f"{y}.npy",
                    rng.integers(0, cfg.vocab_size,
                                 int(rng.integers(30, 48))).astype(np.int64))

    loaders = DataLoaderCreator(cfg).get_dataloaders()
    pairs = list(zip(loaders, (cfg.training_batch_size, cfg.eval_batch_size)))
    est = lambda mb: sum(
        corpus_nbytes(len(ld.ds), bs, cfg.max_seq_len, cfg.n_mels, "tokens",
                      n_classes, cfg.vocab_size, map_bins=mb)
        for ld, bs in pairs)
    est_exact, est_binned = est(0), est(bins)
    budget_mb = max(1, int(np.ceil(est_binned / 2**20)))
    # the budget admits the binned run but not the exact one
    assert est_binned <= budget_mb * 2**20 < est_exact

    # exact metric: over budget -> streams, with the device_map_bins hint
    cfg0 = fixtures.test_config(tmp_path, device_map_bins=0,
                                device_corpus_budget_mb=budget_mb, **base_kw)
    t0 = Trainer(cfg0)
    l0 = DataLoaderCreator(cfg0).get_dataloaders()
    t0._init_state(l0[0])
    with caplog.at_level(logging.INFO):
        assert t0._maybe_device_runner(*l0) is None
    assert any("set device_map_bins" in r.message for r in caplog.records)

    # binned metric: fits -> trains device-resident end-to-end
    cfg1 = fixtures.test_config(tmp_path, device_map_bins=bins,
                                device_corpus_budget_mb=budget_mb, **base_kw)
    t1 = Trainer(cfg1)
    l1 = DataLoaderCreator(cfg1).get_dataloaders()
    t1._init_state(l1[0])
    assert t1._maybe_device_runner(*l1) is not None
    val_loss, metrics = t1.run()
    assert np.isfinite(val_loss)
    assert 0.0 <= metrics["mAP"] <= 1.0
