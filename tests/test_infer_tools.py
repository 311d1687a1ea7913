"""Inference path, diagnostics, and tools tests."""

import io
import json
import tarfile
from contextlib import redirect_stdout
from pathlib import Path

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
def trained_ws(tmp_path_factory):
    """Full pipeline incl. a trained 'simple' model checkpoint."""
    base = tmp_path_factory.mktemp("infer_ws")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base, model_type="simple", epochs=2)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    ModelTrainer(cfg).run()
    return base, cfg


def test_manual_tester_end_to_end(trained_ws):
    base, cfg = trained_ws
    from audio_tokens_tpu.infer import ManualTester

    tester = ManualTester(cfg)
    split = json.loads(Path(cfg.split_file).read_text())
    ytid = split["validation"][0]
    buf = io.StringIO()
    with redirect_stdout(buf):
        rows = tester.run(ytid, top_k=5)
    out = buf.getvalue()
    assert len(rows) == 5
    assert rows[0]["score"] >= rows[-1]["score"]  # ranked
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    assert ytid in out
    # true labels flagged
    truths = set(AudiosetMetadataProcessor(cfg).get_ytid_labels(ytid))
    for r in rows:
        assert r["is_true"] == (r["class_index"] in truths)


def test_manual_tester_missing_ytid(trained_ws):
    base, cfg = trained_ws
    from audio_tokens_tpu.infer import ManualTester

    with pytest.raises(FileNotFoundError):
        ManualTester(cfg).run("doesnotexist")


def test_predictor_from_raw_waveform(trained_ws):
    base, cfg = trained_ws
    from audio_tokens_tpu.infer import Predictor

    p = Predictor(cfg)
    wave = fixtures.synth_clip(0)
    tokens, probs = p.predict_waveform(wave)
    assert probs.shape == (cfg.num_classes,)
    assert np.isfinite(probs).all() and (0 <= probs).all() and (probs <= 1).all()
    assert tokens.max() < cfg.vocab_size


def test_gradient_flow_and_loss_landscape(trained_ws):
    base, cfg = trained_ws
    import jax

    from audio_tokens_tpu.data.datasets import DataLoaderCreator
    from audio_tokens_tpu.models import get_model
    from audio_tokens_tpu.utils.diagnostics import (
        gradient_flow,
        loss_landscape,
        make_batch_loss,
    )
    from audio_tokens_tpu.utils.seeding import key_for

    model = get_model(cfg)
    loader, _ = DataLoaderCreator(cfg).get_dataloaders()
    batch = next(iter(loader.batches(0)))
    params = model.init(
        {"params": key_for(0, "diag")}, __import__("jax.numpy", fromlist=["asarray"]).asarray(batch["inputs"]),
        lengths=None, deterministic=True,
    )["params"]
    loss_fn = make_batch_loss(model, batch, use_lengths=False)

    report = gradient_flow(loss_fn, params, plot_path=base / "out" / "gradflow.png")
    assert any("classifier" in k for k in report)
    assert all(np.isfinite(v["mean_abs_grad"]) for v in report.values())
    assert (base / "out" / "gradflow.png").exists()

    grid = loss_landscape(loss_fn, params, key_for(0, "land"), steps=4,
                          plot_path=base / "out" / "landscape.png")
    assert grid.shape == (4, 4) and np.isfinite(grid).all()
    assert (base / "out" / "landscape.png").exists()


def test_check_overlap_tool(trained_ws, capsys):
    base, cfg = trained_ws
    from audio_tokens_tpu.tools.check_overlap import check_overlap

    assert check_overlap(cfg.split_file) == 0
    assert "no overlap" in capsys.readouterr().out


def test_verify_specs_tool(trained_ws, capsys):
    base, cfg = trained_ws
    from audio_tokens_tpu.tools.verify_specs import verify_specs

    assert verify_specs(cfg) == 0
    out = capsys.readouterr().out
    assert "0 bad" in out

    # corrupt one artifact -> nonzero exit
    bad = sorted((Path(cfg.source_spec_path) / "train").glob("*.npy"))[0]
    good = np.load(bad)
    np.save(bad, np.full_like(good, np.nan))
    try:
        assert verify_specs(cfg) == 1
    finally:
        np.save(bad, good)


def test_dataset_tester_tool(trained_ws, capsys, monkeypatch):
    base, cfg = trained_ws
    monkeypatch.setenv("AUDIO_TOKENS_HOME", str(base))
    from audio_tokens_tpu.tools.dataset_tester import main

    main(cfg)
    out = capsys.readouterr().out
    assert "train:" in out and "overlap: 0" in out


def test_expander_and_indexer_tools(tmp_path):
    from audio_tokens_tpu.tools.audioset_expander import expand_tar
    from audio_tokens_tpu.tools.sound_indexer import index_tars

    # build a tar of wavs
    src = tmp_path / "payload"
    for i in range(3):
        fixtures.write_wav(src / f"ytAAA{i:03d}.wav", fixtures.synth_clip(i, 0.3))
    tar_path = tmp_path / "batch0.tar"
    with tarfile.open(tar_path, "w") as tf:
        tf.add(src, arcname="payload")

    dest = tmp_path / "audioset"
    n = expand_tar(tar_path, dest, "bal_train")
    assert n == 3
    assert (dest / "bal_train" / "yt" / "ytAAA000.wav").exists()

    out_csv = tmp_path / "index.csv"
    assert index_tars(tmp_path, out_csv) == 3
    assert "ytAAA001" in out_csv.read_text()


def test_serve_bench_latency_mode(monkeypatch, capsys):
    """serve_bench --latency reports batch=1 request-tail percentiles
    alongside the batched-throughput loop (the serving metric a production
    request sees when it cannot wait for a batch to fill)."""
    import sys

    from audio_tokens_tpu.tools import serve_bench

    monkeypatch.setattr(sys, "argv", [
        "serve_bench", "--n_clips", "4", "--batch", "2",
        "--seconds", "0.5", "--vocab", "16", "--latency", "3",
    ])
    serve_bench.main()
    out = capsys.readouterr().out
    assert "request latency (batch=1" in out
    assert "p99" in out and "decode p50" in out
