"""Multi-host execution tests: two REAL processes on the CPU backend
(jax.distributed + Gloo collectives) must reproduce the single-process
results for DP training and for the streaming sharded K-means.

This is the capability SURVEY.md §2.6/§5 specifies beyond the reference
(which is single-process, reference: processors/model_trainer.py:29-35):
meshes spanning processes with ``data`` as the DCN-outer axis, per-process
data sharding, and process-0 artifact discipline.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return env


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    """Run the two-process worker pair once; yield both result files."""
    outdir = tmp_path_factory.mktemp("mp")
    port = _free_port()
    # output to files, not pipes: a filled 64 KB pipe buffer would block one
    # worker mid-collective and deadlock the pair (drained sequentially here)
    logs = [outdir / f"worker_{pid}.log" for pid in (0, 1)]
    procs = []
    for pid in (0, 1):
        with open(logs[pid], "w") as log_f:  # Popen dups the fd
            procs.append(subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "mp_worker.py"),
                 str(port), str(pid), "2", str(outdir)],
                env=_clean_env(), cwd=REPO,
                stdout=log_f, stderr=subprocess.STDOUT,
            ))
    for p in procs:
        try:
            p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            p.wait()
    for pid, p in enumerate(procs):
        out = logs[pid].read_text()
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    return {
        pid: dict(np.load(outdir / f"result_{pid}.npz")) for pid in (0, 1)
    }


def _single_process_reference():
    """The same training recipe, single-process (this test process's
    8-device CPU mesh), via the same Trainer code path."""
    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.tools.bench_training import _MemLoader
    from audio_tokens_tpu.train.trainer import Trainer

    cfg = AudioTokensConfig(
        model_type="simple", vocab_size=32, hidden_size=16, num_classes=7,
        max_seq_len=24, training_batch_size=8, dropout=0.0,
        save_best_checkpoint=False, base_dir="/tmp/att-mp-ref",
    )
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(6):
        batches.append({
            "inputs": rng.integers(0, cfg.vocab_size, (8, 24)).astype(np.int32),
            "lengths": np.full((8,), 24, np.int32),
            "labels": (rng.random((8, cfg.num_classes)) < 0.3).astype(np.float32),
            "n_valid": 8,
        })
    loader = _MemLoader(batches)
    trainer = Trainer(cfg)
    params, opt_state = trainer._init_state(loader)
    train_step, eval_step = trainer._build_steps()
    step = 0
    losses = []
    for epoch in range(2):
        params, opt_state, step, loss, _ = trainer._train_epoch(
            train_step, params, opt_state, loader, epoch, step
        )
        losses.append(loss)
    eval_loss, eval_metrics = trainer._eval_epoch(eval_step, params, loader)
    return losses, eval_loss, eval_metrics["mAP"]


def test_two_process_dp_training_matches_single_process(mp_results):
    r0, r1 = mp_results[0], mp_results[1]
    # both processes observed identical (replicated) losses and metrics
    np.testing.assert_allclose(r0["train_losses"], r1["train_losses"],
                               rtol=0, atol=0)
    assert r0["eval_loss"] == r1["eval_loss"]
    assert r0["eval_map"] == r1["eval_map"]

    ref_losses, ref_eval, ref_map = _single_process_reference()
    # cross-process DP (grad psum over DCN) vs single-process: same math,
    # different reduction grouping -> fp-noise-level agreement
    np.testing.assert_allclose(r0["train_losses"], ref_losses,
                               rtol=1e-4, atol=1e-5)
    assert abs(float(r0["eval_loss"]) - ref_eval) < 1e-4
    assert abs(float(r0["eval_map"]) - ref_map) < 1e-3


def test_two_process_tokenizer_stage_matches_single_process(mp_results,
                                                            tmp_path):
    """The SpecTokenizer stage run by two processes (ytids sharded per
    process, proc-0 workspace setup + wipe, barriers between) produces the
    SAME full artifact set a single-process run does — bit for bit."""
    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer

    r0, r1 = mp_results[0], mp_results[1]
    np.testing.assert_array_equal(r0["token_cat"], r1["token_cat"])

    # identical workspace, single process (this test's own jax runtime)
    n_clips, n_mels = 9, 16
    srng = np.random.default_rng(11)
    cents = srng.standard_normal((8, n_mels)).astype(np.float32)
    specs = {f"clip{i:03d}": srng.standard_normal(
        (n_mels, 20 + 3 * i)).astype(np.float32) for i in range(n_clips)}
    ws = tmp_path / "tok_ws"
    for split in ("train", "validation"):
        (ws / "spectrograms" / split).mkdir(parents=True)
    for name, s in specs.items():
        np.save(ws / "spectrograms" / "train" / f"{name}.npy", s)
    np.save(ws / "spectrograms" / "validation" / "vclip.npy",
            srng.standard_normal((n_mels, 25)).astype(np.float32))
    (ws / "output").mkdir()
    np.save(ws / "output" / "centroids.npy", cents)
    cfg = AudioTokensConfig(
        base_dir=str(ws), n_mels=n_mels, vocab_size=8, incremental=False,
        device_batch_size=4, use_convolution=False,
    )
    SpecTokenizer(cfg).run()
    files = sorted((ws / "tokenized_audio" / "train").glob("*.npy"))
    assert len(files) == n_clips
    ref_cat = np.concatenate([np.load(f) for f in files])
    np.testing.assert_array_equal(r0["token_cat"], ref_cat)


def test_two_process_spectrogram_stage_matches_single_process(mp_results,
                                                              tmp_path):
    """The SpectrogramGenerator stage run by two processes (ytids sharded,
    proc-0 workspace + split setup, barriers) produces the same artifact set
    a single-process run does, bit for bit."""
    from tests import fixtures

    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )

    r0, r1 = mp_results[0], mp_results[1]
    np.testing.assert_array_equal(r0["spec_names"], r1["spec_names"])
    np.testing.assert_array_equal(r0["spec_cat"], r1["spec_cat"])

    ws = tmp_path / "spec_ws"
    fixtures.make_workspace(ws, n_clips=8)
    cfg = fixtures.test_config(ws, dataset_ratio=1.0)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    files = sorted((ws / "spectrograms" / "train").glob("*.npy"))
    assert [f.name for f in files] == list(r0["spec_names"])
    ref_cat = np.concatenate([np.load(f).ravel() for f in files])
    np.testing.assert_array_equal(r0["spec_cat"], ref_cat.astype(np.float32))


def test_two_process_full_pipeline_agrees(mp_results):
    """Capstone: clustering -> tokenization -> Trainer.run() executed by two
    processes over a shared workspace.  Both processes must observe
    identical (replicated/shared-artifact) centroids, tokens, and final
    metrics, and the trained model must beat chance on the fixture corpus."""
    r0, r1 = mp_results[0], mp_results[1]
    np.testing.assert_array_equal(r0["pipeline_centroids"],
                                  r1["pipeline_centroids"])
    np.testing.assert_array_equal(r0["pipeline_tokens"], r1["pipeline_tokens"])
    assert r0["pipeline_val_loss"] == r1["pipeline_val_loss"]
    assert r0["pipeline_val_map"] == r1["pipeline_val_map"]
    assert np.isfinite(r0["pipeline_val_loss"])
    assert 0.0 < float(r0["pipeline_val_map"]) <= 1.0


def test_two_process_streaming_kmeans_matches_single_process(mp_results):
    from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

    r0, r1 = mp_results[0], mp_results[1]
    np.testing.assert_array_equal(r0["centroids"], r1["centroids"])
    assert r0["obj"] == r1["obj"]
    assert int(r0["n_total"]) == 4096

    # single-process reference on the identical corpus/init
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    idx = rng.integers(0, 8, 4096)
    x = (centers[idx] + 0.1 * rng.standard_normal((4096, 16))).astype(np.float32)
    init = x[rng.choice(4096, 8, replace=False)].copy()
    feeds = [x[i : i + 600] for i in range(0, len(x), 600)]
    ref_c, ref_obj, n = kmeans_fit_streaming(
        lambda: iter(feeds), 8, niter=3, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128,
    )
    assert n == 4096
    # same multiset of points per Lloyd iteration, different packing order
    # -> fp reassociation noise only
    np.testing.assert_allclose(r0["centroids"], ref_c, rtol=2e-4, atol=2e-4)
    assert abs(float(r0["obj"]) - ref_obj) / abs(ref_obj) < 1e-4
