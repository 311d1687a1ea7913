"""Composed multi-process pipeline rehearsal (VERDICT r4 #1).

tests/test_multiprocess.py proves per-stage two-process bit-equality on tiny
fixtures; THIS test runs the full 4-stage pipeline — fused mode (no
spectrogram artifacts; clustering's all-device feed), the resident-frames
handoff into the tokenizer, and device-resident DP training — COMPOSED under
2 real processes on a 1,000-clip synthetic workspace, and asserts the
artifacts (centroids, token corpus, val metrics) match a single-process run
of the identical workspace.  The interplay this exercises and the per-stage
tests cannot: stage barriers back-to-back, per-process fused feed shards
flowing into the capacity-buffer layout, the handoff ownership across the
cluster->tokenize boundary, and the trainer's multi-process corpus
placement.  Reference counterpart: run_pipeline.py:8-14 at the README.md:29
unbalanced scale (the reference is single-process throughout).

Both runs use the SAME global device count (4) so the DP mesh and batch
assembly are identical: single = 1 process x 4 virtual CPU devices,
dual = 2 processes x 2 devices.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from tests import fixtures

REPO = Path(__file__).resolve().parents[1]
N_CLIPS = 1000


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # the worker sets JAX_PLATFORMS/XLA_FLAGS itself (per its ndev argument)
    env.pop("XLA_FLAGS", None)
    for k in ("AUDIO_TOKENS_COORDINATOR", "AUDIO_TOKENS_NUM_PROCESSES",
              "AUDIO_TOKENS_PROCESS_ID"):
        env.pop(k, None)
    return env


def _run_group(ws: Path, nproc: int, ndev: int) -> dict:
    """Launch nproc pipeline workers over ws; return {pid: result dict}."""
    port = _free_port()
    logs = [ws / f"worker_{pid}.log" for pid in range(nproc)]
    procs = []
    for pid in range(nproc):
        with open(logs[pid], "w") as log_f:
            procs.append(subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "mp_pipeline_worker.py"),
                 str(port), str(pid), str(nproc), str(ndev), str(ws),
                 str(ws)],
                env=_worker_env(), cwd=REPO,
                stdout=log_f, stderr=subprocess.STDOUT,
            ))
    for p in procs:
        try:
            p.wait(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            p.wait()
    for pid, p in enumerate(procs):
        out = logs[pid].read_text()
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-6000:]}"
    return {pid: dict(np.load(ws / f"result_{pid}.npz"))
            for pid in range(nproc)}


def _token_corpus(ws: Path) -> dict:
    out = {}
    for split in ("train", "validation"):
        files = sorted((ws / "tokenized_audio" / split).glob("*.npy"))
        out[split] = ([f.name for f in files],
                      np.concatenate([np.load(f) for f in files]))
    return out


@pytest.mark.slow
def test_composed_pipeline_two_processes_matches_single(tmp_path):
    workspaces = {}
    split_texts = {}
    for name in ("single", "dual"):
        base = tmp_path / name
        fixtures.make_workspace(base, n_clips=N_CLIPS)
        cfg = fixtures.test_config(base)
        DatasetSplitter(cfg).create_split_file(
            AudiosetMetadataProcessor(cfg))
        workspaces[name] = base
        split_texts[name] = (
            Path(cfg.split_file).read_text())
    # identical inputs by construction (seeded synth audio + seeded split)
    assert split_texts["single"] == split_texts["dual"]

    single = _run_group(workspaces["single"], nproc=1, ndev=4)
    dual = _run_group(workspaces["dual"], nproc=2, ndev=2)

    # the two processes observed identical (replicated) final metrics —
    # replication discipline is EXACT, unlike the cross-run comparison below
    assert dual[0]["val_loss"] == dual[1]["val_loss"]
    assert dual[0]["val_map"] == dual[1]["val_map"]

    # centroids: the same multiset of frames per Lloyd iteration, but the
    # per-feed psum grouping differs between 1 and 2 processes, so the fit
    # trajectory agrees to fp-reassociation noise only (the tolerance the
    # per-stage test pinned: tests/test_multiprocess.py::
    # test_two_process_streaming_kmeans_matches_single_process)
    c_single = np.load(workspaces["single"] / "output" / "centroids.npy")
    c_dual = np.load(workspaces["dual"] / "output" / "centroids.npy")
    np.testing.assert_allclose(c_dual, c_single, rtol=2e-3, atol=2e-3)

    # tokens: identical file sets; assignments may flip only where a frame
    # sits within centroid-noise of a Voronoi boundary — a composition bug
    # (missed clips, wrong shards, stale handoff) would blow the 99.9%
    t_single = _token_corpus(workspaces["single"])
    t_dual = _token_corpus(workspaces["dual"])
    for split in ("train", "validation"):
        assert t_single[split][0] == t_dual[split][0]
        a, b = t_single[split][1], t_dual[split][1]
        assert a.shape == b.shape
        agree = float(np.mean(a == b))
        assert agree >= 0.999, f"{split}: token agreement {agree:.5f}"

    # training: same global mesh over ~identical corpora
    assert np.isfinite(single[0]["val_loss"])
    np.testing.assert_allclose(dual[0]["val_loss"], single[0]["val_loss"],
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(dual[0]["val_map"], single[0]["val_map"],
                               rtol=0, atol=5e-2)
