"""Synthetic AudioSet-style fixtures: tiny ontology, segment CSV, wav clips.

The real AudioSet metadata/audio is large and external; tests run on a small
synthetic corpus with the same file layout the pipeline expects
(``{audio_source_path}/{set}/{ytid[:2]}/{ytid}.flac|.wav``, reference:
processors/spectrogram_generator.py:87-95).
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np

N_CLASSES = 7  # small dense label space for tests
N_CLIPS = 24
SR = 22050


def ytid_for(i: int) -> str:
    return f"yt{i:04d}xx"


def make_ontology(path: Path, n_classes: int = N_CLASSES) -> None:
    """n_classes unrestricted entries + 2 restricted ones (must be skipped)."""
    items = []
    for i in range(n_classes):
        items.append(
            {"id": f"/m/test{i:03d}", "name": f"Class {i}", "restrictions": []}
        )
        if i % 3 == 0:
            items.append(
                {
                    "id": f"/m/restricted{i:03d}",
                    "name": f"Restricted {i}",
                    "restrictions": ["abstract"],
                }
            )
    path.write_text(json.dumps(items))


def make_segments_csv(path: Path, n_clips: int = N_CLIPS, n_classes: int = N_CLASSES) -> None:
    rng = np.random.default_rng(7)
    lines = [
        "# Segments csv (synthetic)",
        f"# num_ytids={n_clips}, num_segs={n_clips}",
        "# YTID, start_seconds, end_seconds, positive_labels",
    ]
    for i in range(n_clips):
        k = int(rng.integers(1, 4))
        labs = rng.choice(n_classes, size=k, replace=False)
        lab_str = ",".join(f"/m/test{j:03d}" for j in sorted(labs))
        # every 5th clip also carries a restricted (droppable) label
        if i % 5 == 0:
            lab_str += ",/m/restricted000"
        lines.append(f'{ytid_for(i)}, 0.000, 10.000, "{lab_str}"')
    path.write_text("\n".join(lines) + "\n")


def write_wav(path: Path, samples: np.ndarray, sr: int = SR, channels: int = 1) -> None:
    """Write int16 PCM wav (shared helper; no soundfile in the image)."""
    from audio_tokens_tpu.data.audio_io import write_pcm_wav

    write_pcm_wav(path, samples, sr, channels)


def synth_clip(i: int, seconds: float = 2.0, sr: int = SR) -> np.ndarray:
    """Deterministic multi-tone + noise clip; varied lengths across i."""
    rng = np.random.default_rng(100 + i)
    n = int(sr * (seconds + 0.25 * (i % 4)))
    t = np.arange(n) / sr
    f0 = 110.0 * (1 + (i % 8))
    x = (
        0.5 * np.sin(2 * np.pi * f0 * t)
        + 0.25 * np.sin(2 * np.pi * 2.1 * f0 * t)
        + 0.05 * rng.standard_normal(n)
    )
    return (x / np.abs(x).max()).astype(np.float32)


def make_audio(root: Path, n_clips: int = N_CLIPS, source_set: str = "bal_train") -> None:
    for i in range(n_clips):
        ytid = ytid_for(i)
        path = root / source_set / ytid[:2] / f"{ytid}.wav"
        write_wav(path, synth_clip(i), channels=2 if i % 6 == 0 else 1)


def make_workspace(base: Path, n_clips: int = N_CLIPS) -> None:
    meta = base / "metadata"
    meta.mkdir(parents=True, exist_ok=True)
    make_ontology(meta / "ontology.json")
    make_segments_csv(meta / "balanced_train_segments.csv", n_clips=n_clips)
    make_audio(base / "audioset", n_clips=n_clips)
    (base / "output").mkdir(exist_ok=True)


def test_config(base: Path, **overrides):
    """An AudioTokensConfig sized for the synthetic corpus."""
    from audio_tokens_tpu.config import AudioTokensConfig

    defaults = dict(
        base_dir=str(base),
        dataset_ratio=1.0,
        validation_ratio=0.25,
        num_classes=N_CLASSES,
        vocab_size=16,
        niter=4,
        clip_seconds=3.0,
        device_batch_size=4,
        n_mels=32,
        n_fft=256,
        hop_length=128,
        max_seq_len=544,
        epochs=2,
        training_batch_size=4,
        hidden_size=32,
        lstm_embed_dim=16,
        lstm_hidden_dim=24,
    )
    defaults.update(overrides)
    return AudioTokensConfig(**defaults)
