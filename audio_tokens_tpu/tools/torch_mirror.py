"""Torch-CPU mirror of the reference wav->tokens pipeline — the speedup
denominator for bench.py and bench_tokenizer_tiers.

The reference's exact stack (torchaudio decode + FAISS IndexFlatL2) is not
installable in this image, so this mirrors the same kernels it ran:
torch.stft (center/reflect, the torchaudio MelSpectrogram contract) ->
mel filterbank GEMM -> dB -> L2 normalize -> cdist argmin
(reference: processors/spectrogram_generator.py:28-34,123-126 and
processors/spec_tokenizer.py:76-78,123-127).  ONE definition so the two
benchmarks cannot drift numerically.
"""

from __future__ import annotations

import time

import numpy as np


def make_one_clip(sample_rate: int, n_mels: int, n_fft: int, hop: int,
                  centroids: np.ndarray):
    """torch-CPU clip tokenizer closure (reference thread count)."""
    import torch

    from audio_tokens_tpu.ops.mel import hann_window, mel_filterbank

    torch.set_num_threads(16)  # reference: spectrogram_generator.py:15
    fb = torch.from_numpy(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    win = torch.from_numpy(hann_window(n_fft))
    cent = torch.from_numpy(np.asarray(centroids, np.float32))

    def one_clip(x: np.ndarray):
        import torch

        wav = torch.from_numpy(x)
        spec = torch.stft(wav, n_fft, hop, window=win, center=True,
                          pad_mode="reflect", return_complex=True)
        power = spec.real**2 + spec.imag**2  # (F, T)
        mel_db = 10.0 * torch.log10(torch.clamp(fb.T @ power, min=1e-10))
        frames = mel_db.T.contiguous()
        frames = frames / (frames.norm(dim=1, keepdim=True) + 1e-10)
        return torch.cdist(frames, cent).argmin(dim=1)

    return one_clip


def best_of_3_rate(clips, one_clip) -> float:
    """clips/s, best of 3 passes (the CPU baseline is load-sensitive;
    its fastest run gives the most conservative reported speedup)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for x in clips:
            one_clip(x)
        best = min(best, time.perf_counter() - t0)
    return len(clips) / best
