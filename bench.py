"""Headline benchmark: wav -> token-ID throughput (clips/sec).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "clips/s", "vs_baseline": N}

* value        — clips/sec of the fused on-device wav->mel->VQ program
                 (steady state, inputs device-resident: the pipelined regime
                 where host transfer overlaps compute).
* vs_baseline  — speedup over a torch-CPU mirror of the reference pipeline
                 (clip-at-a-time stft -> mel -> dB -> L2 norm -> cdist argmin,
                 the same work FAISS+torchaudio did for the reference;
                 measured fresh on this machine since the reference publishes
                 no numbers — BASELINE.md).

Diagnostics (compile time, agreement check, kmeans throughput) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


SR = 22050
CLIP_SECONDS = 10.0
N_MELS, N_FFT, HOP = 64, 512, 128
VOCAB = 500
BATCH = 64  # throughput saturates at B>=64 on v5e (measured 32/64/128)
ITERS = 50  # enough to amortize per-dispatch RPC latency on tunneled setups


def make_clips(n: int) -> list:
    rng = np.random.default_rng(0)
    t = np.arange(int(SR * CLIP_SECONDS)) / SR
    clips = []
    for i in range(n):
        f0 = 80.0 * (1 + (i % 16))
        x = (
            0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(2 * np.pi * 2.3 * f0 * t)
            + 0.1 * rng.standard_normal(len(t))
        )
        clips.append(x.astype(np.float32))
    return clips


def bench_tpu(clips, centroids) -> tuple:
    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    cfg = AudioTokensConfig(
        common_sr=SR, n_mels=N_MELS, n_fft=N_FFT, hop_length=HOP,
        clip_seconds=CLIP_SECONDS, vocab_size=VOCAB,
    )
    tok = FusedTokenizer(cfg, centroids)
    batch, _ = tok.frontend.prepare_batch(clips)
    x = jax.device_put(jnp.asarray(batch))

    t0 = time.perf_counter()
    tokens = np.asarray(tok.tokens_from_padded(x))
    log(f"tpu compile+first run: {time.perf_counter() - t0:.1f}s on {jax.devices()[0]}")

    # value fetch = true device sync (block_until_ready is unreliable on some
    # experimental PJRT backends); programs execute in submission order, so
    # fetching (a scalar of) the last output proves all ITERS completed
    # without timing a bulk device->host transfer.
    probe = jax.jit(lambda o: o[0, 0])
    int(probe(tok.tokens_from_padded(x)))  # warm + sync (compiles probe too)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = tok.tokens_from_padded(x)
    int(probe(out))
    dt = time.perf_counter() - t0
    cps = BATCH * ITERS / dt
    log(f"tpu steady state: {dt / ITERS * 1e3:.1f} ms/batch of {BATCH} -> {cps:.1f} clips/s")
    return cps, tokens


def bench_torch_cpu(clips, centroids, tpu_tokens) -> float:
    import torch

    from audio_tokens_tpu.ops.mel import hann_window, mel_filterbank

    torch.set_num_threads(16)  # reference: processors/spectrogram_generator.py:15
    fb = torch.from_numpy(mel_filterbank(N_FFT // 2 + 1, N_MELS, SR))  # (F, M)
    win = torch.from_numpy(hann_window(N_FFT))
    cent = torch.from_numpy(centroids)

    def one_clip(x):
        wav = torch.from_numpy(x)
        spec = torch.stft(
            wav, N_FFT, HOP, window=win, center=True, pad_mode="reflect",
            return_complex=True,
        )
        power = spec.real**2 + spec.imag**2  # (F, T)
        mel_db = 10.0 * torch.log10(torch.clamp(fb.T @ power, min=1e-10))
        frames = mel_db.T.contiguous()
        frames = frames / (frames.norm(dim=1, keepdim=True) + 1e-10)
        return torch.cdist(frames, cent).argmin(dim=1)

    # agreement sanity check on clip 0
    ref_tokens = one_clip(clips[0]).numpy()
    n = len(ref_tokens)
    agree = (ref_tokens == tpu_tokens[0][:n]).mean()
    log(f"token agreement tpu vs torch-cpu reference: {agree * 100:.2f}%")

    # best-of-3: the CPU baseline is load-sensitive; taking its fastest run
    # gives the most conservative (smallest) reported speedup
    n_base = min(8, len(clips))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for x in clips[:n_base]:
            one_clip(x)
        best = min(best, time.perf_counter() - t0)
    cps = n_base / best
    log(f"torch-cpu baseline (best of 3): {best / n_base * 1e3:.1f} ms/clip -> {cps:.1f} clips/s")
    return cps


def bench_kmeans(centroids) -> None:
    """Secondary metric (stderr only): k-means Lloyd throughput."""
    from audio_tokens_tpu.ops.kmeans import kmeans_fit

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n, niter = 262_144, 10
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((n, N_MELS)).astype(np.float32))
    )
    kmeans_fit(x, VOCAB, niter, seed=0)  # compile this exact shape
    t0 = time.perf_counter()
    kmeans_fit(x, VOCAB, niter, seed=0)
    dt = time.perf_counter() - t0
    log(f"kmeans steady (device-resident): {n * niter / dt / 1e6:.1f}M point-iters/s "
        f"({n} pts x {niter} iters x k={VOCAB} x d={N_MELS} in {dt:.2f}s)")


def main() -> None:
    clips = make_clips(BATCH)
    rng = np.random.default_rng(7)
    centroids = rng.standard_normal((VOCAB, N_MELS)).astype(np.float32)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-10

    tpu_cps, tpu_tokens = bench_tpu(clips, centroids)
    base_cps = bench_torch_cpu(clips, centroids, tpu_tokens)
    try:
        bench_kmeans(centroids)
    except Exception as e:
        log(f"kmeans bench skipped: {e}")

    print(json.dumps({
        "metric": "wav_to_tokens_throughput",
        "value": round(tpu_cps, 2),
        "unit": "clips/s",
        "vs_baseline": round(tpu_cps / base_cps, 2),
    }))


if __name__ == "__main__":
    main()
