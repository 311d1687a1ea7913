"""Megakernel precision-tier A/B: clips/s + token agreement per tier combo.

Reproduces the BASELINE.md tier tables on the chip — the 500-vocab fast-tier
rows and the 16k north-star-vocabulary rows (where the VQ distance GEMM is
~97% of the kernel FLOPs and `tokenizer_vq_precision` is the lever, see
ops/pallas_tokenizer.py).  All combos run in ONE process on ONE shared clip
batch so the ratios are honest under chip-speed drift; agreement is against
the all-`highest` (bit-exact) kernel of the same run.

Replaces: the reference has no precision tiers — its tokenizer is FAISS
IndexFlatL2 at f64/f32 on CPU/GPU (reference processors/spec_tokenizer.py).

Usage: python -m audio_tokens_tpu.tools.bench_tokenizer_tiers
       [--vocab 16384] [--batch 64] [--iters 10] [--seconds 10]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# (tokenizer_precision, tokenizer_vq_precision) combos benchmarked, in order
COMBOS = (
    ("highest", "highest"),
    ("highest", "bf16x3"),
    ("bf16x3", "bf16x3"),
    ("default", "default"),
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--vocab", type=int, default=16384)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--torch-mirror", action="store_true",
                        help="also time a torch-CPU mirror of the reference "
                             "pipeline (stft -> mel -> cdist argmin) at this "
                             "vocabulary for the speedup denominator")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops.pallas_tokenizer import (TokenizerKernel,
                                                       alloc_blocks)
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    sr, n_mels, n_fft, hop = 22050, 64, 512, 128
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((args.vocab, n_mels)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cfg = AudioTokensConfig(common_sr=sr, n_mels=n_mels, n_fft=n_fft,
                            hop_length=hop, clip_seconds=args.seconds,
                            vocab_size=args.vocab)
    tok = FusedTokenizer(cfg, cents, use_pallas=False)
    tok.frontend.alloc_len = max(
        tok.frontend.padded_len,
        alloc_blocks(tok.frontend.frames_max, hop, n_fft) * hop,
    )
    clips = [rng.standard_normal(int(sr * args.seconds)).astype(np.float32)
             for _ in range(args.batch)]
    batch, _ = tok.frontend.prepare_batch(clips)
    x = jax.device_put(jnp.asarray(batch))
    # the axon tunnel's block_until_ready does not wait: sync by fetching
    # one value of the last queued output (BASELINE.md timing note)
    probe = jax.jit(lambda o: o[0, 0])

    exact = None
    for tier, vq in COMBOS:
        kern = TokenizerKernel(sr, n_mels, n_fft, hop,
                               tok.frontend.frames_max, cents,
                               tier=tier, vq_tier=vq)
        toks = np.asarray(kern(x))
        if exact is None:
            exact = toks
        int(probe(kern(x)))  # warm + sync
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = kern(x)
        int(probe(out))
        dt = time.perf_counter() - t0
        agree = (toks == exact).mean()
        print(f"tier={tier}/{vq} chunk={kern.k_chunk}: "
              f"{args.batch * args.iters / dt:7.0f} clips/s "
              f"({dt / args.iters * 1e3:.1f} ms/batch), "
              f"agreement vs exact {agree * 100:.4f}%", flush=True)

    if args.torch_mirror:
        import torch

        from audio_tokens_tpu.ops.mel import hann_window, mel_filterbank

        torch.set_num_threads(16)  # reference spectrogram_generator.py:15
        fb = torch.from_numpy(mel_filterbank(n_fft // 2 + 1, n_mels, sr))
        win = torch.from_numpy(hann_window(n_fft))
        cent_t = torch.from_numpy(cents)

        def one_clip(x):
            wav = torch.from_numpy(x)
            spec = torch.stft(wav, n_fft, hop, window=win, center=True,
                              pad_mode="reflect", return_complex=True)
            power = spec.real**2 + spec.imag**2
            mel_db = 10.0 * torch.log10(torch.clamp(fb.T @ power, min=1e-10))
            frames = mel_db.T.contiguous()
            frames = frames / (frames.norm(dim=1, keepdim=True) + 1e-10)
            return torch.cdist(frames, cent_t).argmin(dim=1)

        ref_t = one_clip(clips[0]).numpy()
        agree = (ref_t == exact[0][: len(ref_t)]).mean()
        n_base = min(4, len(clips))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for x in clips[:n_base]:
                one_clip(x)
            best = min(best, time.perf_counter() - t0)
        print(f"torch-cpu mirror @ vocab {args.vocab}: "
              f"{best / n_base * 1e3:.0f} ms/clip -> "
              f"{n_base / best:.1f} clips/s (agreement vs exact kernel "
              f"{agree * 100:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
