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
        from audio_tokens_tpu.tools.torch_mirror import (best_of_3_rate,
                                                         make_one_clip)

        one_clip = make_one_clip(sr, n_mels, n_fft, hop, cents)
        ref_t = one_clip(clips[0]).numpy()
        agree = (ref_t == exact[0][: len(ref_t)]).mean()
        n_base = min(4, len(clips))
        cps = best_of_3_rate(clips[:n_base], one_clip)
        print(f"torch-cpu mirror @ vocab {args.vocab}: "
              f"{1e3 / cps:.0f} ms/clip -> "
              f"{cps:.1f} clips/s (agreement vs exact kernel "
              f"{agree * 100:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
