"""Sustained-serving benchmark: disk -> decode -> device tokenize, overlapped.

BASELINE.md's headline clips/s is the device-resident steady state; this tool
measures the full serving loop — a host thread pool decodes+pads the NEXT
batch while the device tokenizes the current one (double buffering), so the
number includes disk reads, FLAC/WAV decode, padding, and the host->device
transfer.  On hosts with a real PCIe link and many cores the device remains
the bottleneck; on 1-core sandboxes this honestly reports the host-bound
rate instead.

Usage: python -m audio_tokens_tpu.tools.serve_bench [--n_clips 512]
       [--batch 64] [--seconds 10] [--vocab 500]
"""

from __future__ import annotations

import argparse
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np


def make_corpus(base: Path, n_clips: int, seconds: float, sr: int) -> list:
    from audio_tokens_tpu.data.audio_io import write_pcm_wav

    rng = np.random.default_rng(0)
    paths = []
    t = np.arange(int(sr * seconds)) / sr
    for i in range(n_clips):
        f0 = 80.0 * (1 + (i % 16))
        x = (0.5 * np.sin(2 * np.pi * f0 * t)
             + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
        x /= np.abs(x).max()
        p = base / f"clip{i:05d}.wav"
        write_pcm_wav(p, x, sr)
        paths.append(p)
    return paths


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_clips", type=int, default=512)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--vocab", type=int, default=500)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--tier", default="highest")
    parser.add_argument("--wire", default="f32", choices=("f32", "i16"),
                        help="host->device waveform format: i16 PCM halves "
                        "the transfer (exact for mono 16-bit sources at the "
                        "target rate)")
    parser.add_argument("--classify", default=None,
                        help="model_type: serve the FULL wav->probs fused "
                        "program (export.ServingProgram; random-init params) "
                        "instead of wav->tokens")
    parser.add_argument("--latency", type=int, default=0, metavar="N",
                        help="also measure single-request (batch=1) "
                        "end-to-end latency over N requests and report "
                        "p50/p90/p99 — the serving-tail metric the "
                        "throughput loop hides (requests arrive one at a "
                        "time in production; batching trades latency for "
                        "the throughput numbers above)")
    # extra --field value pairs overlay the config (e.g.
    # --transformer_max_position 1728 for full-clip bert serving)
    args, rest = parser.parse_known_args()

    import jax
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.data import native_loader
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    cfg = AudioTokensConfig(
        clip_seconds=args.seconds, vocab_size=args.vocab,
        tokenizer_precision=args.tier,
        **({"model_type": args.classify} if args.classify else {}),
        **AudioTokensConfig.parse_overrides(rest),
    )
    rng = np.random.default_rng(7)
    cent = rng.standard_normal((args.vocab, cfg.n_mels)).astype(np.float32)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True) + 1e-10
    tok = FusedTokenizer(cfg, cent)

    base = Path(tempfile.mkdtemp(prefix="atk_serve_"))
    import atexit
    import shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    paths = make_corpus(base, args.n_clips, args.seconds, cfg.common_sr)
    use_native = native_loader.available()
    alloc = getattr(tok.frontend, "alloc_len", tok.frontend.padded_len)

    wire_dtype = np.int16 if args.wire == "i16" else np.float32

    def decode_batch(batch_paths, pad_to=args.batch):
        if use_native:
            batch, lengths = native_loader.decode_batch(
                batch_paths, cfg.common_sr, cfg.clip_samples, cfg.n_fft,
                n_threads=args.workers,
                row_len=alloc,  # >= clip+2*pad always (mel.py:158)
                dtype=wire_dtype,
            )  # decoded straight at megakernel stride: no host re-pad copy
            if batch.shape[0] < pad_to:
                batch = np.pad(batch, ((0, pad_to - batch.shape[0]), (0, 0)))
            return batch
        from audio_tokens_tpu.data.audio_io import decode_audio

        waves = [decode_audio(p, target_sr=cfg.common_sr)[0]
                 for p in batch_paths]
        batch, _ = tok.frontend.prepare_batch(waves)
        if wire_dtype is np.int16:
            # keep the reported wire format honest on the python fallback
            # (prepare_batch is float32-only)
            batch = np.clip(np.rint(batch * 32768.0), -32768, 32767
                            ).astype(np.int16)
        if batch.shape[0] < pad_to:
            batch = np.pad(batch, ((0, pad_to - batch.shape[0]), (0, 0)))
        return batch

    batches = [paths[i : i + args.batch]
               for i in range(0, len(paths), args.batch)]
    if args.classify:
        from audio_tokens_tpu.export import ServingProgram

        prog = ServingProgram.from_components(cfg, tok)
        full_len = np.full(args.batch, cfg.clip_samples, np.int32)

        def device_stage(host_batch):
            return prog.fn(jnp.asarray(host_batch), jnp.asarray(full_len))[2]
    else:
        def device_stage(host_batch):
            return tok.tokens_from_padded(jnp.asarray(host_batch))
    # warm both stages (compile + page cache)
    first = decode_batch(batches[0])
    probe = jax.jit(lambda o: o[0, 0])
    float(probe(device_stage(first)))

    # stage rates first, so the sustained number is attributable
    t0 = time.perf_counter()
    decode_batch(batches[0])
    decode_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(probe(device_stage(first)))
    dev_s = time.perf_counter() - t0
    mb = first.nbytes / 2**20
    print(f"stages per {args.batch}-clip batch: decode {decode_s*1e3:.0f} ms, "
          f"transfer+tokenize {dev_s*1e3:.0f} ms ({mb:.0f} MB/batch "
          "crosses the host->device link)")

    pool = ThreadPoolExecutor(max_workers=1)  # pipeline stage: decode-ahead
    t0 = time.perf_counter()
    nxt = pool.submit(decode_batch, batches[0])
    out = None
    for i in range(len(batches)):
        host_batch = nxt.result()
        if i + 1 < len(batches):
            nxt = pool.submit(decode_batch, batches[i + 1])
        out = device_stage(host_batch)
    float(probe(out))  # value fetch = true device sync
    dt = time.perf_counter() - t0
    cps = len(paths) / dt
    what = (f"disk->decode->probs[{args.classify}]" if args.classify
            else "disk->decode->tokens")
    print(f"serving ({what}, double-buffered, tier={args.tier}, "
          f"wire={args.wire}, {'native' if use_native else 'python'} decode): "
          f"{cps:.0f} clips/s over {len(paths)} clips "
          f"({dt:.2f}s, {len(paths) * args.seconds / dt:.0f}x realtime)")

    if args.latency > 0:
        # single-request (batch=1) tail latency: one clip arrives, is
        # decoded, crosses the link, runs the device program, and the result
        # is fetched — the path a production request takes when it cannot
        # wait for a batch to fill.  Separate B=1 compile (new shape).
        if args.classify:
            one_len = jnp.full(1, cfg.clip_samples, jnp.int32)

            def device_one(host_one):
                return prog.fn(jnp.asarray(host_one), one_len)[2]
        else:
            def device_one(host_one):
                return tok.tokens_from_padded(jnp.asarray(host_one))

        warm = decode_batch(paths[:1], pad_to=1)
        float(probe(device_one(warm)))  # compile the B=1 program
        lat_ms, dec_ms = [], []
        for i in range(args.latency):
            p = paths[i % len(paths)]
            t0 = time.perf_counter()
            host_one = decode_batch([p], pad_to=1)
            t1 = time.perf_counter()
            float(probe(device_one(host_one)))  # fetch = request complete
            lat_ms.append((time.perf_counter() - t0) * 1e3)
            dec_ms.append((t1 - t0) * 1e3)
        q = lambda v, p_: float(np.percentile(np.asarray(v), p_))
        print(f"request latency (batch=1, {what}, n={args.latency}): "
              f"p50 {q(lat_ms, 50):.1f} ms / p90 {q(lat_ms, 90):.1f} / "
              f"p99 {q(lat_ms, 99):.1f} (decode p50 {q(dec_ms, 50):.1f} ms; "
              f"remainder = transfer + device + result fetch)")


if __name__ == "__main__":
    main()
