"""Megakernel planning logic + interpret-mode end-to-end parity (the
compiled kernel itself requires real TPU hardware — exercised by bench.py
and the TPU-side verification; interpret mode checks the same program
graph, including the K-chunked running argmin and the DMA schedule)."""

import numpy as np
import pytest

from audio_tokens_tpu.ops.pallas_tokenizer import alloc_blocks, plan_tiles


@pytest.mark.parametrize("n_frames", [1723, 1728, 128, 345, 5000])
def test_plan_tiles_covers_frames(n_frames):
    tile_t, n_tiles = plan_tiles(n_frames, 128, 512)
    assert tile_t % 128 == 0
    assert n_tiles * tile_t >= n_frames
    assert n_tiles * tile_t - n_frames < tile_t  # no gratuitous waste


def test_alloc_blocks_covers_last_window():
    hop, n_fft = 128, 512
    for n_frames in (1723, 345, 128):
        tile_t, n_tiles = plan_tiles(n_frames, hop, n_fft)
        n_blocks = alloc_blocks(n_frames, hop, n_fft)
        r = n_fft // hop
        # last DMA window: rows (n_tiles-1)*tile_t .. + tile_t + r
        assert (n_tiles - 1) * tile_t + tile_t + r <= n_blocks + r


def test_fused_tokenizer_kernel_gating(rng):
    """Off-TPU the megakernel must be disabled; conv front-end disables it."""
    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops.conv_features import ConvFeatures
    from audio_tokens_tpu.tokenizer import FusedTokenizer
    from audio_tokens_tpu.utils.seeding import key_for

    cfg = AudioTokensConfig(
        common_sr=22050, n_mels=32, n_fft=256, hop_length=128,
        clip_seconds=1.0, vocab_size=8,
    )
    cents = rng.standard_normal((8, 32)).astype(np.float32)
    tok = FusedTokenizer(cfg, cents)  # CPU in tests
    assert tok.kernel is None

    tok2 = FusedTokenizer(
        cfg, rng.standard_normal((8, 320)).astype(np.float32),
        conv=ConvFeatures(10, 3, key_for(0, "c")), use_pallas=False,
    )
    assert tok2.kernel is None


@pytest.mark.slow
@pytest.mark.parametrize("vocab", [48, 300])
def test_megakernel_interpret_matches_xla(rng, vocab):
    """Interpret-mode megakernel == XLA fused path bit-exactly, for both a
    single-chunk vocab and a K-chunked one (vocab > k_chunk forces the
    running-argmin carry across the third grid dimension)."""
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops import pallas_tokenizer
    from audio_tokens_tpu.ops.pallas_tokenizer import TokenizerKernel
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    sr, nm, nf, hop = 22050, 32, 256, 128
    cents = rng.standard_normal((vocab, nm)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cfg = AudioTokensConfig(common_sr=sr, n_mels=nm, n_fft=nf, hop_length=hop,
                            clip_seconds=1.5, vocab_size=vocab)
    tok = FusedTokenizer(cfg, cents, use_pallas=False)
    # small k_chunk so vocab=300 exercises the multi-chunk carry cheaply
    kern = TokenizerKernel(sr, nm, nf, hop, tok.frontend.frames_max,
                           cents, k_chunk_cap=128, interpret=True)
    assert kern.n_kc == (1 if vocab <= 128 else 3)
    tok.frontend.alloc_len = max(
        tok.frontend.padded_len,
        alloc_blocks(tok.frontend.frames_max, hop, nf) * hop,
    )
    clips = [rng.standard_normal(int(sr * s)).astype(np.float32)
             for s in (1.4, 0.9, 1.5)]
    batch, _ = tok.frontend.prepare_batch(clips)
    x = jnp.asarray(batch)
    ref = np.asarray(tok._tokens_impl(x))
    got = np.asarray(kern(x))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_megakernel_mostly_padded_trailing_chunk(rng):
    """K=1025 with a 512-wide chunk pads the vocab to 1536: the trailing
    chunk is 1 real centroid + 511 +inf-scored pad rows, and the running
    argmin must still agree with the flat XLA argmin (a FULLY padded chunk
    cannot occur — rounding k_pad up to whole chunks adds < one chunk)."""
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops import pallas_tokenizer
    from audio_tokens_tpu.ops.pallas_tokenizer import TokenizerKernel
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    sr, nm, nf, hop = 22050, 32, 256, 128
    vocab = 1025
    cents = rng.standard_normal((vocab, nm)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cfg = AudioTokensConfig(common_sr=sr, n_mels=nm, n_fft=nf, hop_length=hop,
                            clip_seconds=1.2, vocab_size=vocab)
    tok = FusedTokenizer(cfg, cents, use_pallas=False)
    kern = TokenizerKernel(sr, nm, nf, hop, tok.frontend.frames_max,
                           cents, k_chunk_cap=512, interpret=True)
    assert kern.n_kc == 3  # 1025 -> k_pad 1536 over 512-wide chunks
    tok.frontend.alloc_len = max(
        tok.frontend.padded_len,
        alloc_blocks(tok.frontend.frames_max, hop, nf) * hop,
    )
    clips = [rng.standard_normal(int(sr * 1.1)).astype(np.float32)
             for _ in range(2)]
    batch, _ = tok.frontend.prepare_batch(clips)
    x = jnp.asarray(batch)
    ref = np.asarray(tok._tokens_impl(x))
    got = np.asarray(kern(x))
    np.testing.assert_array_equal(got, ref)
    assert got.max() < vocab  # no padded index ever selected


def test_precision_tiers_validated():
    """Tier knob exists and rejects junk; the tiers' token agreement vs
    'highest' (99.997% bf16x3 / 99.3% default) is measured on real TPU by
    bench.py and documented in BASELINE.md — the kernel needs hardware."""
    from audio_tokens_tpu.ops.pallas_tokenizer import TIERS, TokenizerKernel

    assert TIERS == ("highest", "bf16x3", "default")
    cent = np.zeros((8, 32), np.float32)
    for tier in TIERS:
        TokenizerKernel(22050, 32, 256, 128, 100, cent, tier=tier)
    with pytest.raises(ValueError, match="tier"):
        TokenizerKernel(22050, 32, 256, 128, 100, cent, tier="fp8")


def test_dot_tier_bf16x3_near_f32(rng):
    """The manual hi/lo decomposition reproduces f32 GEMMs to ~1e-6 rel."""
    from audio_tokens_tpu.ops.pallas_tokenizer import _dot_tier
    import jax

    a = rng.standard_normal((64, 128)).astype(np.float32)
    b = rng.standard_normal((128, 96)).astype(np.float32)
    dims = (((1,), (0,)), ((), ()))
    exact = np.asarray(_dot_tier(a, b, dims, "highest"))
    approx = np.asarray(_dot_tier(a, b, dims, "bf16x3"))
    scale = np.abs(exact).max()
    assert np.abs(approx - exact).max() / scale < 2e-5


@pytest.mark.parametrize("vq_tier", ["bf16x3", "default"])
def test_vq_tier_validated_and_interpret_agreement(rng, vq_tier):
    """tokenizer_vq_precision knob: junk rejected; in interpret mode the
    bf16 VQ distance tiers reproduce the exact kernel's tokens on
    well-separated centroids, both single-chunk and across the multi-chunk
    running-argmin carry with pre-split centroid operands (hardware
    rates/agreement: BASELINE.md)."""
    import jax.numpy as jnp

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.ops.pallas_tokenizer import TokenizerKernel
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    cent = np.zeros((8, 32), np.float32)
    with pytest.raises(ValueError, match="VQ precision"):
        TokenizerKernel(22050, 32, 256, 128, 100, cent, vq_tier="fp8")

    sr, nm, nf, hop, vocab = 22050, 32, 256, 128, 300
    cents = rng.standard_normal((vocab, nm)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cfg = AudioTokensConfig(common_sr=sr, n_mels=nm, n_fft=nf, hop_length=hop,
                            clip_seconds=1.0, vocab_size=vocab,
                            tokenizer_vq_precision=vq_tier)
    tok = FusedTokenizer(cfg, cents, use_pallas=False)
    exact = TokenizerKernel(sr, nm, nf, hop, tok.frontend.frames_max, cents,
                            interpret=True)
    fast = TokenizerKernel(sr, nm, nf, hop, tok.frontend.frames_max, cents,
                           vq_tier=vq_tier, interpret=True)
    # 300 centroids with a 128-wide chunk: 3 chunks, trailing pad rows
    chunked = TokenizerKernel(sr, nm, nf, hop, tok.frontend.frames_max,
                              cents, vq_tier=vq_tier, k_chunk_cap=128,
                              interpret=True)
    assert chunked.n_kc == 3
    tok.frontend.alloc_len = max(
        tok.frontend.padded_len,
        alloc_blocks(tok.frontend.frames_max, hop, nf) * hop,
    )
    clips = [rng.standard_normal(int(sr * 0.9)).astype(np.float32)]
    batch, _ = tok.frontend.prepare_batch(clips)
    x = jnp.asarray(batch)
    t_exact = np.asarray(exact(x))
    t_fast = np.asarray(fast(x))
    t_chunked = np.asarray(chunked(x))
    # 3-pass pseudo-f32 is ~exact; 1-pass bf16 flips ~1% of near-ties
    floor = 0.999 if vq_tier == "bf16x3" else 0.98
    assert (t_fast == t_exact).mean() > floor
    # same tier, chunked vs single-chunk: identical decisions
    np.testing.assert_array_equal(t_chunked, t_fast)
