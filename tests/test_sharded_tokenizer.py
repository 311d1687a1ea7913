"""Sharded fused tokenizer: 8-device data-parallel must equal single-device."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audio_tokens_tpu.tokenizer import FusedTokenizer
from tests import fixtures


def test_tokens_sharded_matches_single(rng):
    assert len(jax.devices()) == 8
    from audio_tokens_tpu.config import AudioTokensConfig

    cfg = AudioTokensConfig(
        common_sr=22050, n_mels=32, n_fft=256, hop_length=128,
        clip_seconds=1.0, vocab_size=20,
    )
    cents = rng.standard_normal((20, 32)).astype(np.float32)
    tok = FusedTokenizer(cfg, cents)

    waves = [fixtures.synth_clip(i, seconds=1.0) for i in range(16)]
    batch, _ = tok.frontend.prepare_batch(waves)
    x = np.asarray(batch)

    single = np.asarray(tok.tokens_from_padded(x))

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    sharded = np.asarray(tok.tokens_sharded(xs, mesh))
    np.testing.assert_array_equal(sharded, single)


def test_tokens_sharded_rejects_indivisible(rng):
    from audio_tokens_tpu.config import AudioTokensConfig

    cfg = AudioTokensConfig(
        common_sr=22050, n_mels=32, n_fft=256, hop_length=128,
        clip_seconds=1.0, vocab_size=8,
    )
    tok = FusedTokenizer(cfg, rng.standard_normal((8, 32)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    x = np.zeros((6, tok.frontend.padded_len), np.float32)
    with pytest.raises(ValueError, match="not divisible"):
        tok.tokens_sharded(x, mesh)


def test_tokens_sharded_decodes_i16_wire(rng):
    """The multi-chip entry point must reconstruct the int16 PCM wire format
    exactly like the single-chip one (s/32768 before any compute)."""
    from audio_tokens_tpu.config import AudioTokensConfig

    cfg = AudioTokensConfig(
        common_sr=22050, n_mels=32, n_fft=256, hop_length=128,
        clip_seconds=1.0, vocab_size=20,
    )
    cents = rng.standard_normal((20, 32)).astype(np.float32)
    tok = FusedTokenizer(cfg, cents)

    waves = [fixtures.synth_clip(i, seconds=1.0) for i in range(8)]
    batch, _ = tok.frontend.prepare_batch(waves)
    x = np.asarray(batch)
    xi16 = np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    f32 = np.asarray(
        tok.tokens_sharded(jax.device_put(
            xi16.astype(np.float32) / 32768.0,
            NamedSharding(mesh, P("data"))), mesh))
    i16 = np.asarray(
        tok.tokens_sharded(jax.device_put(
            xi16, NamedSharding(mesh, P("data"))), mesh))
    np.testing.assert_array_equal(i16, f32)
