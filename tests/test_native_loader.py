"""Native C++ decoder cross-checked against the pure-python reference
implementations on identical fixtures.  Skipped when the library isn't built
(CI builds it via `python native/build.py`)."""

import numpy as np
import pytest

from audio_tokens_tpu.data import native_loader
from audio_tokens_tpu.data.audio_io import decode_audio
from audio_tokens_tpu.ops.mel import reflect_pad_clip
from tests import fixtures
from tests.flac_encoder import encode_flac_fixed_order1, encode_flac_verbatim

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native decoder not built"
)


def test_native_wav_matches_python(tmp_path, rng):
    x = rng.random(22050).astype(np.float32) - 0.5
    fixtures.write_wav(tmp_path / "a.wav", x, sr=22050)
    native = native_loader.decode_file(tmp_path / "a.wav", 22050)
    python, _ = decode_audio(tmp_path / "a.wav", target_sr=22050)
    np.testing.assert_allclose(native, python, atol=1e-7)


def test_native_wav_stereo_downmix(tmp_path, rng):
    x = rng.random(8000).astype(np.float32) - 0.5
    fixtures.write_wav(tmp_path / "s.wav", x, sr=16000, channels=2)
    native = native_loader.decode_file(tmp_path / "s.wav", 16000)
    python, _ = decode_audio(tmp_path / "s.wav", target_sr=16000)
    np.testing.assert_allclose(native, python, atol=1e-6)


def test_native_resample_matches_python(tmp_path, rng):
    x = np.sin(np.arange(44100) * 0.03).astype(np.float32)
    fixtures.write_wav(tmp_path / "r.wav", x, sr=44100)
    native = native_loader.decode_file(tmp_path / "r.wav", 22050)
    python, _ = decode_audio(tmp_path / "r.wav", target_sr=22050)
    assert len(native) == len(python)
    np.testing.assert_allclose(native, python, atol=2e-5)


def test_native_flac_matches_python(tmp_path, rng):
    pcm = (rng.random((9000, 2)) * 60000 - 30000).astype(np.int32)
    (tmp_path / "m.flac").write_bytes(encode_flac_verbatim(pcm, 22050, block_size=4096))
    native = native_loader.decode_file(tmp_path / "m.flac", 22050)
    python, _ = decode_audio(tmp_path / "m.flac", target_sr=22050)
    np.testing.assert_allclose(native, python, atol=1e-6)


def test_native_flac_fixed_rice(tmp_path):
    ramp = np.cumsum(np.array([100, 3, -2, 5, 0, -7, 4, 4, -3, 2, 1, -1]))
    (tmp_path / "f.flac").write_bytes(encode_flac_fixed_order1(ramp, 22050, rice_param=2))
    native = native_loader.decode_file(tmp_path / "f.flac", 22050)
    np.testing.assert_allclose(native * 32768.0, ramp, atol=0.01)


def test_native_batch_layout_matches_reflect_pad(tmp_path, rng):
    """Batch rows must equal reflect_pad_clip of the python-decoded clip."""
    sr, clip_samples, n_fft = 22050, 22050, 256
    paths = []
    for i in range(5):
        x = fixtures.synth_clip(i, seconds=0.8)
        p = tmp_path / f"c{i}.wav"
        fixtures.write_wav(p, x, sr=sr)
        paths.append(p)
    batch, lengths = native_loader.decode_batch(paths, sr, clip_samples, n_fft,
                                                n_threads=3)
    assert batch.shape == (5, clip_samples + n_fft)
    for i, p in enumerate(paths):
        wav, _ = decode_audio(p, target_sr=sr)
        assert lengths[i] == min(len(wav), clip_samples)
        expect = reflect_pad_clip(wav, clip_samples, n_fft)
        np.testing.assert_allclose(batch[i], expect, atol=1e-6)


def test_native_batch_row_len_stride(tmp_path, rng):
    """row_len > clip+2*pad decodes straight at the wide (megakernel) stride:
    identical leading content, zero tail, no host re-pad copy needed."""
    sr, clip_samples, n_fft = 22050, 22050, 256
    paths = []
    for i in range(3):
        p = tmp_path / f"c{i}.wav"
        fixtures.write_wav(p, fixtures.synth_clip(i, seconds=0.8), sr=sr)
        paths.append(p)
    base, lengths = native_loader.decode_batch(paths, sr, clip_samples, n_fft)
    row_min = clip_samples + n_fft
    wide, lengths_w = native_loader.decode_batch(
        paths, sr, clip_samples, n_fft, row_len=row_min + 777
    )
    assert wide.shape == (3, row_min + 777)
    np.testing.assert_array_equal(lengths, lengths_w)
    np.testing.assert_array_equal(wide[:, :row_min], base)
    assert np.all(wide[:, row_min:] == 0)
    with pytest.raises(ValueError, match="row_len"):
        native_loader.decode_batch(paths, sr, clip_samples, n_fft,
                                   row_len=row_min - 1)


def test_native_flac_long_unary_runs(tmp_path):
    """Rice codes whose unary quotient is 63 produce 64-bit zero runs; a
    64-bit shift on that path is UB (masked to a no-op on x86), so decode
    must still match the pure-python decoder bit for bit."""
    sr, n = 22050, 1000
    # residual -32 at rice_param=0 encodes as zigzag 63 -> 63 zeros + 1
    samples = (-32 * np.arange(n)).astype(np.int64)
    samples = np.clip(samples, -32768, 32767).astype(np.int16)
    p = tmp_path / "u.flac"
    p.write_bytes(encode_flac_fixed_order1(samples, sr, rice_param=0))
    native = native_loader.decode_file(p, sr)
    python, _ = decode_audio(p, target_sr=sr)
    assert len(native) == n
    np.testing.assert_allclose(native, python, atol=1e-7)


def test_native_batch_int16_wire_format(tmp_path, rng):
    """dtype=int16 rows are round(x*32768); for 16-bit mono WAV at the
    target rate the f32 reconstruction s/32768 is bit-exact, so tokens from
    the i16 wire equal tokens from the f32 wire."""
    sr, clip_samples, n_fft = 22050, 22050, 256
    paths = []
    for i in range(3):
        p = tmp_path / f"c{i}.wav"
        fixtures.write_wav(p, fixtures.synth_clip(i, seconds=0.8), sr=sr)
        paths.append(p)
    f32, lengths = native_loader.decode_batch(paths, sr, clip_samples, n_fft)
    i16, lengths_i = native_loader.decode_batch(paths, sr, clip_samples,
                                                n_fft, dtype=np.int16)
    assert i16.dtype == np.int16
    np.testing.assert_array_equal(lengths, lengths_i)
    # 16-bit PCM source at target rate: exact roundtrip
    np.testing.assert_array_equal(i16.astype(np.float32) / 32768.0, f32)

    from audio_tokens_tpu.config import AudioTokensConfig
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    import jax.numpy as jnp

    cents = rng.standard_normal((8, 16)).astype(np.float32)
    cfg = AudioTokensConfig(common_sr=sr, n_mels=16, n_fft=n_fft,
                            hop_length=128, clip_seconds=1.0, vocab_size=8)
    tok = FusedTokenizer(cfg, cents, use_pallas=False)
    t_f32 = np.asarray(tok.tokens_from_padded(jnp.asarray(f32)))
    t_i16 = np.asarray(tok.tokens_from_padded(jnp.asarray(i16)))
    np.testing.assert_array_equal(t_f32, t_i16)


def test_native_batch_failed_decode_marked(tmp_path, rng):
    good = tmp_path / "g.wav"
    fixtures.write_wav(good, fixtures.synth_clip(0, 0.5), sr=22050)
    bad = tmp_path / "b.wav"
    bad.write_bytes(b"garbage")
    batch, lengths = native_loader.decode_batch(
        [good, bad, tmp_path / "missing.wav"], 22050, 22050, 256
    )
    assert lengths[0] > 0
    assert lengths[1] == -1 and lengths[2] == -1
    assert np.all(batch[1] == 0) and np.all(batch[2] == 0)


def test_native_truncates_long_clip(tmp_path):
    x = fixtures.synth_clip(1, seconds=2.0)
    p = tmp_path / "long.wav"
    fixtures.write_wav(p, x, sr=22050)
    clip_samples = 11025
    batch, lengths = native_loader.decode_batch([p], 22050, clip_samples, 256)
    assert lengths[0] == clip_samples


def test_native_truncated_streaminfo_rejected(tmp_path, rng):
    """A FLAC truncated inside the 34-byte STREAMINFO block must error
    cleanly, not read out of bounds (round-2 hardening)."""
    pcm = (rng.random((512, 1)) * 60000 - 30000).astype(np.int32)
    data = bytearray(encode_flac_verbatim(pcm, 22050, block_size=512))
    truncated = bytes(data[: 4 + 4 + 20])  # magic + block header + partial SI
    (tmp_path / "t.flac").write_bytes(truncated)
    with pytest.raises(RuntimeError, match="decode failed"):
        native_loader.decode_file(tmp_path / "t.flac", 22050)


def test_native_zero_sample_rate_rejected(tmp_path, rng):
    """STREAMINFO sample_rate == 0 must be rejected before the resampler
    divides by it."""
    pcm = (rng.random((512, 1)) * 60000 - 30000).astype(np.int32)
    data = bytearray(encode_flac_verbatim(pcm, 22050, block_size=512))
    # STREAMINFO layout: 16+16+24+24 bits = 10 bytes, then 20 bits of
    # sample rate starting at byte offset 8+10 in the file (magic=4,
    # header=4). Zero those 20 bits.
    off = 8 + 10
    data[off] = 0
    data[off + 1] = 0
    data[off + 2] &= 0x0F  # keep channels/bps bits in the low nibble
    (tmp_path / "z.flac").write_bytes(bytes(data))
    with pytest.raises(RuntimeError, match="decode failed"):
        native_loader.decode_file(tmp_path / "z.flac", 22050)


def test_native_garbage_bytes_never_crash(tmp_path, rng):
    """Random garbage with valid magics must error, never crash/hang."""
    for i in range(16):
        junk = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
        f = tmp_path / f"g{i}.flac"
        f.write_bytes(b"fLaC" + junk)
        with pytest.raises(RuntimeError):
            native_loader.decode_file(f, 22050)


def test_native_flac_random_streams_match_python(tmp_path, rng):
    """Randomized encoder round-trips: random PCM through verbatim and
    fixed-order-1 subframes at random rice parameters must decode
    identically in the native and pure-python decoders."""
    sr = 22050
    for trial in range(6):
        n = int(rng.integers(300, 9000))
        scale = float(rng.choice([50, 800, 20000]))
        pcm = np.clip(rng.standard_normal(n) * scale, -32768, 32767
                      ).astype(np.int16)
        if trial % 2 == 0:
            blob = encode_flac_verbatim(pcm, sr,
                                        block_size=int(rng.integers(64, 4096)))
        else:
            blob = encode_flac_fixed_order1(
                pcm, sr, rice_param=int(rng.integers(0, 14)))
        p = tmp_path / f"r{trial}.flac"
        p.write_bytes(blob)
        native = native_loader.decode_file(p, sr)
        python, _ = decode_audio(p, target_sr=sr)
        assert len(native) == n, (trial, len(native), n)
        np.testing.assert_allclose(native, python, atol=1e-7,
                                   err_msg=f"trial {trial}")


def test_nonfinite_samples_fail_decode_in_both_wire_formats(tmp_path):
    """NaN samples must surface as a decode failure for BOTH wire formats:
    int16 cannot carry a NaN marker (clamping would silently turn it into a
    full-scale spike), so the screen runs in the decoder itself."""
    import struct

    sr, n = 22050, 22050
    x = np.zeros(n, np.float32)
    x[100] = np.nan
    raw = x.tobytes()
    path = tmp_path / "nan.wav"
    with open(path, "wb") as f:  # minimal IEEE-float (fmt 3) WAV
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)

    for dtype in (np.float32, np.int16):
        batch, lengths = native_loader.decode_batch(
            [path], sr, n, 256, dtype=dtype)
        assert lengths[0] == -1, f"NaN clip decoded as valid ({dtype})"
        assert "non-finite" in native_loader.last_error()


def _write_float_wav(path, x, sr=22050):
    import struct

    raw = np.asarray(x, np.float32).tobytes()
    with open(path, "wb") as f:  # minimal IEEE-float (fmt 3) WAV
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)


def test_native_staged_and_wave_feeds_drop_same_extreme_clip(
        tmp_path_factory):
    """A finite but extreme-amplitude clip (|s| ~ 1e17: finite waveform,
    f32-overflowing |spec|^2) must be dropped by the NATIVE staged spec path
    and the wave feed alike — the staged and fused pipelines have to
    tokenize the SAME clip set (r4 review: the screen was on the wave feeds
    and the python backend only, so backends/routes diverged)."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )

    base = tmp_path_factory.mktemp("native_amp")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base, audio_backend="native",
                               fused_pipeline=False)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    gen = SpectrogramGenerator(cfg)
    ytids = sorted(gen.data_split["train"])[:4]
    bad = ytids[1]
    bad_path = gen.find_audio_file(bad)
    n = int(cfg.common_sr * 2.0)
    _write_float_wav(bad_path.with_suffix(".wav"), np.full(n, 1e17,
                                                           np.float32),
                     sr=cfg.common_sr)

    staged = [y for y, _ in gen._iter_specs_native(ytids)]
    assert bad not in staged and set(staged) == set(ytids) - {bad}

    wave_seen = []
    for batch, lengths, row_ytids in gen.iter_wave_batches(ytids):
        for r, y in enumerate(row_ytids):
            if y is not None and lengths[r] >= 0:
                wave_seen.append(y)
    assert set(wave_seen) == set(staged)
