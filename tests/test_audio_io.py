import numpy as np
import pytest

from audio_tokens_tpu.data.audio_io import (
    AudioDecodeError,
    decode_audio,
    read_wav,
    resample,
    to_mono,
)
from audio_tokens_tpu.data.flac import read_flac
from tests import fixtures
from tests.flac_encoder import encode_flac_fixed_order1, encode_flac_verbatim


def test_read_wav_roundtrip(tmp_path, rng):
    x = (rng.random(1000).astype(np.float32) - 0.5) * 1.8
    fixtures.write_wav(tmp_path / "a.wav", x, sr=16000)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == 16000
    assert y.shape == (1000, 1)
    # writer scales by 32767 + truncates; reader divides by 32768
    np.testing.assert_allclose(y[:, 0], np.clip(x, -1, 1), atol=2.5 / 32768)


def test_read_wav_stereo_downmix(tmp_path, rng):
    x = rng.random(500).astype(np.float32) - 0.5
    fixtures.write_wav(tmp_path / "s.wav", x, sr=8000, channels=2)
    y, sr = read_wav(tmp_path / "s.wav")
    assert y.shape == (500, 2)
    mono = to_mono(y)
    np.testing.assert_allclose(mono, y.mean(1), atol=1e-7)


def test_read_wav_rejects_garbage(tmp_path):
    (tmp_path / "bad.wav").write_bytes(b"not a wav file at all")
    with pytest.raises(AudioDecodeError):
        read_wav(tmp_path / "bad.wav")


def test_resample_identity():
    x = np.sin(np.arange(1000) * 0.05).astype(np.float32)
    assert resample(x, 22050, 22050) is x or np.array_equal(resample(x, 22050, 22050), x)


@pytest.mark.parametrize("orig,new", [(44100, 22050), (48000, 22050), (16000, 22050)])
def test_resample_preserves_tone(orig, new):
    """A pure tone must survive resampling with the right length + frequency."""
    f = 440.0
    dur = 0.5
    t = np.arange(int(orig * dur)) / orig
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = resample(x, orig, new)
    assert len(y) == int(np.ceil(new * len(x) / orig))
    # dominant DFT bin must be at f
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * new / len(y)
    assert abs(peak_hz - f) < 5.0
    # amplitude preserved within a few percent (away from edges)
    mid = y[len(y) // 4 : -len(y) // 4]
    assert np.max(np.abs(mid)) == pytest.approx(1.0, abs=0.05)


def test_flac_verbatim_roundtrip(tmp_path, rng):
    pcm = (rng.random(5000) * 60000 - 30000).astype(np.int32)
    (tmp_path / "v.flac").write_bytes(encode_flac_verbatim(pcm, 22050))
    y, sr = read_flac(tmp_path / "v.flac")
    assert sr == 22050
    np.testing.assert_allclose(y[:, 0] * 32768.0, pcm, atol=0.01)


def test_flac_multiframe_stereo(tmp_path, rng):
    pcm = (rng.random((9000, 2)) * 60000 - 30000).astype(np.int32)
    (tmp_path / "m.flac").write_bytes(encode_flac_verbatim(pcm, 44100, block_size=4096))
    y, sr = read_flac(tmp_path / "m.flac")
    assert sr == 44100 and y.shape == (9000, 2)
    np.testing.assert_allclose(y * 32768.0, pcm, atol=0.01)


def test_flac_constant_subframe(tmp_path):
    pcm = np.full(2000, 1234, dtype=np.int32)
    (tmp_path / "c.flac").write_bytes(encode_flac_verbatim(pcm, 22050))
    y, _ = read_flac(tmp_path / "c.flac")
    np.testing.assert_allclose(y[:, 0] * 32768.0, pcm, atol=0.01)


def test_flac_fixed_order1_rice(tmp_path):
    """Exercises FIXED predictor + rice residual decode."""
    ramp = np.cumsum(np.array([100, 3, -2, 5, 0, -7, 4, 4, -3, 2, 1, -1]))
    (tmp_path / "f.flac").write_bytes(encode_flac_fixed_order1(ramp, 22050, rice_param=2))
    y, _ = read_flac(tmp_path / "f.flac")
    np.testing.assert_allclose(y[:, 0] * 32768.0, ramp, atol=0.01)


def test_decode_audio_dispatches_and_resamples(tmp_path, rng):
    x = rng.random(44100).astype(np.float32) - 0.5
    fixtures.write_wav(tmp_path / "d.wav", x, sr=44100)
    mono, sr = decode_audio(tmp_path / "d.wav", target_sr=22050)
    assert sr == 22050
    assert len(mono) == 22050

    pcm = (x[:5000] * 32767).astype(np.int32)
    (tmp_path / "d.flac").write_bytes(encode_flac_verbatim(pcm, 44100))
    mono2, sr2 = decode_audio(tmp_path / "d.flac", target_sr=22050)
    assert sr2 == 22050 and len(mono2) == 2500

    with pytest.raises(AudioDecodeError):
        decode_audio(tmp_path / "x.mp3")
