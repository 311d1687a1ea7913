"""Golden-value tests for the GEMM-native mel frontend.

The expected values come from an INDEPENDENT numpy implementation (explicit
framing + np.fft.rfft in float64) of the torchaudio semantics the reference
uses: periodic Hann, power=2, center/reflect, HTK mel scale, norm=None,
AmplitudeToDB(power, top_db=None).
"""

import numpy as np
import pytest

from audio_tokens_tpu.ops.mel import (
    MelFrontend,
    hann_window,
    mel_filterbank,
    num_frames,
    reflect_pad_clip,
)


def _ref_hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _ref_mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def ref_mel_spectrogram(x, sr, n_mels, n_fft, hop):
    """Independent float64 reference: (n_mels, 1 + len//hop)."""
    pad = n_fft // 2
    xp = np.pad(x.astype(np.float64), pad, mode="reflect")
    n_frames = 1 + len(x) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_frames)])
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    spec = np.fft.rfft(frames * win, axis=1)
    power = np.abs(spec) ** 2  # (T, n_freq)

    # triangular HTK filterbank, norm=None
    n_freq = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freq)
    m_pts = np.linspace(_ref_hz_to_mel(0.0), _ref_hz_to_mel(sr / 2.0), n_mels + 2)
    f_pts = _ref_mel_to_hz(m_pts)
    fb = np.zeros((n_freq, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (all_freqs - lo) / (ctr - lo)
        down = (hi - all_freqs) / (hi - ctr)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))

    mel = power @ fb  # (T, n_mels)
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).T


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(42)
    sr = 22050
    t = np.arange(sr) / sr  # 1 second
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(sr)
    return x.astype(np.float32)


def test_frame_count_matches_reference_defaults():
    # 10 s @ 22050 Hz, hop 128 => 1723 frames (SURVEY.md §6)
    assert num_frames(220500, 128) == 1723


def test_filterbank_matches_independent_construction():
    fb = mel_filterbank(257, 64, 22050)
    # independent construction from the reference impl above
    ref = ref_mel_spectrogram.__wrapped__ if hasattr(ref_mel_spectrogram, "__wrapped__") else None
    all_freqs = np.linspace(0, 22050 // 2, 257)
    m_pts = np.linspace(_ref_hz_to_mel(0.0), _ref_hz_to_mel(22050 / 2.0), 66)
    f_pts = _ref_mel_to_hz(m_pts)
    expect = np.zeros((257, 64))
    for m in range(64):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (all_freqs - lo) / (ctr - lo)
        down = (hi - all_freqs) / (hi - ctr)
        expect[:, m] = np.maximum(0.0, np.minimum(up, down))
    np.testing.assert_allclose(fb, expect, atol=1e-6)
    assert (fb >= 0).all() and fb.max() <= 1.0


def test_hann_window_periodic():
    w = hann_window(8)
    np.testing.assert_allclose(
        w, 0.5 * (1 - np.cos(2 * np.pi * np.arange(8) / 8)), atol=1e-7
    )
    assert w[0] == 0.0


def test_mel_frontend_matches_numpy_reference(clip):
    sr, n_mels, n_fft, hop = 22050, 64, 512, 128
    fe = MelFrontend(sr, n_mels, n_fft, hop, clip_samples=len(clip))
    batch, lengths = fe.prepare_batch([clip])
    out = np.asarray(fe(batch))[0]  # (n_mels, frames)
    expect = ref_mel_spectrogram(clip, sr, n_mels, n_fft, hop)
    assert out.shape[0] == n_mels
    out = out[:, : expect.shape[1]]
    np.testing.assert_allclose(out, expect, atol=5e-3, rtol=1e-4)


def test_batched_clips_match_solo_computation(clip):
    """A short clip batched next to a long one must produce identical valid
    frames to computing it alone (per-clip reflect padding correctness)."""
    sr, n_mels, n_fft, hop = 22050, 32, 256, 128
    short = clip[: sr // 2]
    fe = MelFrontend(sr, n_mels, n_fft, hop, clip_samples=len(clip))
    batch, lengths = fe.prepare_batch([clip, short])
    out = np.asarray(fe(batch))

    fe_solo = MelFrontend(sr, n_mels, n_fft, hop, clip_samples=len(short))
    solo_batch, _ = fe_solo.prepare_batch([short])
    solo = np.asarray(fe_solo(solo_batch))[0]

    n_valid = num_frames(len(short), hop)
    np.testing.assert_allclose(out[1, :, :n_valid], solo[:, :n_valid], atol=1e-4)


def test_normalized_uses_valid_frames_only(clip):
    sr = 22050
    short = clip[: sr // 2]
    fe = MelFrontend(sr, 32, 256, 128, clip_samples=len(clip))
    batch, lengths = fe.prepare_batch([clip, short])
    norm = np.asarray(fe.normalized(batch, lengths))
    for i, n in enumerate([num_frames(len(clip), 128), num_frames(len(short), 128)]):
        valid = norm[i, :, :n]
        assert valid.min() == pytest.approx(0.0, abs=1e-6)
        assert valid.max() == pytest.approx(1.0, abs=1e-6)


def test_reflect_pad_layout():
    x = np.arange(10, dtype=np.float32)
    out = reflect_pad_clip(x, total_len=12, n_fft=8)
    np.testing.assert_array_equal(out[:4], [4, 3, 2, 1])
    np.testing.assert_array_equal(out[4:14], x)
    np.testing.assert_array_equal(out[14:18], [8, 7, 6, 5])
    np.testing.assert_array_equal(out[18:], [0, 0])


def test_normalized_silence_is_finite(clip):
    """Digital silence clamps every dB bin to the same floor (min == max);
    the min-max normalize must produce zeros, not 0/0 NaN (the reference let
    the NaN through and dropped the clip downstream — serving paths here
    must stay NaN-free by construction)."""
    from audio_tokens_tpu.ops.mel import MelFrontend

    fe = MelFrontend(sample_rate=22050, n_mels=16, n_fft=256, hop_length=128,
                     clip_samples=22050, normalize=True)
    batch, lengths = fe.prepare_batch([np.zeros(22050, np.float32)])
    norm = np.asarray(fe.normalized(batch, lengths))
    assert np.isfinite(norm).all()
    assert (norm == 0.0).all()
