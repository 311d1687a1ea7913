"""Mel-spectrogram frontend as one GEMM-native XLA program.

The reference computes per-clip mel spectrograms on the host/GPU with
torchaudio's MelSpectrogram + AmplitudeToDB
(reference: processors/spectrogram_generator.py:28-34,123-126).  Here the
whole frontend is a single batched device program designed for the MXU:

    waveform (B, T) --[shifted-block GEMMs vs windowed-DFT basis]--> re/im
                    --[square+add (VPU)]--> power
                    --[mel filterbank GEMM]--> mel
                    --[10*log10 (VPU)]--> dB

Framing + DFT is pure GEMM (the nnAudio / "DFT as convolution" construction,
restructured for the MXU): when ``hop_length`` divides ``n_fft`` (the default
512/128 case), the padded signal is viewed as (B, n_blocks, hop) and frame t
is the concatenation of blocks t..t+R-1 (R = n_fft/hop), so the DFT becomes R
shifted (B, T, hop) x (hop, 2*n_freq) matmuls summed — no gather, no strided
conv, no FFT butterfly, and XLA tiles it straight onto the systolic array
(measured 3.1x faster than the equivalent strided conv at HIGHEST precision
on v5e, max 1.5e-4 dB divergence).  A strided-conv fallback covers hop
settings that don't divide n_fft.

Numerical semantics match torchaudio defaults: periodic Hann window,
power=2.0 spectrum, HTK mel scale with no filter normalization,
f_min=0 / f_max=sr/2, center=True with reflect padding, and
AmplitudeToDB(stype="power", top_db=None) = 10*log10(max(x, 1e-10)).

Batching note: clips are padded to a fixed T on the host; *reflect* padding is
applied per-clip around the clip's true length (see :func:`reflect_pad_clip`)
so every valid frame is bit-comparable to the unbatched reference computation.
Valid frame count per clip is ``1 + len // hop``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def decode_wire(padded_batch: jax.Array) -> jax.Array:
    """Waveform wire format -> f32: int16 PCM rows (config.pcm_wire='i16')
    become s/32768; float rows pass through.  The ONE definition of the PCM
    wire decoding rule — MelFrontend._spectrum applies it, so EVERY device
    DSP path (staged spectrograms, the fused tokenizer, the all-device
    cluster feed, serving export) decodes identically and routing between
    them never changes numerics."""
    if padded_batch.dtype == jnp.int16:
        return padded_batch.astype(jnp.float32) * (1.0 / 32768.0)
    return padded_batch


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (torch.hann_window(periodic=True))."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(dtype)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular HTK-scale mel filterbank, shape (n_freqs, n_mels), norm=None."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(dtype)


def dft_filters(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann-windowed real-DFT basis as conv filters, shape (2*n_freq, 1, n_fft).

    Output channel k in [0, n_freq) is Re(X_k); channel n_freq+k is Im(X_k)
    so that conv(x, W)[2 blocks] reproduces rfft(x * window).
    """
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)[:, None]
    angle = 2.0 * np.pi * k * t[None, :] / n_fft
    win = hann_window(n_fft, dtype=np.float64)
    real = np.cos(angle) * win
    imag = -np.sin(angle) * win
    return np.concatenate([real, imag], axis=0)[:, None, :].astype(dtype)


def amplitude_to_db(power: jax.Array, amin: float = 1e-10) -> jax.Array:
    """torchaudio AmplitudeToDB(stype='power', top_db=None), ref=1.0."""
    return 10.0 * jnp.log10(jnp.maximum(power, amin))


def reflect_pad_clip(
    wave: np.ndarray, total_len: int, n_fft: int
) -> np.ndarray:
    """Host-side: center a clip in a fixed-length buffer with per-clip reflect pad.

    Layout: [reflect(head, n_fft//2) | clip | reflect(tail, n_fft//2) | zeros]
    with total buffer length ``n_fft//2 + total_len + n_fft//2``.  The device
    program then frames with VALID padding, so frame i of clip j equals the
    reference's centered frame i regardless of other clips' lengths.
    """
    pad = n_fft // 2
    n = wave.shape[0]
    if n > total_len:
        wave = wave[:total_len]
        n = total_len
    if n < pad + 1:
        raise ValueError(f"clip too short for reflect pad: {n} <= {pad}")
    out = np.zeros(pad + total_len + pad, dtype=np.float32)
    out[pad : pad + n] = wave
    out[:pad] = wave[1 : pad + 1][::-1]
    out[pad + n : pad + n + pad] = wave[n - pad - 1 : n - 1][::-1]
    return out


def num_frames(n_samples: int, hop_length: int) -> int:
    """Valid (centered) frame count for a clip of n_samples."""
    return 1 + n_samples // hop_length


class MelFrontend:
    """Batched waveform -> log-mel program with static shapes.

    Parameters mirror the reference config (reference:
    audio_tokens_config.py:36-40).  ``__call__`` takes a host-prepared padded
    batch (see :func:`reflect_pad_clip`) of shape (B, pad+T+pad) and returns
    (B, n_mels, frames_max) in float32.
    """

    def __init__(
        self,
        sample_rate: int = 22050,
        n_mels: int = 64,
        n_fft: int = 512,
        hop_length: int = 128,
        clip_samples: int = 220500,
        normalize: bool = False,
        compute_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ):
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.n_freq = n_fft // 2 + 1
        self.hop_length = hop_length
        self.clip_samples = clip_samples
        self.normalize = normalize
        self.compute_dtype = compute_dtype
        self.precision = precision
        self.frames_max = num_frames(clip_samples, hop_length)
        self.padded_len = n_fft // 2 + clip_samples + n_fft // 2
        self._use_gemm = n_fft % hop_length == 0
        filters = dft_filters(n_fft)  # (2F, 1, n_fft)
        if self._use_gemm:
            # transposed basis for the frame-GEMM path: (n_fft, 2F)
            self._basis = jnp.asarray(filters[:, 0, :].T)
            self._filters = None
        else:
            self._filters = jnp.asarray(filters)
            self._basis = None
        self._fbank = jnp.asarray(
            mel_filterbank(self.n_freq, n_mels, sample_rate)
        )

    def prepare_batch(self, waves) -> Tuple[np.ndarray, np.ndarray]:
        """Host: list of 1-D float arrays -> (padded (B, L), lengths (B,)).

        Rows are ``alloc_len`` long (>= padded_len; consumers like the Pallas
        tokenizer kernel may request extra zero tail for aligned DMA windows).
        """
        alloc_len = getattr(self, "alloc_len", self.padded_len)
        batch = np.zeros((len(waves), alloc_len), dtype=np.float32)
        lengths = np.zeros((len(waves),), dtype=np.int32)
        for i, w in enumerate(waves):
            batch[i, : self.padded_len] = reflect_pad_clip(
                np.asarray(w, dtype=np.float32), self.clip_samples, self.n_fft
            )
            lengths[i] = min(len(w), self.clip_samples)
        return batch, lengths

    def _spectrum(self, padded_batch: jax.Array) -> jax.Array:
        """(B, L) -> (B, T, 2F) windowed real-DFT re/im, fp32 accumulation."""
        padded_batch = decode_wire(padded_batch)  # i16 PCM wire -> f32
        if padded_batch.shape[1] > self.padded_len:  # alloc_len > padded_len
            padded_batch = padded_batch[:, : self.padded_len]
        b = padded_batch.shape[0]
        t_max = self.frames_max
        if self._use_gemm:
            hop, r = self.hop_length, self.n_fft // self.hop_length
            n_blocks = padded_batch.shape[1] // hop
            blocks = padded_batch[:, : n_blocks * hop].reshape(b, n_blocks, hop)
            blocks = blocks.astype(self.compute_dtype)
            # frame t = blocks[t..t+R-1] concatenated: one (B,T,n_fft) view
            # copy, then a single (n_fft, 2F) GEMM.  Measured faster than
            # summing R shifted GEMMs (fewer full-size partial accumulations).
            frames = jnp.concatenate(
                [blocks[:, j : j + t_max] for j in range(r)], axis=-1
            )  # (B, T, n_fft)
            return jax.lax.dot_general(
                frames,
                self._basis.astype(self.compute_dtype),
                (((2,), (0,)), ((), ())),
                precision=self.precision,
                preferred_element_type=jnp.float32,
            )  # (B, T, 2F)
        x = padded_batch[:, None, :].astype(self.compute_dtype)  # (B, 1, L)
        spec = jax.lax.conv_general_dilated(
            x,
            self._filters.astype(self.compute_dtype),
            window_strides=(self.hop_length,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=self.precision,
            preferred_element_type=jnp.float32,
        )  # (B, 2F, T)
        return jnp.transpose(spec, (0, 2, 1))

    @functools.partial(jax.jit, static_argnums=0)
    def mel_frames(self, padded_batch: jax.Array) -> jax.Array:
        """(B, L) -> (B, T, n_mels) log-mel, frame-major (VQ-friendly layout)."""
        spec = self._spectrum(padded_batch)
        re, im = spec[..., : self.n_freq], spec[..., self.n_freq :]
        power = re * re + im * im  # (B, T, F)
        mel = jnp.einsum(
            "btf,fm->btm",
            power.astype(self.compute_dtype),
            self._fbank.astype(self.compute_dtype),
            precision=self.precision,
            preferred_element_type=jnp.float32,
        )
        return amplitude_to_db(mel)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, padded_batch: jax.Array) -> jax.Array:
        """(B, L) -> (B, n_mels, T): the reference's artifact layout."""
        return jnp.transpose(self.mel_frames(padded_batch), (0, 2, 1))

    def frame_counts(self, lengths: jax.Array) -> jax.Array:
        return 1 + lengths // self.hop_length

    @functools.partial(jax.jit, static_argnums=0)
    def normalized(self, padded_batch: jax.Array, lengths: jax.Array) -> jax.Array:
        """Mel dB, then per-clip min-max to [0,1] over the VALID frames only
        (reference: processors/spectrogram_generator.py:128-131)."""
        mel = self(padded_batch)
        n_valid = self.frame_counts(lengths)  # (B,)
        t_idx = jnp.arange(mel.shape[-1])[None, None, :]
        valid = t_idx < n_valid[:, None, None]
        big = jnp.finfo(mel.dtype).max
        mn = jnp.min(jnp.where(valid, mel, big), axis=(1, 2), keepdims=True)
        mx = jnp.max(jnp.where(valid, mel, -big), axis=(1, 2), keepdims=True)
        # degenerate clips (digital silence: every valid bin clamps to the
        # same dB floor) map to zeros instead of 0/0 NaN — the reference let
        # the NaN through and its screen then dropped the clip; the staged
        # pipeline preserves that corpus behavior by skipping constant clips
        # explicitly (spectrogram_generator), while serving paths stay
        # NaN-free by construction
        rng_ok = mx > mn
        return jnp.where(
            rng_ok, (mel - mn) / jnp.where(rng_ok, mx - mn, 1.0), 0.0)
