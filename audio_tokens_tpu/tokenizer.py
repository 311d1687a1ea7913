"""Fused wav -> token-ID program: the framework's flagship compute path.

In the reference a clip crosses the host/device boundary five times between
waveform and token sequence (SURVEY.md §3.2-3.4).  Here it never leaves the
device: framing+DFT (shifted-block GEMMs) -> mel GEMM -> dB -> [conv
features] -> fused normalize+distance+argmin compile into ONE program,
batched over clips.  The VQ step uses the Pallas kernel (ops/pallas_vq.py) on
TPU — normalize, distance GEMM and argmin never leave VMEM — and the chunked
XLA path elsewhere.

This is the program `bench.py` measures and `infer.py` serves.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.ops.mel import MelFrontend, decode_wire, num_frames
from audio_tokens_tpu.ops.conv_features import ConvFeatures
from audio_tokens_tpu.ops.pallas_vq import (
    _on_tpu,
    fits_vmem,
    vq_assign_pallas,
)
from audio_tokens_tpu.ops.vq import l2_normalize


class FusedTokenizer:
    def __init__(
        self,
        config: AudioTokensConfig,
        centroids: np.ndarray,
        conv: Optional[ConvFeatures] = None,
        compute_dtype=jnp.float32,
        use_pallas: Optional[bool] = None,
    ):
        self.config = config
        self.frontend = MelFrontend(
            sample_rate=config.common_sr,
            n_mels=config.n_mels,
            n_fft=config.n_fft,
            hop_length=config.hop_length,
            clip_samples=config.clip_samples,
            compute_dtype=compute_dtype,
        )
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.conv = conv
        self.compute_dtype = compute_dtype
        self.use_pallas = _on_tpu() if use_pallas is None else use_pallas
        if self.use_pallas and not fits_vmem(
            self.centroids.shape[0], self.centroids.shape[1]
        ):
            # only extreme feature widths exceed the (K-chunked) fused VQ
            # kernel's working set; the chunked XLA path handles anything
            self.use_pallas = False

        # Full wav->tokens megakernel (ops/pallas_tokenizer.py): engaged when
        # on TPU with no conv front-end, no per-clip min-max normalization
        # (which needs clip-global statistics), and hop | n_fft; the host
        # buffer is over-allocated so every DMA window is in-bounds.
        self.kernel = None
        if (
            self.use_pallas
            and conv is None
            and not config.normalize
            and config.n_fft % config.hop_length == 0
        ):
            from audio_tokens_tpu.ops.pallas_tokenizer import (
                TokenizerKernel,
                alloc_blocks,
                kernel_fits,
            )
        else:
            kernel_fits = None
        # the megakernel grid-chunks the vocabulary (running argmin carried
        # in VMEM scratch), so the 16k north-star vocab runs single-kernel;
        # only extreme feature widths route to the staged fused-VQ path
        if kernel_fits is not None and kernel_fits(
            self.centroids.shape[0], self.centroids.shape[1],
            hop=config.hop_length, n_fft=config.n_fft,
            vq_tier=getattr(config, "tokenizer_vq_precision", "highest"),
        ):

            self.kernel = TokenizerKernel(
                config.common_sr, config.n_mels, config.n_fft,
                config.hop_length, self.frontend.frames_max,
                np.asarray(centroids, np.float32),
                tier=getattr(config, "tokenizer_precision", "highest"),
                vq_tier=getattr(config, "tokenizer_vq_precision", "highest"),
            )
            self.frontend.alloc_len = max(
                self.frontend.padded_len,
                alloc_blocks(self.frontend.frames_max, config.hop_length,
                             config.n_fft) * config.hop_length,
            )

    @functools.partial(jax.jit, static_argnums=0)
    def tokens_from_padded(
        self, padded_batch: jax.Array, lengths: Optional[jax.Array] = None
    ) -> jax.Array:
        """(B, pad+T+pad) waveforms -> (B, frames_max) int32 token IDs.

        ``padded_batch`` may be float32 or the int16 PCM wire format
        (``native_loader.decode_batch(dtype=np.int16)``): int16 halves the
        host->device transfer and is reconstructed here as s/32768 before
        any compute.

        ``lengths`` (true sample counts) is required when ``config.normalize``
        — per-clip min-max scaling is computed over each clip's valid frames,
        matching what the spectrogram stage wrote to disk.
        """
        if self.config.normalize and lengths is None:
            raise ValueError("config.normalize=True requires lengths")
        return self._tokens_dispatch(decode_wire(padded_batch), lengths)

    def _tokens_dispatch(self, padded_batch, lengths=None):
        """Megakernel when engaged and the buffer is kernel-sized, else XLA."""
        if (
            self.kernel is not None
            and padded_batch.shape[1] >= self.kernel.n_blocks * self.kernel.hop
        ):
            return self.kernel(padded_batch)
        return self._tokens_impl(padded_batch, lengths)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def tokens_sharded(self, padded_batch: jax.Array, mesh,
                       lengths: Optional[jax.Array] = None) -> jax.Array:
        """Multi-chip tokenization: batch sharded over the mesh's 'data' axis.

        The program is embarrassingly batch-parallel, but the Pallas VQ kernel
        can't be auto-partitioned by GSPMD, so each device runs the full fused
        program on its local shard under shard_map (zero collectives).
        """
        from jax.sharding import PartitionSpec as P

        n_dev = mesh.shape["data"]
        if padded_batch.shape[0] % n_dev:
            raise ValueError(
                f"batch {padded_batch.shape[0]} not divisible by data={n_dev}"
            )
        # same wire handling as the single-chip entry point: int16 PCM
        # batches reconstruct as s/32768 BEFORE any compute (elementwise, so
        # sharding is unaffected)
        padded_batch = decode_wire(padded_batch)
        if self.config.normalize:
            if lengths is None:
                raise ValueError("config.normalize=True requires lengths")
            return jax.shard_map(
                self._tokens_impl, mesh=mesh,
                in_specs=(P("data"), P("data")), out_specs=P("data"),
                check_vma=False,  # pallas outputs carry no vma info
            )(padded_batch, lengths)
        return jax.shard_map(
            self._tokens_dispatch, mesh=mesh, in_specs=P("data"),
            out_specs=P("data"), check_vma=False,
        )(padded_batch)

    def _tokens_impl(
        self, padded_batch: jax.Array, lengths: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.config.normalize:
            # min-max over valid frames, like the saved artifacts
            mel = self.frontend.normalized(padded_batch, lengths)  # (B, M, T)
            mel = jnp.transpose(mel, (0, 2, 1))
        else:
            mel = self.frontend.mel_frames(padded_batch)  # (B, T, M)
        b, t, m = mel.shape
        frames = mel.reshape(b * t, m)
        if self.conv is not None:
            frames = self.conv(frames)
        if self.use_pallas:
            tokens = vq_assign_pallas(
                frames, self.centroids, normalize=True, interpret=False
            )
            return tokens.reshape(b, t)
        frames = l2_normalize(frames)
        c = self.centroids
        c2 = jnp.sum(c * c, axis=1)[None, :]
        cT = c.T.astype(self.compute_dtype)

        def assign(fr):
            scores = c2 - 2.0 * jnp.dot(
                fr.astype(self.compute_dtype), cT,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return jnp.argmin(scores, axis=1).astype(jnp.int32)

        # chunk the rows (lax.scan) so the (B*T, K) score matrix never
        # materializes — at the 16k vocabulary a full batch's scores are
        # ~7 GB, which matters on CPU serving hosts running the portable
        # export.  Rows are independent, so chunking is bit-exact.
        n = frames.shape[0]
        chunk = 4096
        if n <= chunk:
            return assign(frames).reshape(b, t)
        n_pad = -(-n // chunk) * chunk
        fr = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
        fr = fr.reshape(n_pad // chunk, chunk, frames.shape[1])
        _, toks = jax.lax.scan(lambda _, xc: (None, assign(xc)), None, fr)
        return toks.reshape(-1)[:n].reshape(b, t)

    def tokenize_waveforms(self, waves: List[np.ndarray]) -> List[np.ndarray]:
        """Host convenience: list of 1-D float arrays -> per-clip token arrays
        (trimmed to each clip's valid frame count)."""
        batch, lengths = self.frontend.prepare_batch(waves)
        tokens = np.asarray(
            self.tokens_from_padded(
                jnp.asarray(batch),
                jnp.asarray(lengths) if self.config.normalize else None,
            )
        )
        out = []
        for i, w in enumerate(waves):
            n_valid = num_frames(
                min(len(w), self.config.clip_samples), self.config.hop_length
            )
            out.append(tokens[i, :n_valid].astype(np.int64))
        return out

    @classmethod
    def from_artifacts(cls, config: AudioTokensConfig,
                       use_pallas: Optional[bool] = None) -> "FusedTokenizer":
        """Load centroids (+ conv weights) from the pipeline's artifacts."""
        from pathlib import Path

        from audio_tokens_tpu.processors.cluster_creator import make_conv_features

        centroids = np.load(config.centroids_path).astype(np.float32)
        conv = make_conv_features(config)
        if conv is not None:
            state = Path(config.centroids_path).with_suffix(".conv.npz")
            if state.exists():
                conv.load_state_dict(dict(np.load(state)))
        return cls(config, centroids, conv, use_pallas=use_pallas)
