"""Pallas TPU megakernel: padded waveform -> token IDs in one kernel.

The XLA fused path (tokenizer.py) materializes the (B*T, n_fft) frame matrix
in HBM before the DFT GEMM — measured at 2.0 ms of a 4.4 ms batch, pure
bandwidth.  This kernel eliminates it: per grid step it DMAs an *overlapping*
window of hop-sized waveform blocks from HBM into VMEM (overlap = the
n_fft/hop - 1 blocks shared between consecutive frames — the thing XLA's
block-aligned sharding cannot express), builds the frame tile with in-VMEM
slices, and runs the whole chain on-chip:

    frames -> windowed-DFT GEMM -> |.|^2 -> mel GEMM -> dB
           -> L2 normalize -> centroid-distance GEMM -> argmin

Only the waveform (one read) and the int32 tokens ever cross HBM.  GEMM
precision tiers (``tier``, config ``tokenizer_precision``):

  * ``highest`` (default) — f32 GEMMs; tokens bit-identical to the f32 XLA
    path (agreement asserted in tests); ~16.0k clips/s on one v5e.
  * ``bf16x3`` — the DFT/mel GEMMs run a manual 3-pass bf16 decomposition
    (hi/lo split; ~f32 accuracy): ~23.4k clips/s, 99.997% token agreement.
  * ``default`` — single-pass bf16 DFT/mel: ~27.7k clips/s, 99.3% agreement.

The VQ distance GEMM always runs f32-HIGHEST (it is the decision point and
a small fraction of the FLOPs).

Constraints: hop | n_fft (the default 512/128 signal chain), no conv
front-end (falls back to the XLA path otherwise), and the host buffer must
be allocated to ``alloc_blocks(...) * hop`` samples so every DMA window is
in-bounds (FusedTokenizer arranges this; the tail blocks are zeros and the
extra frames are trimmed).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_tokens_tpu.ops.common import round_up as _round_up

EPS = 1e-10

TIERS = ("highest", "bf16x3", "default")


def _dot_tier(a, b, dims, tier: str):
    """DFT/mel GEMM at the selected precision tier (f32 accumulation)."""
    if tier == "highest":
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
    if tier == "default":
        return jax.lax.dot_general(a, b, dims,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)
    # bf16x3: pseudo-f32 via hi/lo bf16 split (drops the lo*lo term);
    # Mosaic has no HIGH lowering, so the decomposition is explicit
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def plan_tiles(n_frames: int, hop: int, n_fft: int) -> Tuple[int, int]:
    """(tile_t, n_tiles): frame tile must be a multiple of 128 (output lane
    constraint); pick the split with the least wasted frames, preferring
    ~512-1024 tiles (VMEM-sized, good MXU occupancy)."""
    best = None
    for n_tiles in range(1, 32):
        tile_t = _round_up(-(-n_frames // n_tiles), 128)
        if tile_t > 1024:
            continue
        waste = n_tiles * tile_t - n_frames
        score = (waste, -tile_t)
        if best is None or score < best[0]:
            best = (score, tile_t, n_tiles)
    if best is None:  # very long clips: cap tile at 1024
        tile_t = 1024
        return tile_t, -(-n_frames // tile_t)
    return best[1], best[2]


def alloc_blocks(n_frames: int, hop: int, n_fft: int) -> int:
    """Blocks the host buffer must hold per clip for in-bounds DMA windows."""
    tile_t, n_tiles = plan_tiles(n_frames, hop, n_fft)
    r = n_fft // hop
    return n_tiles * tile_t + r  # last window: (n_tiles-1)*tile_t .. +tile_t+r-1


def _kernel(blocks_hbm, w_ref, fb_ref, ct_ref, c2_ref, out_ref,
            *, tile_t: int, r: int, hop: int, n_mels: int, n_freq: int,
            tier: str = "highest"):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def inner(scratch, sem):
        dma = pltpu.make_async_copy(
            blocks_hbm.at[b, pl.ds(i * tile_t, tile_t + r), :], scratch, sem
        )
        dma.start()
        dma.wait()
        # frame t = blocks t..t+r-1 concatenated -> (tile_t, n_fft)
        frames = jnp.concatenate(
            [scratch[j : j + tile_t, :] for j in range(r)], axis=1
        )
        spec = _dot_tier(
            frames, w_ref[:], (((1,), (0,)), ((), ())), tier
        )  # (tile_t, 2F padded)
        re = spec[:, :n_freq]
        im = spec[:, n_freq : 2 * n_freq]
        power = re * re + im * im
        f_pad = fb_ref.shape[0]
        power = jnp.pad(power, ((0, 0), (0, f_pad - n_freq)))
        mel = _dot_tier(
            power, fb_ref[:], (((1,), (0,)), ((), ())), tier
        )  # (tile_t, n_mels padded to 128)
        meldb = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        # zero the padded mel lanes so they don't affect the norm/distances
        lane = jax.lax.broadcasted_iota(jnp.int32, meldb.shape, 1)
        meldb = jnp.where(lane < n_mels, meldb, 0.0)
        norms = jnp.sqrt(jnp.sum(meldb * meldb, axis=1, keepdims=True))
        f = meldb / (norms + EPS)
        fc = jax.lax.dot_general(
            f, ct_ref[:], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (tile_t, K_pad)
        scores = c2_ref[:] - 2.0 * fc
        toks = jnp.argmin(scores, axis=1).astype(jnp.int32)
        out_ref[:] = toks.reshape(1, tile_t // 128, 128)

    pl.run_scoped(
        inner,
        pltpu.VMEM((tile_t + r, hop), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


class TokenizerKernel:
    """Precomputed padded weights + a jitted (B, L) -> (B, n_frames) program."""

    def __init__(self, sample_rate: int, n_mels: int, n_fft: int, hop: int,
                 n_frames: int, centroids: np.ndarray, tier: str = "highest"):
        from audio_tokens_tpu.ops.mel import dft_filters, mel_filterbank

        if n_fft % hop:
            raise ValueError("TokenizerKernel requires hop | n_fft")
        if tier not in TIERS:
            raise ValueError(f"unknown tokenizer precision tier '{tier}'")
        self.tier = tier
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop = hop
        self.r = n_fft // hop
        self.n_freq = n_fft // 2 + 1
        self.n_frames = n_frames
        self.tile_t, self.n_tiles = plan_tiles(n_frames, hop, n_fft)
        self.n_blocks = alloc_blocks(n_frames, hop, n_fft)

        w = dft_filters(n_fft)[:, 0, :].T  # (n_fft, 2F)
        spec_pad = _round_up(2 * self.n_freq, 128)
        self._w = jnp.asarray(np.pad(w, ((0, 0), (0, spec_pad - 2 * self.n_freq))))
        f_pad = _round_up(self.n_freq, 128)
        m_pad = _round_up(n_mels, 128)
        fb = mel_filterbank(self.n_freq, n_mels, sample_rate)
        self._fb = jnp.asarray(
            np.pad(fb, ((0, f_pad - self.n_freq), (0, m_pad - n_mels)))
        )
        k = centroids.shape[0]
        k_pad = _round_up(k, 128)
        cent = np.asarray(centroids, np.float32)
        c2 = (cent * cent).sum(1)
        self._cent = jnp.asarray(
            np.pad(cent, ((0, k_pad - k), (0, m_pad - n_mels)))
        )
        self._c2 = jnp.asarray(
            np.pad(c2, (0, k_pad - k), constant_values=np.float32(np.inf))[None, :]
        )

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, padded_batch: jax.Array) -> jax.Array:
        """(B, >= n_blocks*hop) waveforms -> (B, n_frames) int32 tokens."""
        b = padded_batch.shape[0]
        need = self.n_blocks * self.hop
        if padded_batch.shape[1] < need:
            raise ValueError(
                f"host buffer too short: {padded_batch.shape[1]} < {need} "
                "(allocate with alloc_blocks)"
            )
        blocks = padded_batch[:, :need].reshape(b, self.n_blocks, self.hop)
        n_tiles, tile_t = self.n_tiles, self.tile_t
        out = pl.pallas_call(
            functools.partial(
                _kernel, tile_t=self.tile_t, r=self.r, hop=self.hop,
                n_mels=self.n_mels, n_freq=self.n_freq,
                tier=self.tier,
            ),
            # (b*n_tiles, tile_t/128, 128): last two dims match the block
            # shape exactly (lowering constraint for sub-8 leading blocks)
            out_shape=jax.ShapeDtypeStruct(
                (b * n_tiles, tile_t // 128, 128), jnp.int32
            ),
            grid_spec=pl.GridSpec(
                grid=(b, self.n_tiles),
                in_specs=[
                    # whole array stays in HBM; the kernel DMAs overlapping
                    # windows itself (ANY-space blocks must be trivial)
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(self._w.shape, lambda bb, ii: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(self._fb.shape, lambda bb, ii: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(self._cent.shape, lambda bb, ii: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(self._c2.shape, lambda bb, ii: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, tile_t // 128, 128),
                    lambda bb, ii: (bb * n_tiles + ii, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * self.n_tiles * self.tile_t
                * (self.n_fft * 2 * self.n_freq + self.n_freq * self.n_mels
                   + self.n_mels * self._cent.shape[0]),
                bytes_accessed=b * need * 4,
                transcendentals=b * self.n_tiles * self.tile_t * self.n_mels,
            ),
        )(blocks, self._w, self._fb, self._cent, self._c2)
        return out.reshape(b, n_tiles * tile_t)[:, : self.n_frames]
