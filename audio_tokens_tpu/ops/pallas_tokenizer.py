"""Pallas TPU megakernel: padded waveform -> token IDs in one kernel.

The XLA fused path (tokenizer.py) materializes the (B*T, n_fft) frame matrix
in HBM before the DFT GEMM — measured at 2.0 ms of a 4.4 ms batch, pure
bandwidth.  This kernel eliminates it: per frame tile it DMAs an *overlapping*
window of hop-sized waveform blocks from HBM into VMEM (overlap = the
n_fft/hop - 1 blocks shared between consecutive frames — the thing XLA's
block-aligned sharding cannot express), builds the frame tile with in-VMEM
slices, and runs the whole chain on-chip:

    frames -> windowed-DFT GEMM -> |.|^2 -> mel GEMM -> dB
           -> L2 normalize -> centroid-distance GEMM -> argmin

Only the waveform (one read) and the int32 tokens ever cross HBM.  Three
bandwidth/occupancy measures (round 3):

  * The window DMA is double-buffered across frame tiles (two VMEM slots +
    semaphores; tile g+1's fetch overlaps tile g's GEMMs) instead of the
    round-2 serial start();wait().
  * The DFT basis drops the im(0) and im(n_fft/2) columns — exactly zero for
    real input (sin 0 / sin pi*n) — so the spectrum GEMM output is
    2*n_freq-2 = n_fft lanes (512: 4 MXU tiles) instead of 2*n_freq padded
    to 640 (5 tiles).  Bit-identical numerics, 20% fewer DFT MACs.
  * An int8 VQ tier (per-row symmetric quantization, int8 MXU GEMM,
    rank-1 f32 score rescale) was built and measured unprofitable in
    round 4: slower than bf16-default at 16k (9.3k vs 9.8k clips/s) AND
    less accurate (95.9% vs 99.0%) — this toolchain's int8 dot runs only
    ~1.25x bf16, not the nominal 2x (microbench + A/B in BASELINE.md).
    Don't retry until int8 matmul demonstrably hits ~2x bf16.
  * The vocabulary axis is grid-chunked (third grid dimension) with a
    running min/argmin carried in VMEM scratch, so the 16k north-star vocab
    runs in this single kernel (round 2 fell back to the staged VQ path);
    Pallas auto-pipelines the centroid-chunk fetches.  An in-kernel vocab
    loop (manual double-buffered chunk DMA, carry in registers) was built
    and measured 8-15% SLOWER in round 4 — Mosaic's cross-grid-step
    pipelining overlaps chunk k+1's GEMM with chunk k's argmin better than
    the unrolled loop's serial chain (A/B record in BASELINE.md); don't
    retry.  The profitable lever was per-tier chunk WIDTH (_pick_chunk).

GEMM precision tiers (``tier``, config ``tokenizer_precision``):

  * ``highest`` (default) — f32 GEMMs; tokens bit-identical to the f32 XLA
    path (agreement asserted in tests); ~18.5k clips/s on one v5e
    (~3.0k at the 16k north-star vocabulary, still bit-exact).
  * ``bf16x3`` — the DFT/mel GEMMs run a manual 3-pass bf16 decomposition
    (hi/lo split; ~f32 accuracy): ~26k clips/s, 99.997% token agreement.
  * ``default`` — single-pass bf16 DFT/mel: ~34k clips/s, 99.3% agreement.

The VQ distance GEMM has its own tier (``vq_tier``, config
``tokenizer_vq_precision``, default ``highest``): at the reference's
500-centroid vocabulary it is a small FLOP fraction and f32-HIGHEST costs
nothing, but at the 16k north-star vocabulary it is ~97% of the kernel
FLOPs.  The bf16 tiers' hi/lo decomposition is hoisted — centroids are
pre-split on the host, features split once per frame tile into bf16
scratch — and the vocabulary chunk width is picked per tier against a
raised scoped-VMEM ceiling (``VMEM_LIMIT``/``_pick_chunk``; the grid-step
fixed cost, not MXU passes, bounds the multi-chunk rate).  Measured at 16k
(BASELINE.md): exact 2.9k clips/s, ``bf16x3`` 5.1k at 99.993% agreement,
``default`` 9.7k at 98.96%.
See BASELINE.md "megakernel roofline" for
the measured pass-count/padding analysis: at `highest` the kernel runs at
~80% of the (6-pass f32 x padding)-adjusted MXU roofline, so the headline
MFU-vs-bf16-peak is precision-bound, not scheduling-bound.

Constraints: hop | n_fft (the default 512/128 signal chain), no conv
front-end (falls back to the XLA path otherwise), and the host buffer must
be allocated to ``alloc_blocks(...) * hop`` samples so every DMA window is
in-bounds (FusedTokenizer arranges this; the tail blocks are zeros and the
extra frames are trimmed).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_tokens_tpu.ops.common import round_up as _round_up

EPS = 1e-10

TIERS = ("highest", "bf16x3", "default")

# Mosaic scoped-VMEM ceiling requested for the kernel.  The compiler default
# is 16 MB but v5e's physical VMEM comfortably covers 64 MB; raising it lets
# multi-chunk vocabularies use wide chunks — fewer grid steps, whose ~5 us
# fixed cost (not MXU passes) bounds the 16k-vocab rate.  Measured at
# 16k/64 mel (BASELINE.md): exact 2.7k -> 2.9k clips/s, bf16x3 3.3k -> 5.1k,
# default -> 9.7k.  On a TPU generation with less per-core VMEM, set
# AUDIO_TOKENS_TOKENIZER_VMEM_MB (e.g. 16): the chunk planner and the
# megakernel/staged-path gate (kernel_fits) both budget against this value,
# so chunks shrink — and the kernel falls back to the staged VQ path rather
# than failing to compile — consistently.
VMEM_LIMIT = int(os.environ.get(
    "AUDIO_TOKENS_TOKENIZER_VMEM_MB", "64")) * 1024 * 1024


def _pick_chunk(vq_tier: str, tile_t: int, m_pad: int,
                hop: int = 128, n_fft: int = 512) -> int:
    """Vocabulary chunk width for multi-chunk vocabularies, per VQ tier.

    Preferred widths are the measured optima at tile_t=896/m_pad=128
    (BASELINE.md round-4 sweep): the exact tier regresses past 2048 (f32
    operand traffic), the bf16 tiers keep gaining until their (tile_t,
    k_chunk) f32 score buffers press the VMEM_LIMIT.  The estimate below
    halves the chunk until the score buffers + double-buffered centroid
    operands + the DFT-chain working set fit for other shapes; returns 0
    when not even a 128-wide chunk fits (kernel_fits then routes to the
    staged path)."""
    prefer = {"highest": 2048, "bf16x3": 4096, "default": 8192}[vq_tier]
    n_ops = {"highest": 1, "bf16x3": 2, "default": 1}[vq_tier]
    itemsize = 4 if vq_tier == "highest" else 2
    # score-sized f32 live buffers: fc + scores for highest; the dedicated
    # fc accumulator scratch + one live dot result for bf16x3 (scores are
    # computed in place); the single dot result + scores for default
    live = {"highest": 2.0, "bf16x3": 2.25, "default": 1.25}[vq_tier]
    # DFT-chain working set from the ACTUAL shapes (a constant here would
    # silently understate exotic hop/n_fft configs — ADVICE r3 #4 class):
    # double-buffered window + frames + spec&sq + power + mel/meldb/unit
    # + the resident DFT/mel weight operands, plus slack for Mosaic temps
    r = max(n_fft // hop, 1)
    spec_pad = _round_up(max(n_fft, 2), 128)
    f_pad = _round_up(max(n_fft // 2, 1), 128)
    fixed = 4 * (
        2 * (tile_t + r) * hop          # window double buffer
        + tile_t * n_fft                # frames concat
        + 2 * tile_t * spec_pad         # spectrum + its square
        + tile_t * f_pad                # packed power
        + 3 * tile_t * m_pad            # mel, meldb, unit features
        + n_fft * spec_pad + f_pad * m_pad  # DFT basis + filterbank
    )  # Mosaic temp slack is the 0.8 budget factor below — an extra
    #    additive term here would reject the MEASURED-fitting optima
    #    (default tier's 8192-wide chunk sits at 50.8 of 51.2 MB)
    cap = prefer
    while cap >= 128:
        need = (fixed + live * 4 * tile_t * cap
                + 2 * n_ops * itemsize * cap * m_pad)
        if need <= 0.8 * VMEM_LIMIT:
            return cap
        cap //= 2
    return 0


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
    ~512-1024 tiles (VMEM-sized, good MXU occupancy).

    The 1024 cap is a measured optimum, not a VMEM limit: with the 64 MB
    scoped ceiling a one-tile-per-clip plan (tile_t=1792, half the grid
    steps) compiles fine but measured SLOWER at every tier and vocabulary
    (vocab 500 exact -28%, 16k exact -58%; tokens identical across plans
    — full A/B in BASELINE.md).  Mosaic pipelines the smaller tiles'
    DMA/GEMM across grid steps better than it fills one wide tile; don't
    retry tile widening."""
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


def kernel_fits(k: int, d: int, hop: int = 128, n_fft: int = 512,
                vq_tier: str = "highest") -> bool:
    """Whether the megakernel working set fits the VMEM budget.  The
    vocabulary is grid-chunked (the chunk planner shrinks the chunk until
    its working set fits VMEM_LIMIT), so the bound depends on the feature
    width, not on K — the 16k north-star vocab fits; only extreme feature
    widths (or a small AUDIO_TOKENS_TOKENIZER_VMEM_MB) fall back to the
    staged fused-VQ path.  Uses the same estimate as _pick_chunk so the
    gate and the planner cannot disagree."""
    m_pad = _round_up(d, 128)
    tile_t = 1024  # upper bound from plan_tiles
    return _pick_chunk(vq_tier, tile_t, m_pad, hop=hop, n_fft=n_fft) > 0


def _kernel(blocks_hbm, w_ref, fb_ref, *args,
            tile_t: int, r: int, hop: int, n_mels: int, n_freq: int,
            k_chunk: int, tier: str = "highest", vq_tier: str = "highest"):
    # operand/scratch layout varies with the (static) VQ tier: bf16 tiers
    # take host-pre-split centroid operands and carry the unit features'
    # bf16 split(s) in scratch so the hi/lo decomposition happens once per
    # frame tile, not once per vocabulary chunk
    if vq_tier == "bf16x3":
        (ct_hi_ref, ct_lo_ref, c2_ref, out_ref,
         window, sems, f_ref, best_ref, idx_ref,
         f_hi_ref, f_lo_ref, fc_ref) = args
    elif vq_tier == "default":
        (ct_hi_ref, c2_ref, out_ref,
         window, sems, f_ref, best_ref, idx_ref, f_hi_ref) = args
    else:
        (ct_ref, c2_ref, out_ref,
         window, sems, f_ref, best_ref, idx_ref) = args
    b = pl.program_id(0)
    i = pl.program_id(1)
    kc = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    n_kc = pl.num_programs(2)
    g = b * n_tiles + i          # linear frame-tile index
    total = pl.num_programs(0) * n_tiles

    def dma_for(gg):
        slot = jax.lax.rem(gg, 2)
        bb = jax.lax.div(gg, n_tiles)
        ii = jax.lax.rem(gg, n_tiles)
        return pltpu.make_async_copy(
            blocks_hbm.at[bb, pl.ds(ii * tile_t, tile_t + r), :],
            window.at[slot], sems.at[slot],
        )

    def _features_from(win):
        """win: statically-indexed (tile_t+r, hop) VMEM ref (Mosaic needs
        static sublane offsets for the frame-building concat)."""
        # frame t = blocks t..t+r-1 concatenated -> (tile_t, n_fft)
        frames = jnp.concatenate(
            [win[j : j + tile_t, :] for j in range(r)], axis=1
        )
        spec = _dot_tier(
            frames, w_ref[:], (((1,), (0,)), ((), ())), tier
        )  # (tile_t, 2*n_freq-2 padded): [re 0..F-1 | im 1..F-2]
        # packed power: bins 0..F-2 = re^2 + im^2 via two ALIGNED half-width
        # slices (lane 0 of the upper half is re(Nyquist) — masked out; the
        # Nyquist mel-filterbank row is exactly zero, so the bin is dropped
        # host-side and the f32 sums are unchanged bit-for-bit)
        half = n_freq - 1
        sq = spec * spec
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_t, half), 1)
        power = sq[:, :half] + jnp.where(lane > 0, sq[:, half : 2 * half], 0.0)
        f_pad = fb_ref.shape[0]
        if f_pad > half:
            power = jnp.pad(power, ((0, 0), (0, f_pad - half)))
        mel = _dot_tier(
            power, fb_ref[:], (((1,), (0,)), ((), ())), tier
        )  # (tile_t, n_mels padded to 128)
        meldb = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        # zero the padded mel lanes so they don't affect the norm/distances
        lane = jax.lax.broadcasted_iota(jnp.int32, meldb.shape, 1)
        meldb = jnp.where(lane < n_mels, meldb, 0.0)
        norms = jnp.sqrt(jnp.sum(meldb * meldb, axis=1, keepdims=True))
        unit = meldb / (norms + EPS)
        f_ref[:] = unit
        if vq_tier == "bf16x3":
            hi = unit.astype(jnp.bfloat16)
            f_hi_ref[:] = hi
            f_lo_ref[:] = (unit - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        elif vq_tier == "default":
            f_hi_ref[:] = unit.astype(jnp.bfloat16)

    @pl.when(kc == 0)
    def _fetch_and_featurize():
        @pl.when(g == 0)
        def _():
            dma_for(0).start()
        # double buffering: tile g+1's fetch rides under tile g's GEMMs
        @pl.when(g + 1 < total)
        def _():
            dma_for(g + 1).start()
        dma_for(g).wait()
        slot = jax.lax.rem(g, 2)

        @pl.when(slot == 0)
        def _():
            _features_from(window.at[0])

        @pl.when(slot == 1)
        def _():
            _features_from(window.at[1])

    # VQ distance GEMM: f32-HIGHEST by default (the decision point).  At the
    # 16k north-star vocabulary this GEMM is ~97% of the kernel FLOPs, so
    # vq_tier='bf16x3' (3-pass pseudo-f32, config tokenizer_vq_precision)
    # halves its MXU passes (measured rates/agreement in BASELINE.md).
    dims = (((1,), (1,)), ((), ()))

    def _d(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    if vq_tier == "bf16x3":
        # operands pre-split (centroids on host, features at kc==0); lo*lo
        # term dropped as in _dot_tier.  Accumulating into scratch keeps a
        # single dot result live at a time (3 live f32 partials overflowed
        # scoped VMEM at wide chunks)
        fc_ref[:] = _d(f_hi_ref[:], ct_hi_ref[:])
        fc_ref[:] += _d(f_hi_ref[:], ct_lo_ref[:])
        fc_ref[:] += _d(f_lo_ref[:], ct_hi_ref[:])
        # scores computed in place: the (tile_t, k_chunk) f32 buffers are
        # what bounds the chunk width against scoped VMEM
        fc_ref[:] = c2_ref[:] - 2.0 * fc_ref[:]
        scores = fc_ref[:]
    elif vq_tier == "default":
        fc = _d(f_hi_ref[:], ct_hi_ref[:])
        scores = c2_ref[:] - 2.0 * fc
    else:
        fc = jax.lax.dot_general(
            f_ref[:], ct_ref[:], dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (tile_t, k_chunk)
        scores = c2_ref[:] - 2.0 * fc

    if n_kc == 1:
        # single-chunk vocabularies: no carry, write tokens directly
        toks = jnp.argmin(scores, axis=1).astype(jnp.int32)
        out_ref[:] = toks.reshape(1, tile_t // 128, 128)
        return

    local_min = jnp.min(scores, axis=1, keepdims=True)      # (tile_t, 1)
    local_arg = (jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
                 + kc * k_chunk)

    @pl.when(kc == 0)
    def _():
        best_ref[:] = local_min
        idx_ref[:] = local_arg

    @pl.when(kc > 0)
    def _():
        # strict < keeps the low-index tie-break of a flat argmin
        better = local_min < best_ref[:]
        idx_ref[:] = jnp.where(better, local_arg, idx_ref[:])
        best_ref[:] = jnp.minimum(local_min, best_ref[:])

    @pl.when(kc == n_kc - 1)
    def _():
        out_ref[:] = idx_ref[:, 0].reshape(1, tile_t // 128, 128)


class TokenizerKernel:
    """Precomputed padded weights + a jitted (B, L) -> (B, n_frames) program."""

    def __init__(self, sample_rate: int, n_mels: int, n_fft: int, hop: int,
                 n_frames: int, centroids: np.ndarray, tier: str = "highest",
                 vq_tier: str = "highest", k_chunk_cap: int | None = None,
                 interpret: bool = False):
        from audio_tokens_tpu.ops.mel import dft_filters, mel_filterbank

        if n_fft % hop:
            raise ValueError("TokenizerKernel requires hop | n_fft")
        if tier not in TIERS:
            raise ValueError(f"unknown tokenizer precision tier '{tier}'")
        if vq_tier not in TIERS:
            raise ValueError(f"unknown VQ precision tier '{vq_tier}'")
        self.tier = tier
        self.vq_tier = vq_tier
        self.interpret = interpret
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop = hop
        self.r = n_fft // hop
        self.n_freq = n_fft // 2 + 1
        self.n_frames = n_frames
        self.tile_t, self.n_tiles = plan_tiles(n_frames, hop, n_fft)
        self.n_blocks = alloc_blocks(n_frames, hop, n_fft)

        # real-DFT basis without the always-zero im(0)/im(n_fft/2) columns:
        # output lanes = [re 0..F-1 | im 1..F-2] = 2F-2 = n_fft (f32 products
        # identical to the full basis, so tokens stay bit-exact)
        w = dft_filters(n_fft)[:, 0, :].T  # (n_fft, 2F)
        w = np.concatenate(
            [w[:, : self.n_freq], w[:, self.n_freq + 1 : 2 * self.n_freq - 1]],
            axis=1,
        )
        spec_pad = _round_up(2 * self.n_freq - 2, 128)
        self._w = jnp.asarray(
            np.pad(w, ((0, 0), (0, spec_pad - (2 * self.n_freq - 2))))
        )
        m_pad = _round_up(n_mels, 128)
        fb = mel_filterbank(self.n_freq, n_mels, sample_rate)
        # the kernel's packed power tile drops the Nyquist bin; its
        # filterbank row is exactly zero (triangles end at f_max = sr/2),
        # so the mel GEMM contracts over n_freq-1 rows with identical sums
        assert not fb[-1].any(), "Nyquist filterbank row expected to be zero"
        fb = fb[:-1]
        f_pad = _round_up(self.n_freq - 1, 128)
        self._fb = jnp.asarray(
            np.pad(fb, ((0, f_pad - (self.n_freq - 1)), (0, m_pad - n_mels)))
        )
        k = centroids.shape[0]
        k_pad = _round_up(k, 128)
        if k_chunk_cap is None:
            k_chunk_cap = _pick_chunk(vq_tier, self.tile_t, m_pad,
                                      hop=self.hop, n_fft=self.n_fft)
        if k_chunk_cap <= 0:
            raise ValueError(
                "megakernel working set exceeds the VMEM budget even at a "
                "128-wide vocabulary chunk (gate with kernel_fits, or raise "
                "AUDIO_TOKENS_TOKENIZER_VMEM_MB)")
        self.k_chunk = min(k_pad, k_chunk_cap)
        # vocab axis is grid-chunked: pad K to a whole number of chunks
        k_pad = _round_up(k_pad, self.k_chunk)
        self.n_kc = k_pad // self.k_chunk
        cent = np.asarray(centroids, np.float32)
        c2 = (cent * cent).sum(1)
        cent_pad = np.pad(cent, ((0, k_pad - k), (0, m_pad - n_mels)))
        self.k_total = k_pad
        self.m_pad = m_pad
        # bf16 VQ tiers ship the centroid decomposition from the host (the
        # split is loop-invariant; doing it in-kernel re-ran on every
        # vocabulary chunk and kept extra f32 temporaries live in VMEM)
        if vq_tier == "bf16x3":
            hi = cent_pad.astype(jnp.bfloat16)
            lo = (cent_pad - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            self._cent_ops = (jnp.asarray(hi), jnp.asarray(lo))
        elif vq_tier == "default":
            self._cent_ops = (jnp.asarray(cent_pad.astype(jnp.bfloat16)),)
        else:
            self._cent_ops = (jnp.asarray(cent_pad),)
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
        k_chunk, m_pad = self.k_chunk, self.m_pad
        cent_specs = [
            pl.BlockSpec((k_chunk, m_pad), lambda bb, ii, kk: (kk, 0),
                         memory_space=pltpu.VMEM)
            for _ in self._cent_ops
        ]
        extra_scratch = []
        if self.vq_tier == "bf16x3":
            extra_scratch = [pltpu.VMEM((tile_t, m_pad), jnp.bfloat16)] * 2 + [
                pltpu.VMEM((tile_t, k_chunk), jnp.float32)]
        elif self.vq_tier == "default":
            extra_scratch = [pltpu.VMEM((tile_t, m_pad), jnp.bfloat16)]
        out = pl.pallas_call(
            functools.partial(
                _kernel, tile_t=self.tile_t, r=self.r, hop=self.hop,
                n_mels=self.n_mels, n_freq=self.n_freq,
                k_chunk=k_chunk, tier=self.tier, vq_tier=self.vq_tier,
            ),
            # (b*n_tiles, tile_t/128, 128): last two dims match the block
            # shape exactly (lowering constraint for sub-8 leading blocks)
            out_shape=jax.ShapeDtypeStruct(
                (b * n_tiles, tile_t // 128, 128), jnp.int32
            ),
            # vocab chunk innermost: the frame tile's features are
            # computed once (kc==0) and scored against each chunk
            grid=(b, self.n_tiles, self.n_kc),
            in_specs=[
                # whole array stays in HBM; the kernel DMAs overlapping
                # windows itself (ANY-space blocks must be trivial)
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(self._w.shape, lambda bb, ii, kk: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(self._fb.shape, lambda bb, ii, kk: (0, 0),
                             memory_space=pltpu.VMEM),
                *cent_specs,
                pl.BlockSpec((1, k_chunk), lambda bb, ii, kk: (0, kk),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_t // 128, 128),
                lambda bb, ii, kk: (bb * n_tiles + ii, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, tile_t + self.r, self.hop), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((tile_t, m_pad), jnp.float32),   # unit features
                pltpu.VMEM((tile_t, 1), jnp.float32),        # running min
                pltpu.VMEM((tile_t, 1), jnp.int32),          # running argmin
                *extra_scratch,                              # bf16 f splits
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * self.n_tiles * self.tile_t
                * (self.n_fft * (2 * self.n_freq - 2)
                   + self.n_freq * self.n_mels
                   + self.n_mels * self.k_total),
                bytes_accessed=b * need * 4
                + b * self.n_tiles * self.k_total * m_pad * 4,
                transcendentals=b * self.n_tiles * self.tile_t * self.n_mels,
            ),
            interpret=self.interpret,
        )(blocks, self._w, self._fb, *self._cent_ops, self._c2)
        return out.reshape(b, n_tiles * tile_t)[:, : self.n_frames]
