"""Pallas TPU kernel: fused L2-normalize + nearest-centroid assignment.

The XLA path (ops/vq.py) materializes the (N, K) score matrix in HBM between
the distance GEMM and the argmin (for N = 55k frames x K = 500 that is
~110 MB of round-trip traffic per batch).  This kernel keeps everything in
VMEM: per grid step it loads a frame tile, normalizes it on the VPU, runs the
(TILE, d) x (d, K) distance GEMM on the MXU against the VMEM-resident
centroid block, and reduces the argmin — only the (TILE,) token IDs ever
leave the chip.

Shapes are padded to hardware tiles by the wrapper: d -> multiple of 128
(zero-pad: L2 distances unchanged), K -> multiple of the centroid chunk (pad
rows get +inf scores), N -> multiple of the frame tile (outputs trimmed).
Vocabularies beyond one chunk iterate K_TILE-wide centroid blocks with a
running (min, argmin) carried in VMEM scratch, so 16k+ vocabularies stay on
the fused path.

Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_tokens_tpu.ops.common import round_up as _round_up

EPS = 1e-10  # matches ops/vq.py / reference normalize_vectors
TILE_N = 1024


def _vq_kernel(f_ref, ct_ref, c2_ref, out_ref, fn_scr, min_scr, arg_scr,
               *, normalize: bool, k_tile: int):
    """Grid (n_tiles, k_tiles), K innermost: a running (min, argmin) pair in
    VMEM scratch folds centroid chunks, so vocabularies far beyond the VMEM
    working set stay on the fused path.  Ascending chunk order + strict '<'
    preserves the lowest-index tie-break (FAISS semantics)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        f = f_ref[:]  # (TILE_N, d_pad) f32
        if normalize:
            norms = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
            f = f / (norms + EPS)
        fn_scr[:] = f
        min_scr[:] = jnp.full_like(min_scr, jnp.inf)
        arg_scr[:] = jnp.zeros_like(arg_scr)

    # scores = ||c||^2 - 2 f.c   (argmin-equivalent to the true sq-distance)
    fc = jax.lax.dot_general(
        fn_scr[:], ct_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,  # f32-exact for token parity
        preferred_element_type=jnp.float32,
    )  # (TILE, k_tile)
    scores = c2_ref[:] - 2.0 * fc
    local_arg = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None]
    local_min = jnp.min(scores, axis=1)[:, None]
    better = local_min < min_scr[:]
    min_scr[:] = jnp.where(better, local_min, min_scr[:])
    arg_scr[:] = jnp.where(better, local_arg + j * k_tile, arg_scr[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = arg_scr[:]


K_TILE = 2048  # centroid-chunk width: bounds the VMEM score tile


@functools.partial(
    jax.jit, static_argnames=("normalize", "interpret", "tile_n", "k_tile")
)
def _vq_pallas_jit(frames, centroids, normalize, interpret, tile_n,
                   k_tile=K_TILE):
    """Pad to hardware tiles, run the kernel, trim — all one compiled program."""
    n, d = frames.shape
    k = centroids.shape[0]
    d_pad = _round_up(d, 128)
    # balance the chunk width across the needed chunk count so padding never
    # approaches a whole wasted chunk (K=2100 -> 2 chunks of 1152, not 4096)
    k128 = _round_up(k, 128)
    n_chunks = -(-k128 // min(k_tile, k128))
    k_tile = _round_up(-(-k128 // n_chunks), 128)
    k_pad = n_chunks * k_tile
    n_pad = _round_up(n, tile_n)

    if d_pad != d:
        frames = jnp.pad(frames, ((0, 0), (0, d_pad - d)))
        centroids = jnp.pad(centroids, ((0, 0), (0, d_pad - d)))
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    c2 = jnp.sum(centroids * centroids, axis=1)
    if k_pad != k:
        centroids = jnp.pad(centroids, ((0, k_pad - k), (0, 0)))
        c2 = jnp.pad(c2, (0, k_pad - k), constant_values=jnp.float32(np.inf))

    out = pl.pallas_call(
        functools.partial(_vq_kernel, normalize=normalize, k_tile=k_tile),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        grid=(n_pad // tile_n, k_pad // k_tile),
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_n, d_pad), jnp.float32),  # normalized frames
            pltpu.VMEM((tile_n, 1), jnp.float32),      # running min
            pltpu.VMEM((tile_n, 1), jnp.int32),        # running argmin
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d_pad * k_pad,
            bytes_accessed=n_pad * d_pad * 4 + d_pad * k_pad * 4 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, centroids.T, c2[None, :])
    return out[:n, 0]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def vq_assign_pallas(
    frames,
    centroids,
    normalize: bool = False,
    tile_n: int = TILE_N,
    interpret: bool | None = None,
):
    """Token IDs for each frame row; optionally fusing the L2 normalize.

    frames (N, d) float32, centroids (K, d) float32 -> (N,) int32.
    Accepts any N/K/d; pads to hardware tiles internally.
    """
    frames = jnp.asarray(frames, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    if interpret is None:
        interpret = not _on_tpu()
    tile_n = min(tile_n, _round_up(frames.shape[0], 8))
    # interpret mode has no VMEM; the budget only binds on real hardware
    if not interpret and not fits_vmem(
        centroids.shape[0], centroids.shape[1], tile_n
    ):
        raise ValueError(
            f"K={centroids.shape[0]} d={centroids.shape[1]} exceeds the VMEM "
            "budget of the fused kernel — use ops.vq.vq_assign (chunked XLA)"
        )
    return _vq_pallas_jit(frames, centroids, normalize, interpret, tile_n)


def fits_vmem(k: int, d: int, tile_n: int = TILE_N,
              budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Whether the fused-VQ working set fits the per-core VMEM budget.

    K is chunked inside the kernel (K_TILE-wide centroid blocks with a
    running argmin), so the working set depends on the chunk, not the
    vocabulary — any realistic K (e.g. the 16k north-star vocab) fits;
    only extreme feature widths fall back to the chunked XLA path."""
    k_t = min(K_TILE, _round_up(k, 128))
    d_pad = _round_up(d, 128)
    need = 4 * (d_pad * k_t + tile_n * (2 * d_pad + k_t + 2) + k_t)
    return need <= budget_bytes


