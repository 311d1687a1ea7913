"""Pallas TPU kernel for the K-means Lloyd iteration statistics.

Per frame tile, fuses what the XLA scan path does in several HBM-visible
steps: distance GEMM -> argmin -> one-hot build -> one-hot^T @ x centroid-sum
GEMM -> count/objective reductions.  The (tile, K) scores and one-hot
matrices live only in VMEM; the kernel's outputs are the (K, d) centroid
sums, (K,) counts and the scalar objective, accumulated in-place across the
(sequential) TPU grid — so per Lloyd iteration the HBM traffic is one read
of the points plus K*d floats out.

Padding rows (beyond ``n_valid``) are masked by global row index; all GEMMs
run at HIGHEST precision; results match the XLA scan path up to fp
accumulation order (different tiling -> different summation trees).

Measured on v5e: ~parity with the XLA scan path (~25M point-iters/s at
N=262k, K=500, d=64) — the iteration is VPU-bound on the argmin + one-hot
construction over (N, K), not on HBM traffic or the MXU (DEFAULT-precision
GEMMs are only ~25% faster end-to-end), so keeping scores in VMEM doesn't
move the bottleneck.  Kept as an opt-in backend (``use_pallas=True``) and as
the building block for a future fused-argmin formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_tokens_tpu.ops.common import round_up as _round_up


def _stats_kernel(nvalid_ref, x_ref, ct_ref, c2_ref,
                  sums_ref, counts_ref, obj_ref, *, tile_n: int, k_pad: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)
        counts_ref[:] = jnp.zeros_like(counts_ref)
        obj_ref[:] = jnp.zeros_like(obj_ref)

    x = x_ref[:]  # (tile_n, d_pad)
    xc = jax.lax.dot_general(
        x, ct_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (tile_n, k_pad)
    scores = c2_ref[:] - 2.0 * xc
    # all intermediates kept 2-D (Mosaic relayout rejects 1-D vectors here)
    assign = jnp.argmin(scores, axis=1, keepdims=True)  # (tile_n, 1)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, 1), 0)
    valid = (i * tile_n + row_ids) < nvalid_ref[0]  # (tile_n, 1) bool
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k_pad), 1)
    onehot = jnp.where(
        (col_ids == assign) & valid, 1.0, 0.0
    )  # (tile_n, k_pad) f32

    sums_ref[:] += jax.lax.dot_general(
        onehot, x, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (k_pad, d_pad)
    counts_ref[:] += jnp.sum(onehot, axis=0, keepdims=True)  # (1, k_pad)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (tile_n, 1)
    min_scores = jnp.min(scores, axis=1, keepdims=True)  # (tile_n, 1)
    tile_obj = jnp.sum(jnp.where(valid, min_scores + x2, 0.0))
    obj_ref[:] = obj_ref[:] + jnp.reshape(tile_obj, (1, 1))  # 2-D VMEM store


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def lloyd_stats_pallas(x, n_valid, centroids, tile_n: int = 2048,
                       interpret: bool = False):
    """(sums (K,d), counts (K,), obj) for one Lloyd iteration.

    x (N, d) float32 (N rows >= n_valid are padding), centroids (K, d).
    """
    n, d = x.shape
    k = centroids.shape[0]
    d_pad = _round_up(d, 128)
    k_pad = _round_up(k, 128)
    tile_n = min(tile_n, _round_up(n, 8))
    n_pad = _round_up(n, tile_n)

    if d_pad != d:
        x = jnp.pad(x, ((0, 0), (0, d_pad - d)))
        centroids = jnp.pad(centroids, ((0, 0), (0, d_pad - d)))
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    c2 = jnp.sum(centroids * centroids, axis=1)
    if k_pad != k:
        centroids = jnp.pad(centroids, ((0, k_pad - k), (0, 0)))
        c2 = jnp.pad(c2, (0, k_pad - k), constant_values=jnp.float32(np.inf))

    sums, counts, obj = pl.pallas_call(
        functools.partial(_stats_kernel, tile_n=tile_n, k_pad=k_pad),
        out_shape=(
            jax.ShapeDtypeStruct((k_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // tile_n,),
            in_specs=[
                pl.BlockSpec((tile_n, d_pad), lambda i, nv: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, k_pad), lambda i, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k_pad), lambda i, nv: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k_pad, d_pad), lambda i, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k_pad), lambda i, nv: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, nv: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d_pad * k_pad,
            bytes_accessed=n_pad * d_pad * 4 + k_pad * d_pad * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), x, centroids.T, c2[None, :])
    return sums[:k, :d], counts[0, :k], obj[0, 0]
