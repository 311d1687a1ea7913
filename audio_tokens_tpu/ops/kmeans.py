"""Mesh-sharded K-means (Lloyd's algorithm) on the MXU.

Replaces FAISS ``Kmeans`` (reference: processors/cluster_creator.py:42-56).
Design, TPU-first:

  * The hot loop is two GEMMs per chunk per iteration — the (chunk, d) x
    (d, K) distance matmul and the (K, chunk) x (chunk, d) one-hot
    centroid-sum matmul — both MXU-shaped; everything else is elementwise.
  * Points are chunked with ``lax.scan`` so HBM never holds an (N, K)
    intermediate; beyond HBM/host-RAM scale, ``kmeans_fit_streaming`` feeds
    fixed-capacity super-batches per Lloyd iteration (host memory bounded by
    one super-batch), which is how the 2M-clip corpus (~3.4B frames) runs.
  * Multi-chip: the whole Lloyd loop runs under ``jax.shard_map`` with points
    sharded over the ``data`` mesh axis; per-device centroid sums/counts are
    combined with a single fused ``psum`` pair per iteration (ICI traffic is
    2*K*d floats/iter — negligible next to compute).
  * fp32 accumulation throughout (bf16 inputs optional via precision).

Why there is no Pallas kernel here (VERDICT r2 #6, settled by measurement):
two hand kernels were built and benched against this scan on v5e at
N=1M, K=500, d=64 — round 2's direct port (~parity) and a round-3 rebuild
with VMEM-resident (N, K) tiles and an exact 3-pass bf16 one-hot GEMM.
The round-3 kernel measured 82.4M point-iters/s HIGHEST / 100.4M DEFAULT
vs the scan's 100.1M / 231.9M (stats pass alone, 20-run mean).  The scan's
HIGHEST rate is 26.2 TF/s of executed GEMM work = ~80% of the 6-pass f32
MXU roofline: XLA already fuses argmin/one-hot into the matmul tiles and
software-pipelines across scan steps, leaving no headroom for a hand
kernel to win — at DEFAULT the bound is the VPU argmin/one-hot build,
which a Pallas kernel pays identically.  Both kernels were deleted rather
than kept as opt-in maintenance surface.

Semantics choices (documented vs. FAISS):
  * init = k distinct points sampled from the data (FAISS default);
  * empty clusters keep their previous centroid by default (deterministic
    under sharding; empties are vanishingly rare at AudioSet frame counts),
    or ``empty_policy='split_largest'`` applies a deterministic variant of
    FAISS's split-largest repair (argmax-size donor, symmetric +-1/1024
    perturbation) for large vocabularies on narrow data;
  * ``max_points_per_centroid`` subsampling is available but defaults to None
    (use every frame) rather than FAISS's 256.

The ``KMeans`` class keeps the reference's warm-start call pattern —
``train(batch)`` then ``train(batch, init_centroids=prev)`` — so the
pipeline's sequential-batch refinement (SURVEY.md §2.7.4) is reproducible
exactly, while ``kmeans_fit`` is the recommended full-corpus mode.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from audio_tokens_tpu.ops.common import round_up as _round_up
from audio_tokens_tpu.utils.profiling import WIRE

logger = logging.getLogger(__name__)

# Scan-chunk rows per device for the Lloyd stats passes.  Callers that
# preallocate capacity buffers (the fused device feed) align to
# DEFAULT_CHUNK * n_devices so kmeans_fit consumes them copy-free.
DEFAULT_CHUNK = 16384


def _lloyd_stats(x_chunks, mask_chunks, centroids, precision, axis_name=None,
                 include_x2: bool = True):
    """Scan over chunks: centroid sums (K,d), counts (K,), objective scalar.

    ``include_x2=False`` accumulates only the ``c^2 - 2xc`` part of the
    objective — the ``||x||^2`` term is centroid-independent, so both
    callers hoist it: the in-memory Lloyd loop computes it once before its
    fori_loop (measured +8% full-fit throughput on v5e), and the streaming
    path collects it into a separate ``x2_acc`` during iteration 0 only
    (see ``_stats_accum_jit``; +24% at the bf16 tier)."""
    k, d = centroids.shape
    c2 = jnp.sum(centroids * centroids, axis=1)[None, :]

    def body(carry, xm):
        sums, counts, obj = carry
        xc, mc = xm
        xdotc = jnp.dot(xc, centroids.T, precision=precision,
                        preferred_element_type=jnp.float32)
        scores = c2 - 2.0 * xdotc  # (chunk, K); + ||x||^2 = true sqdist
        assign = jnp.argmin(scores, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32) * mc[:, None]
        sums = sums + jnp.dot(onehot.T, xc, precision=precision,
                              preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        obj_term = jnp.min(scores, axis=1)
        if include_x2:
            obj_term = obj_term + jnp.sum(xc * xc, axis=1)
        obj = obj + jnp.sum(obj_term * mc)
        return (sums, counts, obj), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.float32(0.0),
    )
    if axis_name is not None:
        # Under shard_map the carry accumulates device-varying data; mark the
        # zero init as varying over the mesh axis so scan's carry types match.
        init = jax.lax.pcast(init, axis_name, to="varying")
    (sums, counts, obj), _ = jax.lax.scan(body, init, (x_chunks, mask_chunks))
    return sums, counts, obj


_SPLIT_EPS = 1.0 / 1024.0  # FAISS's symmetric perturbation magnitude


def _split_empty_clusters(centroids, counts):
    """Deterministic FAISS-style empty-cluster repair: each empty centroid
    becomes a copy of the current largest cluster's centroid with a
    symmetric +-eps perturbation (alternating by dimension parity), and the
    donor's count is split in half so successive empties pick new donors.

    FAISS picks the donor probabilistically by size (faiss
    Clustering::split_clusters); argmax-by-size is the deterministic variant
    (stable under sharding — runs on replicated post-psum values).
    """
    k, d = centroids.shape
    parity = jnp.arange(d) % 2 == 0
    up = jnp.where(parity, 1.0 + _SPLIT_EPS, 1.0 - _SPLIT_EPS)
    dn = jnp.where(parity, 1.0 - _SPLIT_EPS, 1.0 + _SPLIT_EPS)

    def body(i, carry):
        def split(args):
            cents, cnts = args
            donor = jnp.argmax(cnts)
            c = jax.lax.dynamic_index_in_dim(cents, donor, keepdims=False)
            half = cnts[donor] / 2.0
            cents = cents.at[i].set(c * up).at[donor].set(c * dn)
            cnts = cnts.at[i].set(half).at[donor].set(half)
            return cents, cnts

        cents, cnts = carry
        return jax.lax.cond(cnts[i] == 0, split, lambda a: a, (cents, cnts))

    return jax.lax.fori_loop(0, k, body, (centroids, counts))


def _split_empty_clusters_np(centroids, counts):
    """Host mirror of :func:`_split_empty_clusters` (streaming path)."""
    centroids = centroids.copy()
    counts = counts.copy()
    d = centroids.shape[1]
    parity = np.arange(d) % 2 == 0
    up = np.where(parity, 1.0 + _SPLIT_EPS, 1.0 - _SPLIT_EPS).astype(np.float32)
    dn = np.where(parity, 1.0 - _SPLIT_EPS, 1.0 + _SPLIT_EPS).astype(np.float32)
    for i in np.flatnonzero(counts == 0):
        donor = int(np.argmax(counts))
        c = centroids[donor].copy()
        half = counts[donor] / 2.0
        centroids[i] = c * up
        centroids[donor] = c * dn
        counts[i] = half
        counts[donor] = half
    return centroids, counts


def _lloyd_loop(x_chunks, mask_chunks, centroids, niter, precision, axis_name,
                empty_policy="keep"):
    """niter Lloyd iterations; runs per-device under shard_map (or unsharded).

    The objective's ``sum ||x||^2`` term does not depend on the centroids,
    so it is computed ONCE here and added to the per-iteration
    ``c^2 - 2xc`` accumulation — one fewer full pass over x per iteration.
    """
    x2 = jnp.sum(jnp.sum(x_chunks * x_chunks, axis=2) * mask_chunks)
    if axis_name is not None:
        x2 = jax.lax.psum(x2, axis_name)

    def step(_, carry):
        centroids, _ = carry
        sums, counts, obj = _lloyd_stats(
            x_chunks, mask_chunks, centroids, precision, axis_name,
            include_x2=False,
        )
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
            counts = jax.lax.psum(counts, axis_name)
            obj = jax.lax.psum(obj, axis_name)
        new_centroids = jnp.where(
            (counts > 0)[:, None], sums / jnp.maximum(counts, 1.0)[:, None], centroids
        )
        if empty_policy == "split_largest":
            new_centroids, _ = _split_empty_clusters(new_centroids, counts)
        return new_centroids, obj + x2

    return jax.lax.fori_loop(
        0, niter, step, (centroids, jnp.float32(0.0))
    )


@functools.partial(
    jax.jit,
    static_argnames=("niter", "chunk", "precision", "mesh", "axis_name",
                     "empty_policy"),
)
def _kmeans_jit(x, fill, init_centroids, niter, chunk, precision, mesh,
                axis_name, empty_policy="keep"):
    """``fill`` (traced scalar): number of valid leading rows.  The prefix
    mask is built on device — a host-built mask array would cross the
    host<->device link on every call."""
    n, d = x.shape

    if mesh is None:
        xs = x.reshape(-1, chunk, d)
        ms = (jnp.arange(n, dtype=jnp.int32) < fill).astype(
            jnp.float32).reshape(-1, chunk)
        return _lloyd_loop(xs, ms, init_centroids, niter, precision, None,
                           empty_policy)

    def sharded(x_local, fl, centroids):
        n_local = x_local.shape[0]
        xs = x_local.reshape(-1, chunk, d)
        offset = jax.lax.axis_index(axis_name).astype(jnp.int32) * n_local
        idx = offset + jnp.arange(n_local, dtype=jnp.int32)
        ms = (idx < fl).astype(jnp.float32).reshape(-1, chunk)
        return _lloyd_loop(xs, ms, centroids, niter, precision, axis_name,
                           empty_policy)

    return jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(), P()),
    )(x, fill, init_centroids)


@functools.partial(jax.jit, static_argnames=("k",))
def _pp_init_jit(x, key, k):
    """Entire k-means++ selection as one on-device fori_loop (one compile,
    zero host syncs — per-step host round-trips cost ~70 ms each on tunneled
    TPU backends)."""
    n = x.shape[0]
    first = jax.random.randint(jax.random.fold_in(key, 0), (), 0, n)
    chosen = jnp.zeros((k,), jnp.int32).at[0].set(first)
    c0 = jax.lax.dynamic_index_in_dim(x, first, keepdims=False)
    min_d2 = jnp.sum((x - c0[None, :]) ** 2, axis=1)

    def body(i, carry):
        min_d2, chosen = carry
        # D^2-weighted categorical draw (log-space; zero-distance points get
        # -inf and are never drawn unless everything is degenerate)
        logits = jnp.log(jnp.maximum(min_d2, 0.0))
        idx = jax.random.categorical(jax.random.fold_in(key, i), logits)
        c = jax.lax.dynamic_index_in_dim(x, idx, keepdims=False)
        d2 = jnp.sum((x - c[None, :]) ** 2, axis=1)
        return jnp.minimum(min_d2, d2), chosen.at[i].set(idx)

    _, chosen = jax.lax.fori_loop(1, k, body, (min_d2, chosen))
    return jnp.take(x, chosen, axis=0)


def kmeans_plusplus_init(
    x, k: int, seed: int = 1234, precision=jax.lax.Precision.HIGHEST
) -> np.ndarray:
    """Seeded k-means++ (D^2-weighted greedy) initialization, fully on-device."""
    del precision  # elementwise path; kept for signature stability
    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] < k:
        raise ValueError(f"need at least k={k} points, got {x.shape[0]}")
    return np.asarray(_pp_init_jit(x, jax.random.key(seed), k))


def _bucket_chunks(n_chunks: int) -> int:
    """Round chunk count up to a power of two to bound recompilations."""
    b = 1
    while b < n_chunks:
        b *= 2
    return b


def precision_from_str(name: str):
    """Config-string -> lax.Precision ('highest'|'high'|'default')."""
    table = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }
    try:
        return table[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown kmeans_precision '{name}' (use highest|high|default)"
        ) from None


def kmeans_fit(
    x: np.ndarray,
    k: int,
    niter: int = 20,
    *,
    seed: int = 1234,
    init_centroids: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    chunk: int = DEFAULT_CHUNK,
    precision=jax.lax.Precision.HIGHEST,
    max_points_per_centroid: Optional[int] = None,
    init: str = "random",
    empty_policy: str = "keep",
    n_valid: Optional[int] = None,
) -> Tuple[np.ndarray, float]:
    """Fit K-means; returns (centroids (k, d) float32, final objective).

    ``x`` may be numpy or a (device-resident) jax array, any float dtype;
    padding/sharding handled here.  Device-resident inputs stay on device —
    no host round-trip.

    ``n_valid``: treat only the first ``n_valid`` rows of ``x`` as data
    (rows beyond are masked out of every statistic).  This lets a caller
    hand over a preallocated CAPACITY buffer — e.g. the all-device fused
    cluster feed's HBM corpus — without slicing it (a device slice is a
    full copy, doubling peak HBM at corpus scale); when the capacity is
    already a whole number of per-device scan chunks, no pad copy is made
    either.
    """
    on_device = isinstance(x, jax.Array)
    xp = jnp if on_device else np
    if not on_device:
        x = np.asarray(x, dtype=np.float32)
    elif x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
    n, d = x.shape
    if n_valid is not None:
        if not 0 < n_valid <= n:
            raise ValueError(f"n_valid={n_valid} outside (0, {n}]")
        n = int(n_valid)
    rng = np.random.default_rng(seed)

    if max_points_per_centroid is not None and n > k * max_points_per_centroid:
        sel = rng.choice(n, size=k * max_points_per_centroid, replace=False)
        x = x[xp.asarray(np.sort(sel))]
        n = x.shape[0]
        n_valid = None  # the gather kept exactly the valid subsample

    if init_centroids is None:
        if n < k:
            raise ValueError(f"need at least k={k} points, got {n}")
        if init == "kmeans++":
            # the seeding scan must not see capacity rows beyond n; the
            # slice is a transient copy only in the (jax-array) capacity
            # case, and only for this init mode
            init_centroids = kmeans_plusplus_init(
                x[:n] if x.shape[0] > n else x, k, seed=seed,
                precision=precision)
        elif init == "random":  # FAISS default: k distinct sample points
            init_centroids = x[xp.asarray(rng.choice(n, size=k, replace=False))]
        else:
            raise ValueError(f"unknown init '{init}'")
    init_centroids = xp.asarray(init_centroids, dtype=xp.float32).reshape(k, d)

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names])) if mesh else 1
    # the scan chunk is sized from the BUFFER, not the valid rows (the two
    # differ only for capacity buffers, n_valid): a chunk-aligned capacity
    # must stay a whole number of chunks even when n_valid is small, or the
    # `cap % unit` branch below would pad-copy the very buffer the n_valid
    # API exists to not copy (masked capacity rows cost one mostly-masked
    # scan chunk, not a copy)
    eff_chunk = min(chunk, _round_up(-(-x.shape[0] // n_dev), 8))
    unit = eff_chunk * n_dev
    cap = x.shape[0]
    if cap % unit:
        # pad up to a power-of-two chunk count (bounds recompiles for
        # host-fed repeated calls); an already chunk-aligned capacity
        # buffer skips this entirely — rows >= n are masked by the fit
        # and neither a pad nor a slice copy is made
        n_pad = _bucket_chunks(-(-cap // unit)) * unit
        x = xp.concatenate([x, xp.zeros((n_pad - cap, d), xp.float32)],
                           axis=0)

    centroids, obj = _kmeans_jit(
        jnp.asarray(x),
        jnp.int32(n),
        jnp.asarray(init_centroids),
        niter,
        eff_chunk,
        precision,
        mesh,
        axis_name if mesh else None,
        empty_policy,
    )
    return np.asarray(centroids), float(obj)


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "precision", "mesh", "axis_name", "include_x2"),
    donate_argnums=(3, 4, 5, 6),
)
def _stats_accum_jit(x, fill, centroids, sums, counts, obj_acc, x2_acc,
                     chunk, precision, mesh, axis_name,
                     include_x2: bool = True):
    """One assignment pass over a fixed-capacity super-batch, ADDED into
    device-resident accumulators (donated — updated in place, no host fetch).

    The streaming loop launches these back to back and fetches the
    accumulators ONCE per Lloyd iteration; with dispatch being async, the
    device pipelines super-batch i's stats with super-batch i+1's transfer.

    The objective splits into the centroid-dependent ``c^2 - 2xc`` part
    (``obj_acc``) and the centroid-independent ``sum ||x||^2`` part
    (``x2_acc``).  The stream is lock-step deterministic across Lloyd
    iterations, so the caller collects ``x2_acc`` on iteration 0 only
    (``include_x2=False`` afterwards — at the bf16 tier the per-point x2
    add was the VPU bottleneck of the whole pass).

    ``x`` may arrive in a reduced wire dtype (bf16): it is cast back to
    float32 here, on device, so accumulation precision is wire-independent.

    Unsharded, ``fill`` is a traced scalar marking the valid leading rows.
    Sharded, ``fill`` is an (n_dev,) int32 array sharded over the mesh axis —
    each device masks its OWN shard's prefix, which makes the program
    correct under multi-process meshes where every process fills its local
    shard independently.  Masks are built on device (an 8 MB host mask per
    feed would swamp slow host<->device links)."""
    d = x.shape[1]
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)  # reduced wire dtype -> f32 accumulation

    if mesh is None:
        xs = x.reshape(-1, chunk, d)
        ms = (jnp.arange(x.shape[0], dtype=jnp.int32) < fill).astype(
            jnp.float32).reshape(-1, chunk)
        s, c, o = _lloyd_stats(xs, ms, centroids, precision, None,
                               include_x2=False)
        if include_x2:
            x2_acc = x2_acc + jnp.sum(jnp.sum(xs * xs, axis=2) * ms)
        return sums + s, counts + c, obj_acc + o, x2_acc

    def sharded(xl, fl, c, sm, cn, ob, x2a):
        n_local = xl.shape[0]
        idx = jnp.arange(n_local, dtype=jnp.int32)
        ml = (idx < fl[0]).astype(jnp.float32)  # per-device prefix fill
        xs_l = xl.reshape(-1, chunk, d)
        ms_l = ml.reshape(-1, chunk)
        s, cnt, o = _lloyd_stats(xs_l, ms_l, c, precision, axis_name,
                                 include_x2=False)
        if include_x2:
            x2a = x2a + jax.lax.psum(
                jnp.sum(jnp.sum(xs_l * xs_l, axis=2) * ms_l), axis_name)
        return (sm + jax.lax.psum(s, axis_name),
                cn + jax.lax.psum(cnt, axis_name),
                ob + jax.lax.psum(o, axis_name),
                x2a)

    return jax.shard_map(
        sharded, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )(x, fill, centroids, sums, counts, obj_acc, x2_acc)


class _SuperbatchFeeder:
    """Packs an iterator of (m_i, d) arrays into fixed-capacity super-batches.

    Each feed is a FRESH buffer: it is handed to an asynchronous device
    transfer (and optionally retained by the stream cache), so it must
    outlive the yield.  Live host memory is bounded by the pipeline depth
    (a few super-batches), not the corpus.  Device-resident inputs of
    exactly one capacity pass through untouched.

    ``wire_dtype=ml_dtypes.bfloat16`` packs the super-batches in bf16 —
    HALF the host->device bytes and half the stream-cache RAM for the
    pipeline's binding stage on link-bound hosts (frames are rounded once
    on the host; the device casts back to f32, so accumulation precision is
    unchanged — assignment churn is the already-measured bf16-input class)."""

    def __init__(self, capacity: int, d: int, wire_dtype=np.float32):
        self.capacity = capacity
        self.d = d
        self.wire_dtype = wire_dtype

    def feeds(self, batches):
        buf = None
        fill = 0
        for batch in batches:
            if isinstance(batch, jax.Array) and batch.shape[0] == self.capacity \
                    and fill == 0:
                # device-resident, exactly one super-batch: zero-copy path
                yield batch, self.capacity
                continue
            batch = np.asarray(batch)
            if batch.dtype != self.wire_dtype:
                batch = batch.astype(self.wire_dtype)
            if batch.shape[1] != self.d:
                raise ValueError(
                    f"feed dim {batch.shape[1]} != expected {self.d}"
                )
            pos = 0
            while pos < len(batch):
                if buf is None:
                    buf = np.zeros((self.capacity, self.d), self.wire_dtype)
                take = min(self.capacity - fill, len(batch) - pos)
                buf[fill : fill + take] = batch[pos : pos + take]
                fill += take
                pos += take
                if fill == self.capacity:
                    yield buf, fill
                    buf, fill = None, 0
        if fill:
            yield buf, fill


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name"))
def _psum_leading(x, mesh, axis_name):
    """psum of each device's leading element of an axis-sharded array —
    the broadcast/sum primitive of the multi-process streaming protocol
    (one contribution per process, replicated result on every process)."""

    def f(v):
        return jax.lax.psum(v[0], axis_name)

    return jax.shard_map(f, mesh=mesh, in_specs=P(axis_name),
                         out_specs=P())(x)


def _FeedPipeline(feeder, source, put_fn, depth: int = 2):
    """Producer thread: packs the stream into super-batches and launches the
    host->device transfer, keeping ``depth`` feeds in flight while the
    consumer's stats dispatches run.  Overlaps host decode/pack/transfer
    with device compute — the streaming path's round-2 bottleneck (the loop
    was fully synchronous: pack, transfer, stats, host fetch, repeat).
    Built on the shared utils/worker.BoundedProducer shutdown plumbing."""
    from audio_tokens_tpu.utils.worker import BoundedProducer

    def items():
        for buf, fill in feeder.feeds(source):
            x, fills = put_fn(buf, fill)
            yield (x, fills, fill, buf)

    return BoundedProducer(items(), depth=depth)


def kmeans_fit_streaming(
    batches_fn,
    k: int,
    niter: int = 20,
    *,
    d: Optional[int] = None,
    seed: int = 1234,
    init_centroids: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "data",
    chunk: int = DEFAULT_CHUNK,
    superbatch_rows: int = 1 << 20,
    precision=jax.lax.Precision.HIGHEST,
    init: str = "random",
    empty_policy: str = "keep",
    cache_mb: int = 0,
    cache_spill_path=None,
    cache_spill_mb: int = 0,
    hbm_cache_mb: int = 0,
    pipeline_depth: int = 2,
    wire_dtype=np.float32,
    start_iter: int = 0,
    checkpoint_fn=None,
) -> Tuple[np.ndarray, float, int]:
    """Full-corpus Lloyd over a data stream too large for host RAM / HBM.

    ``batches_fn() -> iterator of (m_i, d) float32 arrays`` is called once
    per Lloyd iteration (niter passes over the data).  Per iteration, points
    are packed into fixed-capacity super-batches; each super-batch runs one
    compiled assignment pass (sharded over ``mesh`` with a psum pair when
    given) whose (sums, counts, objective) accumulate ON DEVICE; centroids
    update once per iteration (one host fetch per iteration total).  A
    producer thread packs + transfers the next super-batch while the device
    computes the current one, so host decode cost hides behind compute.
    Live host memory is bounded by ``pipeline_depth + 1`` super-batch
    buffers (``superbatch_rows * d * 4`` bytes each) regardless of corpus
    size — the capability FAISS gave the reference
    (processors/cluster_creator.py:42-56) without its 10k-file batching
    crutch.

    ``cache_mb > 0`` additionally caches packed super-batches in host RAM
    during the first iteration and replays them for the remaining ones — the
    stream (e.g. the fused pipeline's decode+mel) is then produced ONCE
    instead of ``niter`` times.  If the corpus exceeds the budget the cache
    SPILLS TO DISK when ``cache_spill_path``/``cache_spill_mb`` are set
    (already-cached entries migrate, the rest append; replay then reads
    memmap views off NVMe at sequential rate — the 'staged' leg of the
    2M-clip plan, whose 880 GB of frames fit neither RAM nor HBM but
    re-decoding them 20x costs far more than one sequential disk pass);
    with no spill configured (or the disk budget also exceeded) the cache
    is dropped and every iteration re-streams (logged, with per-iteration
    stream-wait time so the re-decode cost is visible).  The spill file is
    per-fit scratch, deleted on return; multi-process fits need a
    per-process path.

    ``hbm_cache_mb > 0`` goes one level further: iteration 0's transferred
    super-batches are RETAINED ON DEVICE (the stats program does not donate
    its input) and later iterations iterate over the resident arrays — no
    host decode, no packing, and no host->device wire at all after the
    first pass.  The balanced-AudioSet frame corpus (~8.7 GB f32, half at
    ``wire_dtype=bf16``) fits a single v5e's HBM; under a mesh each
    process retains its own shards, so a pod slice divides the residency
    per chip.  Replay is bit-identical to re-streaming (same arrays, same
    order, same programs — tested).  Budget overflow drops the resident
    set and falls back to the host cache / re-stream path (logged).  The
    host cache is skipped while the HBM cache is sealed.

    Init without explicit centroids draws from the FIRST super-batch
    (seeded sample / k-means++), mirroring FAISS's subsampled training.
    Returns (centroids, final objective, total points seen).

    ``wire_dtype=ml_dtypes.bfloat16`` (config ``kmeans_wire='bf16'``) halves
    the host->device stream bytes and the stream-cache RAM: frames are
    rounded to bf16 once on the host and cast back to f32 on device, so the
    Lloyd accumulation itself stays f32 at any ``precision`` tier.  On
    link-bound hosts the streaming stage is wire-bound (BASELINE.md 10k-clip
    rehearsal), making this ~2x stage wall-clock; centroid movement is the
    already-measured bf16-rounding class.

    Mid-fit resume: ``checkpoint_fn(completed_iters, centroids, obj)`` is
    called after every Lloyd iteration (the centroid update is the natural
    restart point — it is the only cross-iteration state besides the
    iteration-invariant corpus).  ``start_iter=j`` with
    ``init_centroids=<checkpointed centroids>`` resumes exactly where a
    killed run stopped: because the stream is deterministic across
    iterations (a documented requirement of this API), the resumed
    trajectory is bit-identical to an uninterrupted run's — the ``sum
    ||x||^2`` objective term is simply re-collected on the first resumed
    iteration.  The reference had no counterpart: FAISS ``Kmeans.train``
    (reference processors/cluster_creator.py:42-56) restarts from zero.
    """
    import time as _time

    from jax.sharding import NamedSharding

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names])) if mesh else 1
    mp = mesh is not None and jax.process_count() > 1
    if mp:
        n_local_dev = int(np.prod(
            [mesh.local_mesh.shape[a] for a in mesh.local_mesh.axis_names]))
    else:
        n_local_dev = n_dev
    if d is None:
        probe = next(iter(batches_fn()), None)
        if probe is None:
            raise ValueError("empty stream")
        # .shape, never np.asarray: a device-resident probe would otherwise
        # cost a full super-batch device->host fetch just to read d
        shape = getattr(probe, "shape", None)
        d = int(shape[1] if shape else np.asarray(probe).shape[1])
    per_dev_chunks = max(1, superbatch_rows // (n_dev * chunk))
    per_dev_rows = per_dev_chunks * chunk
    capacity = n_dev * per_dev_rows          # global super-batch rows
    capacity_local = n_local_dev * per_dev_rows  # this process's share
    # multi-process: each process packs its OWN local shard of every global
    # super-batch from its own stream (the caller feeds local data)
    feeder = _SuperbatchFeeder(capacity_local, d, wire_dtype)
    rng = np.random.default_rng(seed)

    def _device_fills(fill_local: int) -> np.ndarray:
        """Per-local-device prefix fills for a locally-packed buffer."""
        i = np.arange(n_local_dev)
        return np.clip(fill_local - i * per_dev_rows, 0,
                       per_dev_rows).astype(np.int32)

    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis_name))

        def put_fn(buf, fill):
            fills = _device_fills(fill)
            if mp:
                if isinstance(buf, jax.Array):
                    buf = np.asarray(buf)
                WIRE.h2d(buf)  # this process's super-batch shard
                x = jax.make_array_from_process_local_data(
                    sharding, buf, global_shape=(capacity, d))
                f = jax.make_array_from_process_local_data(
                    sharding, fills, global_shape=(n_dev,))
                return x, f
            if not isinstance(buf, jax.Array):
                WIRE.h2d(buf)  # super-batch over the host link
                buf = jax.device_put(buf, sharding)
            return buf, jax.device_put(fills, sharding)
    else:
        def put_fn(buf, fill):
            if not isinstance(buf, jax.Array):
                WIRE.h2d(buf)
                buf = jnp.asarray(buf)
            return buf, jnp.int32(fill)

    def _global_sum(value: np.ndarray) -> np.ndarray:
        """Sum a per-process host value across processes (one contribution
        per process, placed on its first local device)."""
        value = np.asarray(value, np.float32)
        arr = np.zeros((n_local_dev,) + value.shape, np.float32)
        arr[0] = value
        g = jax.make_array_from_process_local_data(
            sharding, arr, global_shape=(n_dev,) + value.shape)
        return np.asarray(_psum_leading(g, mesh, axis_name))

    def _global_sum_int(n: int) -> int:
        """EXACT cross-process sum of a python int.  float32 psums lose
        integer exactness past 2^24 — corpus frame counts blow through that
        — so the value travels as 16-bit limbs in an int32 psum (exact for
        counts < 2^64 across < 2^15 processes)."""
        limbs = np.array([(int(n) >> (16 * i)) & 0xFFFF for i in range(4)],
                         np.int32)
        arr = np.zeros((n_local_dev, 4), np.int32)
        arr[0] = limbs
        g = jax.make_array_from_process_local_data(
            sharding, arr, global_shape=(n_dev, 4))
        out = np.asarray(_psum_leading(g, mesh, axis_name))
        return int(sum(int(v) << (16 * i) for i, v in enumerate(out)))

    centroids = None
    if init_centroids is not None:
        centroids = np.asarray(init_centroids, np.float32).reshape(k, d)
    if start_iter > 0 and centroids is None:
        raise ValueError(
            "start_iter > 0 resumes a prior fit and requires its "
            "checkpointed centroids as init_centroids")
    if start_iter >= niter:
        raise ValueError(f"start_iter {start_iter} >= niter {niter}")

    def _init_centroids_from(buf, fill) -> np.ndarray:
        """Seeded init from the first super-batch.  Multi-process: process 0
        draws from ITS local shard and the result is broadcast (a psum of a
        one-hot contribution), so every process starts from identical
        centroids."""
        if mp:
            fill0 = _global_sum_int(fill if jax.process_index() == 0 else 0)
            if fill0 < k:
                raise ValueError(
                    f"process 0's first super-batch has {fill0} points < k={k}"
                )
            if jax.process_index() == 0:
                sample = np.asarray(buf[:fill], np.float32)
                if init == "kmeans++":
                    c0 = np.asarray(kmeans_plusplus_init(sample, k, seed=seed))
                elif init == "random":
                    c0 = sample[rng.choice(fill, size=k, replace=False)]
                else:
                    raise ValueError(f"unknown init '{init}'")
            else:
                c0 = np.zeros((k, d), np.float32)
            return _global_sum(np.asarray(c0, np.float32)).astype(np.float32)
        if fill < k:
            raise ValueError(f"first super-batch has {fill} points < k={k}")
        sample = np.asarray(buf[:fill], np.float32)
        if init == "kmeans++":
            c0 = kmeans_plusplus_init(sample, k, seed=seed)
        elif init == "random":
            c0 = sample[rng.choice(fill, size=k, replace=False)]
        else:
            raise ValueError(f"unknown init '{init}'")
        return np.asarray(c0, np.float32)

    # a configured spill with cache_mb=0 means "cache on disk only": the RAM
    # tier exists but overflows on the first entry, migrating straight to
    # the file
    want_spill = cache_spill_path is not None and cache_spill_mb > 0
    cache: Optional[list] = [] if (cache_mb > 0 or want_spill) else None
    spill: Optional[_DiskSpill] = None  # disk tier, engaged on RAM overflow
    cache_sealed = False
    cache_bytes = 0
    # device-resident corpus: iteration 0's (x, fills, fill) feeds retained
    hbm: Optional[list] = [] if hbm_cache_mb > 0 else None
    hbm_sealed = False
    hbm_bytes = 0

    def _local_nbytes(arr) -> int:
        try:
            return sum(s.data.nbytes for s in arr.addressable_shards)
        except Exception:
            return arr.nbytes
    zeros_local = None  # lazily-allocated zero feed for exhausted processes
    n_feeds_sched = None  # global feed count, fixed by iteration 0 (mp)

    n_total = 0
    obj = float("nan")
    x2_total = None  # sum ||x||^2: iteration-invariant, collected on iter 0
    ax = axis_name if mesh else None
    try:
        for it in range(start_iter, niter):
            first_pass = it == start_iter
            t_iter = _time.perf_counter()
            t_wait = 0.0
            sums = jnp.zeros((k, d), jnp.float32)
            counts = jnp.zeros((k,), jnp.float32)
            obj_acc = jnp.float32(0.0)
            x2_acc = jnp.float32(0.0)
            if mesh is not None:
                sums, counts, obj_acc, x2_acc = (
                    jax.device_put(v, NamedSharding(mesh, P()))
                    for v in (sums, counts, obj_acc, x2_acc)
                )
            n_seen = 0
            from_hbm = hbm is not None and hbm_sealed and not first_pass
            from_cache = (not from_hbm and cache_sealed and not first_pass
                          and (cache is not None or spill is not None))
            if from_hbm:
                # device-resident replay: no feeder thread, no put_fn, no wire
                source_iter = iter([(x, fills, fill, None)
                                    for x, fills, fill in hbm])
            elif from_cache:
                source_iter = _FeedPipeline(
                    _CacheReplay(capacity_local, d),
                    cache if cache is not None else spill.entries(),
                    put_fn, depth=pipeline_depth)
            else:
                source_iter = _FeedPipeline(
                    feeder, batches_fn(), put_fn, depth=pipeline_depth)
            centroids_dev = (jnp.asarray(centroids)
                             if centroids is not None else None)
            n_feeds = 0
            try:
                feeds = iter(source_iter)
                t_last = _time.perf_counter()
                while True:
                    item = next(feeds, None)
                    t_wait += _time.perf_counter() - t_last
                    if mp:
                        # lock-step feed agreement: every process must dispatch
                        # the same number of (collective) stats programs.  The
                        # schedule is discovered with a tiny psum per feed on
                        # iteration 0 and replayed verbatim after (the stream is
                        # deterministic across iterations).
                        if n_feeds_sched is None:  # iteration 0: discover
                            more = float(_global_sum(
                                np.float32(0.0 if item is None else 1.0)))
                            if more == 0.0:
                                break
                        else:
                            if n_feeds >= n_feeds_sched:
                                if item is not None:
                                    raise RuntimeError(
                                        "stream yielded more super-batches than "
                                        "iteration 0 — streams must be "
                                        "deterministic across Lloyd iterations"
                                    )
                                break
                        if item is None:  # exhausted locally; others continue
                            if zeros_local is None:
                                zeros_local = np.zeros((capacity_local, d),
                                                       wire_dtype)
                            item = (*put_fn(zeros_local, 0), 0, None)
                    elif item is None:
                        break
                    x, fills, fill, buf = item
                    if centroids_dev is None:  # init from the first super-batch
                        centroids = _init_centroids_from(buf, fill)
                        centroids_dev = jnp.asarray(centroids)
                    sums, counts, obj_acc, x2_acc = _stats_accum_jit(
                        x, fills, centroids_dev, sums, counts, obj_acc, x2_acc,
                        chunk, precision, mesh, ax,
                        include_x2=x2_total is None,
                    )
                    n_feeds += 1
                    n_seen += fill
                    if hbm is not None and not hbm_sealed and first_pass:
                        # retain the transferred device feed (x is NOT donated
                        # by the stats program); fills/fill replay as-is
                        hbm_bytes += _local_nbytes(x)
                        if hbm_bytes > hbm_cache_mb * (1 << 20):
                            logger.info(
                                "HBM corpus cache dropped: exceeds "
                                "hbm_cache_mb=%d (falling back to %s)",
                                hbm_cache_mb,
                                "host cache" if cache is not None
                                else "disk spill" if spill is not None
                                else "re-stream")
                            hbm = None
                        else:
                            hbm.append((x, fills, fill))
                    if ((cache is not None or spill is not None)
                            and not cache_sealed and first_pass
                            and buf is not None):
                        if isinstance(buf, jax.Array):
                            logger.info(
                                "stream cache disabled: device-resident feeds")
                            if spill is not None:
                                spill.cleanup()  # drop the scratch file too
                            cache = spill = None
                        elif spill is not None:
                            if not spill.append(buf, fill):
                                logger.info(
                                    "stream spill dropped: corpus exceeds "
                                    "cache_spill_mb=%d (each Lloyd iteration "
                                    "re-streams)", cache_spill_mb)
                                spill.cleanup()
                                spill = None
                        else:
                            # partial feeds (the stream tail) are cached trimmed;
                            # replay re-pads them to the compiled capacity
                            entry = (buf if fill == len(buf)
                                     else buf[:fill].copy())
                            cache_bytes += entry.nbytes
                            if cache_bytes <= cache_mb * (1 << 20):
                                cache.append((entry, fill))
                            elif cache_spill_path is not None and cache_spill_mb > 0:
                                # RAM overflow -> disk tier: migrate what's
                                # cached, keep appending to the file
                                spill = _DiskSpill(cache_spill_path, d,
                                                   wire_dtype, cache_spill_mb)
                                ok = all(spill.append(e, f_)
                                         for e, f_ in cache + [(entry, fill)])
                                cache = None
                                if ok:
                                    logger.info(
                                        "stream cache spilled to disk: %s "
                                        "(exceeded cache_mb=%d)",
                                        cache_spill_path, cache_mb)
                                else:
                                    logger.info(
                                        "stream spill dropped: corpus exceeds "
                                        "cache_spill_mb=%d (each Lloyd "
                                        "iteration re-streams)", cache_spill_mb)
                                    spill.cleanup()
                                    spill = None
                            else:
                                logger.info(
                                    "stream cache dropped: corpus exceeds "
                                    "cache_mb=%d (each Lloyd iteration re-streams"
                                    " — decode/pack cost x niter)", cache_mb)
                                cache = None
                    t_last = _time.perf_counter()
            finally:
                if hasattr(source_iter, "close"):
                    source_iter.close()  # the HBM replay is a plain iterator
            if first_pass:
                if mp:
                    n_feeds_sched = n_feeds
                    n_total = _global_sum_int(n_seen)
                else:
                    n_total = n_seen
                if n_total == 0:
                    raise ValueError("empty stream")
                if hbm is not None:
                    hbm_sealed = True
                    logger.info(
                        "HBM corpus cache sealed: %d super-batches, %.0f MB "
                        "resident per process — later iterations run without "
                        "host involvement", len(hbm), hbm_bytes / (1 << 20))
                    # the host tiers will never be read (HBM replay wins
                    # every remaining iteration): free the RAM copy and
                    # delete the spill scratch now rather than at return.
                    # (They were still written during iteration 0 as
                    # insurance against a mid-iteration HBM drop — dead
                    # work bounded by hbm_cache_mb, since a corpus that
                    # seals fits the HBM budget by definition.)
                    if cache is not None or spill is not None:
                        logger.info(
                            "host stream cache released: HBM replay "
                            "supersedes it")
                        if spill is not None:
                            spill.cleanup()
                        cache = spill = None
                if cache is not None:
                    cache_sealed = True
                    logger.info("stream cache sealed: %d super-batches, %.0f MB",
                                len(cache), cache_bytes / (1 << 20))
                elif spill is not None:
                    spill.seal()
                    cache_sealed = True
                    logger.info(
                        "stream cache sealed on disk: %d super-batches, "
                        "%.0f MB at %s — later iterations replay the file "
                        "sequentially", len(spill.meta),
                        spill.nbytes() / (1 << 20), spill.path)
            # the single host sync point of the iteration (accumulators are
            # replicated shard_map outputs — addressable on every process)
            if x2_total is None:
                x2_total = float(np.asarray(x2_acc))
            sums_h = np.asarray(sums)
            counts_h = np.asarray(counts)
            nonempty = counts_h > 0
            centroids = np.where(
                nonempty[:, None],
                sums_h / np.maximum(counts_h, 1.0)[:, None],
                centroids,
            ).astype(np.float32)
            if empty_policy == "split_largest":
                centroids, _ = _split_empty_clusters_np(centroids, counts_h)
            obj = float(np.asarray(obj_acc)) + x2_total
            if from_hbm:
                # device-resident replay: the whole iteration is device
                # compute (no feeder, no wire) — credit it to the meter
                WIRE.device_add(_time.perf_counter() - t_iter)
            logger.info(
                "streaming kmeans iter %d/%d: %d pts%s, obj=%.4f (%.2fs%s)",
                it + 1, niter, n_total, " global" if mp else "", obj,
                _time.perf_counter() - t_iter,
                ", cached stream" if from_cache else
                f", waiting on stream {t_wait:.2f}s",
            )
            if checkpoint_fn is not None:
                checkpoint_fn(it + 1, centroids, obj)
    finally:
        # the spill file is per-fit scratch: delete it even on
        # failure (a crashed fit must not leak corpus-sized files)
        if spill is not None:
            spill.cleanup()
    return centroids, obj, n_total


class _DiskSpill:
    """On-disk spill tier of the stream cache: super-batches append to one
    sequential file during iteration 0 and replay as memmap views.

    This is the 'staged NVMe' leg of the 2M-clip plan (BASELINE.md): the
    corpus's ~880 GB of frames fit neither host RAM (``cache_mb``) nor HBM
    (``hbm_cache_mb``), but a sequential NVMe read at GB/s beats
    re-decoding 2M FLAC clips on every Lloyd iteration by an order of
    magnitude.  Entries are written trimmed to their fill (file size ==
    corpus bytes, in the wire dtype — bf16 wire halves the disk too);
    replay yields memmap views that the existing ``_CacheReplay`` adapter
    re-pads, so the feed pipeline and the device programs are identical to
    the RAM-cache path.  Multi-process fits pass a per-process path (each
    process spills its own stream shard)."""

    def __init__(self, path, d: int, dtype, budget_mb: int):
        from pathlib import Path as _Path

        self.path = _Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.d = d
        self.dtype = np.dtype(dtype)
        self.budget = budget_mb << 20
        self.meta: list = []  # (row_offset, fill)
        self.rows = 0
        self._f = open(self.path, "wb")
        self._mm = None

    def append(self, entry: np.ndarray, fill: int) -> bool:
        """Write one (fill, d) entry; False when the budget would overflow
        (caller drops the spill and re-streams)."""
        row_bytes = self.d * self.dtype.itemsize
        if (self.rows + fill) * row_bytes > self.budget:
            return False
        entry[:fill].tofile(self._f)
        self.meta.append((self.rows, fill))
        self.rows += fill
        return True

    def seal(self) -> None:
        self._f.flush()
        self._f.close()
        self._f = None
        self._mm = np.memmap(self.path, dtype=self.dtype, mode="r",
                             shape=(self.rows, self.d))

    def entries(self):
        """(view, fill) pairs — the same shape _CacheReplay.feeds consumes;
        the page-cache/NVMe read happens on the feed pipeline's producer
        thread, overlapped with device compute like any other feed."""
        for off, fill in self.meta:
            yield self._mm[off:off + fill], fill

    def nbytes(self) -> int:
        return self.rows * self.d * self.dtype.itemsize

    def cleanup(self) -> None:
        """The spill is per-fit scratch: close and delete the file."""
        if self._f is not None:
            self._f.close()
            self._f = None
        self._mm = None
        try:
            self.path.unlink(missing_ok=True)
        except OSError:  # pragma: no cover - best-effort scratch removal
            pass


class _CacheReplay:
    """Feeder-shaped adapter: replays cached (buf, fill) pairs, re-padding
    trimmed partial feeds back to the compiled super-batch capacity."""

    def __init__(self, capacity: int, d: int):
        self.capacity = capacity
        self.d = d

    def feeds(self, cached):
        for arr, fill in cached:
            if arr.shape[0] != self.capacity:
                buf = np.zeros((self.capacity, self.d), arr.dtype)
                buf[:fill] = arr
                yield buf, fill
            else:
                yield arr, fill


class KMeans:
    """faiss.Kmeans-shaped wrapper with warm-start ``train`` semantics.

    Reference call pattern (processors/cluster_creator.py:42-56):

        km = KMeans(d, k, niter=20)
        km.train(batch0)
        km.train(batch1, init_centroids=km.centroids)
    """

    def __init__(
        self,
        d: int,
        k: int,
        niter: int = 20,
        seed: int = 1234,
        mesh: Optional[Mesh] = None,
        chunk: int = DEFAULT_CHUNK,
        max_points_per_centroid: Optional[int] = None,
        precision=jax.lax.Precision.HIGHEST,
        init: str = "random",
        empty_policy: str = "keep",
    ):
        self.d = d
        self.k = k
        self.niter = niter
        self.seed = seed
        self.mesh = mesh
        self.chunk = chunk
        self.max_points_per_centroid = max_points_per_centroid
        self.precision = precision
        self.init = init
        self.empty_policy = empty_policy
        self.centroids: Optional[np.ndarray] = None
        self.obj: float = float("nan")

    def train(self, x: np.ndarray, init_centroids: Optional[np.ndarray] = None) -> float:
        self.centroids, self.obj = kmeans_fit(
            x,
            self.k,
            self.niter,
            seed=self.seed,
            init_centroids=init_centroids,
            mesh=self.mesh,
            chunk=self.chunk,
            precision=self.precision,
            max_points_per_centroid=self.max_points_per_centroid,
            init=self.init,
            empty_policy=self.empty_policy,
        )
        logger.info("kmeans objective: %.4f", self.obj)
        return self.obj
