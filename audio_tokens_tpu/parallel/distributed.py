"""Multi-host (pod-slice) execution support.

The reference is single-process, single-GPU (reference:
processors/model_trainer.py:29-35 — no torch.distributed anywhere); this
layer is the TPU-native scale-out SURVEY.md §2.6/§5 specifies: a
``jax.distributed`` runtime over ICI (intra-slice) + DCN (multi-slice),
meshes built from the GLOBAL device list with ``data`` as the DCN-outer
axis, per-process sharding of stage work, and process-0-only artifact
discipline.

Entry points:
  * ``maybe_initialize(config)`` — call once at process start.  Reads the
    coordinator/process topology from the config or the environment
    (``AUDIO_TOKENS_COORDINATOR``, ``AUDIO_TOKENS_NUM_PROCESSES``,
    ``AUDIO_TOKENS_PROCESS_ID``; on Cloud TPU all three can be omitted —
    ``jax.distributed.initialize()`` autodetects from the TPU metadata).
    No-op when not configured: single-process behavior is unchanged.
  * ``process_shard(items)`` — this process's slice of a work list
    (stages shard ytids with it; every process computes the same global
    list, so no coordination traffic).
  * ``is_coordinator()`` — True on process 0 (checkpoints, metrics files,
    plots are written once, there).
  * ``put_sharded(sharding, local_rows, global_shape)`` — assemble a
    GLOBAL array from this process's rows (``device_put`` single-process,
    ``jax.make_array_from_process_local_data`` otherwise).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize(config=None) -> bool:
    """Initialize ``jax.distributed`` once, from config fields or env vars.

    Returns True when running multi-process (whether initialized now or
    earlier).  Safe to call from every stage entry point.

    Ordering is critical: ``jax.distributed.initialize`` must run before ANY
    call that touches the XLA backend — including innocuous-looking queries
    like ``jax.process_count()`` — so the not-configured decision is made
    from config/env alone, and backend state is only consulted afterwards.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    coord = (getattr(config, "coordinator_address", "") or
             os.environ.get("AUDIO_TOKENS_COORDINATOR", ""))
    n_proc = int(getattr(config, "num_processes", 0) or
                 os.environ.get("AUDIO_TOKENS_NUM_PROCESSES", 0))
    pid = getattr(config, "process_id", -1)
    if pid is None or pid < 0:
        pid = int(os.environ.get("AUDIO_TOKENS_PROCESS_ID", -1))
    explicit = bool(coord or n_proc > 1)
    auto = bool(getattr(config, "distributed", False))
    if not (explicit or auto):
        # not configured: single-process (or a launcher already called
        # jax.distributed.initialize itself — backend state is truthful)
        return jax.process_count() > 1

    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if n_proc > 1:
        kwargs["num_processes"] = n_proc
    if pid >= 0:
        kwargs["process_id"] = pid
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        # Either the launcher beat us to it (the runtime is already up and
        # multi-process — benign) or this init genuinely came after a
        # single-process backend was touched (real error).  The messages
        # overlap across jax versions, so distinguish by the runtime STATE,
        # which is safe to query now that the backend exists either way.
        if jax.process_count() <= 1:
            raise
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """True on the process that owns single-writer artifacts (checkpoints,
    metrics history, plots, stats reports)."""
    return jax.process_index() == 0


def process_shard(items: Sequence, index: Optional[int] = None,
                  count: Optional[int] = None) -> list:
    """This process's strided slice of a globally-known work list.

    Every process derives the same global list (same split file, same seed),
    so sharding is pure arithmetic — no coordination.  Strided (not
    contiguous) so per-clip cost variation spreads evenly.
    """
    i = jax.process_index() if index is None else index
    n = jax.process_count() if count is None else count
    return list(items)[i::n]


def put_sharded(sharding, local_rows: np.ndarray, global_shape=None):
    """Assemble a global device array sharded per ``sharding`` from THIS
    process's rows.  Single-process: a plain device_put of the full array
    (``local_rows`` then IS the global array)."""
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape=global_shape
    )


def barrier(name: str) -> None:
    """Cross-process barrier (no-op single-process).  Used at stage artifact
    boundaries: e.g. process 0 wipes an output dir before others write, and
    all processes wait for every shard's artifacts before the next stage."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_sum_hosts(value: np.ndarray) -> np.ndarray:
    """Element-wise sum of a per-process host array across processes
    (identity single-process).  Used for global stage statistics, e.g. the
    tokenizer's per-token counts."""
    if jax.process_count() == 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(value))
    return np.asarray(gathered).sum(axis=0)


def local_row_bounds(n_rows: int, index: Optional[int] = None,
                     count: Optional[int] = None) -> tuple:
    """(lo, hi) row range this process owns of an n_rows batch sharded
    contiguously across processes (the layout make_array_from_process_local_data
    expects for a leading-axis NamedSharding over the data axis)."""
    i = jax.process_index() if index is None else index
    n = jax.process_count() if count is None else count
    if n_rows % n:
        raise ValueError(f"{n_rows} rows not divisible by {n} processes")
    per = n_rows // n
    return i * per, (i + 1) * per
