"""Stage profiling: wall-clock + throughput counters, optional XLA traces.

The reference had no tracing/profiling beyond tqdm bars (SURVEY.md §5).
Here every stage can report clips/sec / frames/sec, and setting
``config.profile_dir`` wraps a stage in ``jax.profiler.trace`` so the
on-device timeline is inspectable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from typing import Iterator, Optional

logger = logging.getLogger(__name__)


class StageTimer:
    """Context manager: wall time + named unit counters -> one log line.

    with StageTimer("tokenize/train") as t:
        ...
        t.count("clips", n)
        t.count("frames", total_frames)
    """

    def __init__(self, name: str):
        self.name = name
        self.counters: dict = {}
        self.seconds = 0.0

    def count(self, unit: str, n: int) -> None:
        self.counters[unit] = self.counters.get(unit, 0) + int(n)

    def __enter__(self) -> "StageTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.seconds = time.perf_counter() - self._t0
        rates = "  ".join(
            f"{unit}={n} ({n / max(self.seconds, 1e-9):.1f}/s)"
            for unit, n in self.counters.items()
        )
        logger.info("[%s] %.2fs  %s", self.name, self.seconds, rates)


class WireMeter:
    """Process-global link/compute accounting for rehearsal reporting.

    Composed-stage wall-clocks on tunneled-TPU hosts are tunnel-noise (the
    same clustering stage measured 111-680 s across sessions, BASELINE.md);
    what IS durable is (a) how many bytes each stage moved over the host
    link and (b) how long the device-resident compute sections ran.  The
    dominant movers increment this meter at their actual transfer sites
    (waveform/frame feeds, corpus uploads, spectrogram/token downloads);
    device-resident sections (whole-epoch programs, Lloyd replay
    iterations, fused VQ passes) wrap themselves in ``device()``.  Scalar
    fetches and small artifacts are ignored — they dominate LATENCY on RPC
    links but not bytes.  ``tools/scale_run.py`` snapshots the meter around
    each stage and prints the per-stage columns (VERDICT r4 #8).

    Semantics: bytes THIS PROCESS moved over ITS host↔device link —
    multi-host transfer sites meter their process-local shard, not the
    global array.  Counters are lock-guarded: the prefetch pipeline and
    feed producers increment from background threads.
    """

    def __init__(self):
        self.h2d_bytes = 0
        self.d2h_bytes = 0
        self.device_seconds = 0.0
        self._lock = threading.Lock()

    def h2d(self, *arrays) -> None:
        n = sum(getattr(a, "nbytes", 0) for a in arrays)
        with self._lock:
            self.h2d_bytes += n

    def d2h(self, *arrays) -> None:
        n = sum(getattr(a, "nbytes", 0) for a in arrays)
        with self._lock:
            self.d2h_bytes += n

    @contextlib.contextmanager
    def device(self) -> Iterator[None]:
        """Time a device-resident compute section (dispatch RPC amortizes
        to <1% at the >=100 ms program granularity these sections run)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.device_add(time.perf_counter() - t0)

    def device_add(self, seconds: float) -> None:
        with self._lock:
            self.device_seconds += seconds

    def snapshot(self) -> tuple:
        with self._lock:
            return (self.h2d_bytes, self.d2h_bytes, self.device_seconds)

    def delta(self, snap: tuple) -> dict:
        return {
            "h2d_mb": (self.h2d_bytes - snap[0]) / 2**20,
            "d2h_mb": (self.d2h_bytes - snap[1]) / 2**20,
            "device_s": self.device_seconds - snap[2],
        }


WIRE = WireMeter()


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace when a directory is configured; no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        logger.info("profiling to %s", profile_dir)
        yield
