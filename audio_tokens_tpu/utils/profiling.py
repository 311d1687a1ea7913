"""Stage profiling: wall-clock + throughput counters, optional XLA traces.

The reference had no tracing/profiling beyond tqdm bars (SURVEY.md §5).
Here every stage can report clips/sec / frames/sec, and setting
``config.profile_dir`` wraps a stage in ``jax.profiler.trace`` so the
on-device timeline is inspectable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
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
