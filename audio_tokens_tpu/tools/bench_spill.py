"""Measure the K-means stream-cache disk-spill tier (VERDICT r4 #7).

The 2M-clip projection's clustering leg (BASELINE.md) rests on
``_DiskSpill`` (ops/kmeans.py) staging the packed frame stream to NVMe on
Lloyd iteration 0 and replaying it as memmap views on iterations 1..n-1,
instead of re-decoding 2M FLAC clips per iteration (the reference loads the
whole corpus in RAM for FAISS: /root/reference/processors/cluster_creator.py
:42-56 — no spill tier exists to be out-scaled, it simply OOMs).  Until now
the tier had only small-fixture unit tests; this tool measures it at
rehearsal scale:

  * write leg: sequential append of super-batch entries (iteration 0's
    extra cost over plain streaming);
  * cold replay: the file is evicted from the page cache with
    ``posix_fadvise(POSIX_FADV_DONTNEED)`` first, so the read hits the
    actual disk — the regime a 2M-clip (880 GB) corpus is always in;
  * warm replay: page-cache rate, the bound for corpora under host RAM.

Replay entries are fully materialized (``np.asarray``) exactly like the
feed pipeline's producer thread does before shipping a super-batch, so the
measured rate includes the memmap->RAM copy, not just readahead.

Usage: python -m audio_tokens_tpu.tools.bench_spill [--gb 8] [--d 64]
       [--wire f32|bf16] [--rows-per-entry 1048576] [--path DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--gb", type=float, default=8.0,
                        help="total spill file size to write/replay")
    parser.add_argument("--d", type=int, default=64,
                        help="feature dim (10k rehearsal: n_mels*conv=64)")
    parser.add_argument("--wire", default="f32", choices=("f32", "bf16"))
    parser.add_argument("--rows-per-entry", type=int, default=1 << 20,
                        help="super-batch rows per spill entry")
    parser.add_argument("--path", default=None,
                        help="directory for the scratch file (default: a "
                             "tempdir on the same filesystem as CWD)")
    args = parser.parse_args()

    from audio_tokens_tpu.ops.kmeans import _DiskSpill

    if args.wire == "bf16":
        import ml_dtypes

        dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        dtype = np.dtype(np.float32)

    row_bytes = args.d * dtype.itemsize
    total_bytes = int(args.gb * 2**30)
    n_entries = max(1, total_bytes // (args.rows_per_entry * row_bytes))
    base = Path(args.path) if args.path else Path(tempfile.mkdtemp(
        prefix="audiotokens_spill_", dir="."))
    base.mkdir(parents=True, exist_ok=True)
    path = base / "spill_bench.bin"

    # one reusable entry: write timing measures bytes, not RNG
    rng = np.random.default_rng(0)
    entry = rng.standard_normal(
        (args.rows_per_entry, args.d)).astype(np.float32).astype(dtype)
    gb = n_entries * args.rows_per_entry * row_bytes / 2**30
    print(f"spill file: {path}  ({n_entries} entries x "
          f"{args.rows_per_entry} rows x d={args.d} {args.wire} = {gb:.1f} "
          f"GB)", flush=True)

    spill = _DiskSpill(path, args.d, dtype, budget_mb=1 << 30)
    t0 = time.perf_counter()
    for _ in range(n_entries):
        if not spill.append(entry, args.rows_per_entry):
            raise RuntimeError(
                "spill budget exhausted mid-write; raise budget_mb — the "
                "measurement would silently cover fewer bytes than claimed")
    spill._f.flush()
    os.fsync(spill._f.fileno())
    t_write = time.perf_counter() - t0
    spill.seal()
    nbytes = spill.nbytes()

    # np.asarray on a memmap slice is a VIEW (no IO); the feed producer
    # copies each entry into its padded host buffer before device_put, so
    # replay timing must include that memmap->RAM copy
    buf = np.empty_like(entry)

    def replay() -> float:
        t0 = time.perf_counter()
        for view, fill in spill.entries():
            buf[:fill] = view
        return time.perf_counter() - t0

    # cold: evict the file from the page cache so the read hits the disk
    with open(path, "rb") as f:
        os.posix_fadvise(f.fileno(), 0, 0, os.POSIX_FADV_DONTNEED)
    t_cold = replay()
    t_warm = replay()

    result = {
        "gb": round(nbytes / 2**30, 2),
        "wire": args.wire,
        "write_mb_s": round(nbytes / 2**20 / t_write, 1),
        "cold_replay_mb_s": round(nbytes / 2**20 / t_cold, 1),
        "warm_replay_mb_s": round(nbytes / 2**20 / t_warm, 1),
        "write_s": round(t_write, 1),
        "cold_replay_s": round(t_cold, 1),
        "warm_replay_s": round(t_warm, 1),
    }
    print(json.dumps(result))
    spill.cleanup()
    if args.path is None:
        base.rmdir()


if __name__ == "__main__":
    main()
