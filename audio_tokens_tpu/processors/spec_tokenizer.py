"""Stage 3: spectrograms -> nearest-centroid token-ID sequences.

Same artifact contract as the reference
(reference: processors/spec_tokenizer.py:41-90): reads
``{source_spec_path}/{split}/*.npy``, writes one int64 token array per clip to
``{dest_tokenized_path}/{split}/{ytid}.npy`` (one token per STFT frame), wipes
output dirs per run, and on the train split reports token statistics with
distribution + Zipf plots.

The FAISS ``IndexFlatL2`` search is replaced by the fused VQ router in
``ops/vq.py`` (Pallas VMEM kernel on TPU, file-batches sharded over the
device mesh); the conv front-end (when enabled) shares weights with the
cluster stage by construction instead of by RNG coincidence.

``config.fused_pipeline=True`` skips the spectrogram artifacts entirely:
clips go wav -> mel -> token IDs in one on-device program per batch (the
Pallas megakernel on TPU) while still emitting the same per-clip token
``.npy`` contract.
"""

from __future__ import annotations

import json
import logging
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List

import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.ops.vq import vq_assign_fused
from audio_tokens_tpu.parallel import distributed
from audio_tokens_tpu.parallel.mesh import data_mesh
from audio_tokens_tpu.processors.cluster_creator import make_conv_features
from audio_tokens_tpu.utils.npy_io import atomic_save_npy
from audio_tokens_tpu.utils.profiling import WIRE, StageTimer, maybe_trace
from audio_tokens_tpu.utils.seeding import set_seed

logger = logging.getLogger(__name__)


def _token_file_ok(path: Path) -> bool:
    """Cheap structural validation of an existing token .npy (header parse +
    mmap length check — the data bytes are never read).  Incremental runs on
    splits WITHOUT a count ledger (validation) use this so a corrupt file is
    re-tokenized instead of being skipped forever by the exists+mtime check;
    the train split's ledger catch-up np.loads those files anyway."""
    try:
        np.load(path, mmap_mode="r")
        return True
    except Exception:
        return False


class _CountLedger:
    """Whole-corpus token statistics across incremental runs.

    The reference always re-tokenizes destructively, so its stats/plots are
    always whole-corpus (reference: processors/spec_tokenizer.py:129-240).
    Incremental runs only tokenize missing/stale clips — this ledger keeps
    the reported statistics whole-corpus anyway:

      * ``{split}.token_counts.npz`` next to the token dir persists the
        aggregate per-token counts plus a MANIFEST of the clip stems they
        cover and the centroid mtime they were computed against;
      * on an incremental run, fresh already-tokenized clips NOT in the
        manifest (e.g. written by an interrupted run that never saved
        counts) are "caught up" by bincounting their token files — far
        cheaper than re-tokenizing;
      * the prior is dropped wholesale when the centroids changed (every
        token file is stale then anyway) or when a manifest clip's token
        file disappeared (its counts could not be subtracted).

    Net effect: incremental-run statistics artifacts match a destructive
    rerun's exactly (tested in tests/test_incremental_counts.py).
    """

    def __init__(self, token_dir: Path, vocab: int, cent_mtime: float,
                 load_prior: bool):
        self.token_dir = token_dir
        self.path = token_dir.parent / f"{token_dir.name}.token_counts.npz"
        self.vocab = vocab
        self.cent_mtime = cent_mtime
        self.prior = np.zeros(vocab, np.int64)
        self.prior_set = frozenset()
        if not load_prior or not self.path.exists():
            return
        try:
            z = np.load(self.path, allow_pickle=False)
            if float(z["cent_mtime"]) != cent_mtime:
                return  # new codebook: every prior count is stale
            counts = np.asarray(z["counts"], np.int64)
            if counts.shape != (vocab,):
                return
            stems = set(str(s) for s in z["ytids"])
            on_disk = {f.stem for f in token_dir.glob("*.npy")}
            if not stems <= on_disk:
                logger.info(
                    "token-count ledger dropped: %d counted clips no longer "
                    "on disk", len(stems - on_disk))
                return
            self.prior = counts
            self.prior_set = frozenset(stems)
        except Exception as e:
            logger.warning("token-count ledger unreadable (%s); rebuilding", e)

    def catchup_counts(self, fresh_stems):
        """(counts, failed_stems) for already-tokenized clips outside the
        manifest (call with THIS process's shard; counts are psum'd with the
        new counts).  A clip whose token file turns out unreadable (e.g. a
        torn write from a killed run) is returned in ``failed_stems`` so the
        caller re-tokenizes it instead of failing the stage."""
        counts = np.zeros(self.vocab, np.int64)
        missing = [s for s in fresh_stems if s not in self.prior_set]
        failed = []
        for stem in missing:
            try:
                toks = np.load(self.token_dir / f"{stem}.npy")
                counts += np.bincount(np.asarray(toks, np.int64),
                                      minlength=self.vocab)
            except Exception as e:
                logger.warning("token file %s unreadable (%s); re-tokenizing",
                               stem, e)
                # drop the corrupt file now: if re-tokenization can't happen
                # (fused mode with the source audio gone) a fresh-mtime file
                # would be claimed by the saved manifest without its counts
                # ever entering the ledger
                (self.token_dir / f"{stem}.npy").unlink(missing_ok=True)
                failed.append(stem)
        if missing:
            logger.info("token-count ledger: caught up %d clips from token "
                        "files", len(missing) - len(failed))
        return counts, failed

    def save(self, merged_counts: np.ndarray) -> None:
        """Persist merged counts + the manifest of fresh clips they cover
        (coordinator only; atomic)."""
        import io

        from audio_tokens_tpu.utils.npy_io import atomic_save_bytes

        manifest = sorted(
            f.stem for f in self.token_dir.glob("*.npy")
            if f.stat().st_mtime >= self.cent_mtime
        )
        buf = io.BytesIO()
        np.savez(buf, counts=np.asarray(merged_counts, np.int64),
                 ytids=np.asarray(manifest),
                 cent_mtime=np.float64(self.cent_mtime))
        atomic_save_bytes(self.path, buf.getvalue())


class SpecTokenizer:
    def __init__(self, config: AudioTokensConfig, resident_frames=None):
        """``resident_frames``: optional ``(frames, {ytid: (offset, n)})``
        handoff from ``ClusterCreator.take_resident_frames()`` — the fused
        cluster feed's HBM-resident, L2-normalized (and conv-expanded)
        frame corpus.  Train-split clips covered by the manifest are then
        tokenized by one device-resident VQ assignment over the buffer —
        no re-decode, no waveform wire: the composed fused pipeline decodes
        the train audio ONCE (reference counterpart: the spectrogram .npy
        artifacts both stages re-read from disk, cluster_creator.py:83-102
        and spec_tokenizer.py:66-78)."""
        self.config = config
        self.resident = resident_frames
        distributed.maybe_initialize(config)
        set_seed(config.random_seed)
        self.source_path = Path(config.source_spec_path)
        self.dest_tokenized_path = Path(config.dest_tokenized_path)
        self.centroids = np.load(config.centroids_path).astype(np.float32)
        # local mesh: tokenization is embarrassingly parallel — each process
        # tokenizes its own file shard on its own devices, no collectives
        self.mesh = data_mesh(config, local=True)
        self.conv = make_conv_features(config)
        if self.conv is not None:
            conv_state = Path(config.centroids_path).with_suffix(".conv.npz")
            if conv_state.exists():
                self.conv.load_state_dict(dict(np.load(conv_state)))

    def run(self) -> Dict[str, dict]:
        if self.config.fused_pipeline:
            return self._run_fused()
        stats = {}
        for split in ["train", "validation"]:
            source_dir = self.source_path / split
            tokenized_dir = self.dest_tokenized_path / split
            if self.config.incremental:
                if distributed.is_coordinator():
                    tokenized_dir.mkdir(parents=True, exist_ok=True)
                distributed.barrier(f"tok-mkdir-{split}")
            else:  # reference semantics: destructive restart (once, proc 0)
                if distributed.is_coordinator():
                    shutil.rmtree(tokenized_dir, ignore_errors=True)
                    tokenized_dir.mkdir(parents=True)
                distributed.barrier(f"tok-wipe-{split}")
            logger.info("Tokenizing %s: %s --> %s", split, source_dir, tokenized_dir)
            ledger = self._make_ledger(split, tokenized_dir)
            with maybe_trace(self.config.profile_dir), \
                    StageTimer(f"tokenize/{split}") as timer:
                counts, fresh_frames = self.tokenize_directory(
                    source_dir, tokenized_dir, ledger)
                # only frames tokenized THIS run count toward the stage's
                # throughput; ledger catch-up bincounts are cheap host reads
                timer.count("frames", fresh_frames)
            distributed.barrier(f"tok-done-{split}")
            if split == "train":
                stats[split] = self._finish_train_stats(counts, ledger)
        return stats

    def _make_ledger(self, split: str, tokenized_dir: Path):
        """Ledger for the train split's whole-corpus statistics (prior counts
        only load on incremental runs; destructive runs rebuild and save)."""
        if split != "train":
            return None
        cent_mtime = Path(self.config.centroids_path).stat().st_mtime
        return _CountLedger(tokenized_dir, self.centroids.shape[0],
                            cent_mtime, load_prior=self.config.incremental)

    def _finish_train_stats(self, counts: np.ndarray, ledger) -> dict:
        """Global (cross-process) whole-corpus counts -> stats + plots +
        persisted ledger."""
        counts = distributed.all_sum_hosts(counts)  # new + caught-up, global
        counts = counts + ledger.prior
        if counts.sum() == 0:
            logger.info("no tokens on record; skipping statistics/plots")
            return {"total_tokens": 0, "unique_tokens": 0}
        stats = self.analyze_token_counts(counts)
        if distributed.is_coordinator():
            ledger.save(counts)
            self.plot_token_counts(counts)
        return stats

    def tokenize_directory(self, source_dir: Path, tokenized_dir: Path,
                           ledger=None):
        """Tokenize every spec file; returns (per-token counts (vocab,),
        frames tokenized this run) — O(vocab) host memory regardless of
        corpus size.  On incremental runs the counts include this shard's
        caught-up already-tokenized clips (see _CountLedger), so merged
        statistics stay whole-corpus; the frame count covers only freshly
        tokenized clips (the stage's actual throughput)."""
        counts = np.zeros(self.centroids.shape[0], np.int64)
        spec_files = distributed.process_shard(sorted(source_dir.glob("*.npy")))
        if self.config.incremental:
            before = len(spec_files)
            # an existing token file only counts if it was produced AFTER the
            # current centroids — otherwise it encodes a stale codebook
            cent_mtime = Path(self.config.centroids_path).stat().st_mtime
            skipped, todo = [], []
            for f in spec_files:
                tok = tokenized_dir / f.name
                if tok.exists() and tok.stat().st_mtime >= cent_mtime and (
                        ledger is not None or _token_file_ok(tok)):
                    skipped.append(f)
                else:
                    todo.append(f)
            spec_files = todo
            logger.info("incremental: %d/%d clips already tokenized",
                        before - len(spec_files), before)
            if ledger is not None:
                caught, failed = ledger.catchup_counts(
                    [f.stem for f in skipped])
                counts += caught
                if failed:  # unreadable token files: re-tokenize those clips
                    by_stem = {f.stem: f for f in skipped}
                    spec_files = spec_files + [by_stem[s] for s in failed]
        bs = self.config.tokenizer_batch_size
        fresh_frames = 0
        for i in range(0, len(spec_files), bs):
            batch_tokens = self.process_batch(spec_files[i : i + bs], tokenized_dir)
            counts += np.bincount(batch_tokens, minlength=len(counts))
            fresh_frames += len(batch_tokens)
        return counts, fresh_frames

    def process_batch(self, batch_files: List[Path], tokenized_dir: Path) -> np.ndarray:
        batch_specs = [np.load(f).T for f in batch_files]  # (T_i, n_mels) each
        frames = np.concatenate(batch_specs, axis=0).astype(np.float32)
        if self.conv is not None:
            frames = np.asarray(self.conv(frames))
        WIRE.h2d(frames)  # staged mode: mel frames up, tokens down
        tokens = vq_assign_fused(
            frames, self.centroids, mesh=self.mesh, normalize=True
        ).astype(np.int64)
        WIRE.d2h(tokens)

        start = 0
        for spec_file, spec in zip(batch_files, batch_specs):
            end = start + len(spec)
            atomic_save_npy(tokenized_dir / f"{spec_file.stem}.npy", tokens[start:end])
            start = end
        return tokens

    # ------------------------------------------------------------------
    # Fused mode: wav -> tokens on-device, no mel artifacts
    # ------------------------------------------------------------------
    def _run_fused(self) -> Dict[str, dict]:
        """Tokenize straight from audio (config.fused_pipeline=True).

        Same artifact/stat contract as the staged path; the compute is the
        flagship fused program (``tokenizer.FusedTokenizer``): framing + DFT
        + mel + dB + normalize + VQ argmin in one XLA/Pallas program per
        ``device_batch_size`` clips, megakernel-fused on TPU.
        """
        from audio_tokens_tpu.data import native_loader
        from audio_tokens_tpu.data.audio_io import decode_clip, find_audio_file
        from audio_tokens_tpu.tokenizer import FusedTokenizer

        cfg = self.config
        with open(cfg.split_file) as f:
            split_map = json.load(f)
        ft = FusedTokenizer(cfg, self.centroids, self.conv)
        use_native = cfg.audio_backend in ("auto", "native") and (
            native_loader.available()
        )
        stats: Dict[str, dict] = {}
        for split in ["train", "validation"]:
            tokenized_dir = self.dest_tokenized_path / split
            if cfg.incremental:
                if distributed.is_coordinator():
                    tokenized_dir.mkdir(parents=True, exist_ok=True)
                distributed.barrier(f"ftok-mkdir-{split}")
            else:
                if distributed.is_coordinator():
                    shutil.rmtree(tokenized_dir, ignore_errors=True)
                    tokenized_dir.mkdir(parents=True)
                distributed.barrier(f"ftok-wipe-{split}")
            # sorted like the staged glob, so batch composition matches;
            # each process takes its strided slice of the split
            ytids = distributed.process_shard(sorted(split_map[split]))
            ledger = self._make_ledger(split, tokenized_dir)
            # bounded stats accumulation (O(vocab), not O(corpus)): the train
            # split's reports only need per-token counts
            counts = np.zeros(self.centroids.shape[0], np.int64)
            if cfg.incremental:
                cent_mtime = Path(cfg.centroids_path).stat().st_mtime
                before = len(ytids)
                skipped, todo = [], []
                for y in ytids:
                    tok = tokenized_dir / f"{y}.npy"
                    if tok.exists() and tok.stat().st_mtime >= cent_mtime and (
                            ledger is not None or _token_file_ok(tok)):
                        skipped.append(y)
                    else:
                        todo.append(y)
                ytids = todo
                logger.info("incremental: %d/%d clips already tokenized",
                            before - len(ytids), before)
                if ledger is not None:
                    caught, failed = ledger.catchup_counts(skipped)
                    counts += caught
                    ytids = ytids + failed  # re-tokenize unreadable clips
            logger.info("Fused-tokenizing %s: audio --> %s", split, tokenized_dir)
            n_todo = len(ytids)
            resident_work = None
            resident_tokens: Dict[str, np.ndarray] = {}
            if self.resident is not None and split == "train":
                frames, manifest = self.resident
                covered = [y for y in ytids if y in manifest]
                if covered:
                    resident_work = (frames, manifest, covered)
                    ytids = [y for y in ytids if y not in manifest]
                # release the creator's reference; the HBM corpus now lives
                # until the assignment below completes
                self.resident = frames = None
            found = [(y, p) for y in ytids
                     if (p := find_audio_file(cfg, y)) is not None]
            n_frames_total = 0
            bs = cfg.device_batch_size
            with maybe_trace(cfg.profile_dir), \
                    StageTimer(f"tokenize-fused/{split}") as timer:
                if resident_work is not None:
                    # inside the timer/trace: the assignment is the dominant
                    # resident-path device cost and must show up in the
                    # stage's reported rate and profile (r4 review)
                    resident_tokens = self._assign_resident(*resident_work)
                    resident_work = None
                    logger.info(
                        "resident frames: %d clips tokenized with no "
                        "re-decode and no waveform wire",
                        len(resident_tokens))
                n_clips = 0
                for ytid, toks in resident_tokens.items():
                    atomic_save_npy(tokenized_dir / f"{ytid}.npy", toks)
                    counts += np.bincount(toks, minlength=len(counts))
                    n_frames_total += len(toks)
                    n_clips += 1
                for i in range(0, len(found), bs):
                    chunk = found[i : i + bs]
                    if use_native:
                        per_clip = self._fused_tokens_native(ft, chunk, bs)
                    else:
                        per_clip = self._fused_tokens_python(ft, chunk, decode_clip)
                    for ytid, toks in per_clip:
                        atomic_save_npy(tokenized_dir / f"{ytid}.npy", toks)
                        if split == "train":
                            counts += np.bincount(toks, minlength=len(counts))
                        n_frames_total += len(toks)
                        n_clips += 1
                timer.count("clips", n_clips)
                timer.count("frames", n_frames_total)
            distributed.barrier(f"ftok-done-{split}")
            logger.info("%s: %d/%d clips tokenized (fused)", split, n_clips,
                        n_todo)
            if split == "train":
                stats[split] = self._finish_train_stats(counts, ledger)
        return stats

    def _assign_resident(
        self, frames, manifest, covered: List[str]
    ) -> Dict[str, np.ndarray]:
        """Per-clip tokens straight from the HBM-resident frame corpus
        (rows are pre-normalized; ``frames`` may be a capacity buffer whose
        rows beyond the manifest ranges are junk — only covered ranges are
        read).  Full-coverage runs assign the whole buffer in blocked
        programs; sparse incremental reruns gather just the covered clips'
        row ranges first (r4 review: a few-clip rerun was assigning all
        15.5M corpus rows for a handful of token sequences)."""
        import jax.numpy as jnp

        spans = [(y, *manifest[y]) for y in covered]
        need = sum(n for _, _, n in spans)
        out: Dict[str, np.ndarray] = {}
        if need >= frames.shape[0] // 2:
            with WIRE.device():  # resident frames: assignment is device work
                all_tokens = np.asarray(vq_assign_fused(
                    frames, self.centroids, mesh=self.mesh, normalize=False,
                )).astype(np.int64)
            WIRE.d2h(all_tokens)
            for y, off, n in spans:
                out[y] = all_tokens[off:off + n]
            return out
        idx = np.concatenate(
            [np.arange(off, off + n, dtype=np.int32) for _, off, n in spans])
        sub = jnp.take(frames, jnp.asarray(idx), axis=0)
        with WIRE.device():
            toks = np.asarray(vq_assign_fused(
                sub, self.centroids, mesh=self.mesh, normalize=False,
            )).astype(np.int64)
        WIRE.d2h(toks)
        pos = 0
        for y, off, n in spans:
            out[y] = toks[pos:pos + n]
            pos += n
        return out

    def _fused_tokens_native(self, ft, chunk, bs):
        """C++ threaded decode into the device layout -> fused program."""
        from audio_tokens_tpu.data import native_loader
        from audio_tokens_tpu.ops.mel import num_frames

        cfg = self.config
        alloc = getattr(ft.frontend, "alloc_len", ft.frontend.padded_len)
        batch, lengths = native_loader.decode_batch(
            [p for _, p in chunk], cfg.common_sr, cfg.clip_samples,
            cfg.n_fft, n_threads=cfg.num_workers,
            row_len=alloc,  # >= clip+2*pad always (mel.py:158)
            dtype=np.int16 if cfg.pcm_wire == "i16" else np.float32,
        )  # decoded straight at megakernel stride: no host re-pad copy
        pad_rows = bs - len(chunk)
        if pad_rows:  # keep the compiled shape / engage the kernel
            batch = np.pad(batch, ((0, pad_rows), (0, 0)))
            lengths = np.concatenate(
                [lengths, np.full(pad_rows, -1, np.int32)]
            )
        import jax.numpy as jnp

        WIRE.h2d(batch)  # waveforms up, uint16/32 tokens down
        tokens = np.asarray(ft.tokens_from_padded(
            jnp.asarray(batch),
            jnp.asarray(np.maximum(lengths, 0)) if cfg.normalize else None,
        ))
        WIRE.d2h(tokens)
        out = []
        for row, (ytid, path) in enumerate(chunk):
            if lengths[row] < 0:
                logger.info("skipping %s: %s", path, native_loader.last_error())
                continue
            if not np.isfinite(batch[row]).all():
                # matches the staged pipeline's NaN/Inf screen (there a NaN
                # waveform surfaces as a NaN spectrogram and is dropped)
                logger.info("skipping %s: non-finite samples", path)
                continue
            n_valid = num_frames(int(lengths[row]), cfg.hop_length)
            out.append((ytid, tokens[row, :n_valid].astype(np.int64)))
        return out

    def _fused_tokens_python(self, ft, chunk, decode_clip):
        """Pure-python decode (thread pool) -> fused program."""
        cfg = self.config

        def decode_one(item):
            ytid, path = item
            wave = decode_clip(cfg, path)
            if wave is None:
                return None
            if not np.isfinite(wave).all():
                # same NaN/Inf screen as the staged pipeline and the fused
                # native path (there the screen runs on the decode batch)
                logger.info("skipping %s: non-finite samples", path)
                return None
            return (ytid, wave)

        with ThreadPoolExecutor(max_workers=cfg.num_workers) as pool:
            decoded = [d for d in pool.map(decode_one, chunk) if d is not None]
        if not decoded:
            return []
        token_lists = ft.tokenize_waveforms([w for _, w in decoded])
        return [(ytid, toks) for (ytid, _), toks in zip(decoded, token_lists)]

    # ------------------------------------------------------------------
    # Reporting (reference :129-240) — computed from per-token counts so
    # host memory stays O(vocab) at corpus scale
    # ------------------------------------------------------------------
    def analyze_token_counts(self, counts: np.ndarray) -> dict:
        present = np.flatnonzero(counts)
        most_tok = int(counts.argmax())
        least_tok = int(present[np.argmin(counts[present])]) if len(present) else None
        stats = {
            "total_tokens": int(counts.sum()),
            "unique_tokens": int(len(present)),
            "most_common": (most_tok, int(counts[most_tok])) if len(present) else None,
            "least_common": (least_tok, int(counts[least_tok]))
            if least_tok is not None else None,
        }
        logger.info("Total tokens: %d", stats["total_tokens"])
        logger.info("Unique tokens: %d", stats["unique_tokens"])
        logger.info("Most common token: %s", stats["most_common"])
        logger.info("Least common token: %s", stats["least_common"])
        zipf = self.analyze_zipf_and_tail(np.sort(counts[present])[::-1])
        stats.update(zipf)
        return stats

    def analyze_tokens(self, all_tokens: np.ndarray) -> dict:
        """Array-based convenience wrapper (small corpora / tests)."""
        return self.analyze_token_counts(
            np.bincount(np.asarray(all_tokens, np.int64),
                        minlength=self.centroids.shape[0])
        )

    @staticmethod
    def _zipf_fit(frequencies: np.ndarray):
        """Closed-form least squares of log-freq on log-rank over the 10-90%
        rank band (reference used scipy.linregress; same estimator).  The
        SINGLE fit implementation — the reported stats and the plotted line
        both come from here, so they cannot drift."""
        ranks = np.arange(1, len(frequencies) + 1)
        lo, hi = int(0.1 * len(frequencies)), int(0.9 * len(frequencies))
        lx = np.log(ranks[lo:hi])
        ly = np.log(np.asarray(frequencies[lo:hi], np.float64))
        vx = lx - lx.mean()
        slope = float((vx * (ly - ly.mean())).sum() / (vx * vx).sum())
        intercept = float(ly.mean() - slope * lx.mean())
        r = float(
            (vx * (ly - ly.mean())).sum()
            / np.sqrt((vx * vx).sum() * ((ly - ly.mean()) ** 2).sum())
        )
        return slope, intercept, r * r, lx

    def analyze_zipf_and_tail(self, frequencies: np.ndarray) -> dict:
        if len(frequencies) < 4:
            return {"zipf_slope": float("nan"), "tail_start": 0}
        slope, _, r2, _ = self._zipf_fit(frequencies)
        cum = np.cumsum(frequencies) / frequencies.sum()
        tail_start = int(np.searchsorted(cum, 0.8))
        logger.info("Zipf slope: %.2f (r^2=%.2f); 80%% of mass in top %d tokens",
                    slope, r2, tail_start)
        return {"zipf_slope": slope, "zipf_r2": r2, "tail_start": tail_start}

    def plot_token_counts(self, counts: np.ndarray) -> None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            freqs = np.sort(counts[counts > 0])[::-1]
            ranks = np.arange(1, len(freqs) + 1)
            fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(15, 10))
            ax1.plot(ranks, freqs)
            ax1.set_xscale("log")
            ax1.set_yscale("log")
            ax1.set_title("Distribution of Assigned Tokens (Sorted by Frequency)")
            ax2.bar(ranks[:100], freqs[:100])
            ax2.set_xlabel("Token Rank")
            out = Path(self.config.base_dir) / "output" / "token_distribution.png"
            out.parent.mkdir(parents=True, exist_ok=True)
            fig.tight_layout()
            fig.savefig(out)
            plt.close(fig)
            logger.info("Token distribution plot saved to %s", out)
        except Exception as e:
            logger.warning("token distribution plot failed: %s", e)
        self.plot_zipf(counts)

    def plot_zipf(self, counts: np.ndarray) -> None:
        """Dedicated Zipf figure: log-log rank/frequency scatter + the fitted
        power law over the 10-90% rank band (the reference emitted this as a
        separate plot — reference: processors/spec_tokenizer.py:211-224)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            freqs = np.sort(counts[counts > 0])[::-1].astype(np.float64)
            if len(freqs) < 4:
                return
            ranks = np.arange(1, len(freqs) + 1)
            slope, intercept, _, lx = self._zipf_fit(freqs)
            fig, ax = plt.subplots(figsize=(10, 6))
            ax.scatter(np.log(ranks), np.log(freqs), s=8, alpha=0.6,
                       label="observed")
            ax.plot(lx, slope * lx + intercept, "r-",
                    label=f"Zipf fit: slope={slope:.2f}")
            ax.set_xlabel("log rank")
            ax.set_ylabel("log frequency")
            ax.set_title("Zipf Analysis of Token Distribution")
            ax.legend()
            out = Path(self.config.base_dir) / "output" / "zipf_analysis.png"
            out.parent.mkdir(parents=True, exist_ok=True)
            fig.tight_layout()
            fig.savefig(out)
            plt.close(fig)
            logger.info("Zipf analysis plot saved to %s", out)
        except Exception as e:
            logger.warning("zipf plot failed: %s", e)


if __name__ == "__main__":
    SpecTokenizer(AudioTokensConfig.from_args()).run()
