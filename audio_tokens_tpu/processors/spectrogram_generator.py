"""Stage 1: audio files -> per-clip mel-spectrogram ``.npy`` artifacts.

Same artifact contract as the reference
(reference: processors/spectrogram_generator.py:39-61):
``{dest_spec_path}/{split}/{ytid}.npy`` each holding a float32
``(n_mels, frames)`` array; output dirs are wiped per run; missing or
undecodable clips are skipped with a log line; NaN/Inf spectrograms dropped.

TPU-native redesign: the reference loops clip-at-a-time through torchaudio on
the host/GPU (SURVEY.md §3.2 — its #1 bottleneck).  Here clips are decoded on
the host (thread pool), packed into fixed-shape device batches, and the whole
DFT+mel+dB frontend runs as one batched XLA program per ``device_batch_size``
clips; only valid frames are written back.
"""

from __future__ import annotations

import json
import logging
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.data import native_loader
from audio_tokens_tpu.data.audio_io import decode_clip, find_audio_file
from audio_tokens_tpu.ops.mel import MelFrontend, num_frames
from audio_tokens_tpu.parallel import distributed
from audio_tokens_tpu.utils.npy_io import atomic_save_npy
from audio_tokens_tpu.utils.profiling import WIRE, StageTimer, maybe_trace

logger = logging.getLogger(__name__)

# Waveform amplitude sanity bound for the decode-only feed (iter_wave_batches,
# consumed by the all-device cluster feed).  The staged paths screen the
# COMPUTED spectrogram for NaN/Inf, but the wave feed never materializes one
# on the host: a finite waveform with |s| ~ 1e17 overflows f32 in the
# in-program |spec|^2 (re^2 ~ (n_fft*|s|)^2 > 3.4e38) and a single such clip
# would write NaN rows into the HBM frame corpus, poisoning every centroid.
# Sane decoded audio is |s| <= ~1; overflow needs |s| > ~3e16 — 1e8 is far
# from both, so the screen drops exactly the clips the spec screen would.
AMPLITUDE_LIMIT = 1e8



class SpectrogramGenerator:
    def __init__(self, config: AudioTokensConfig):
        self.config = config
        distributed.maybe_initialize(config)
        self.frontend = MelFrontend(
            sample_rate=config.common_sr,
            n_mels=config.n_mels,
            n_fft=config.n_fft,
            hop_length=config.hop_length,
            clip_samples=config.clip_samples,
            normalize=config.normalize,
        )
        with open(config.split_file, "r") as f:
            self.data_split = json.load(f)
        self._decode_pool = ThreadPoolExecutor(max_workers=config.num_workers)
        self.use_native = config.audio_backend in ("auto", "native") and (
            native_loader.available()
        )
        if config.audio_backend == "native" and not self.use_native:
            raise RuntimeError(
                "audio_backend='native' but native/libaudiodec.so is not built "
                "(python native/build.py)"
            )
        logger.info("audio decode backend: %s",
                    "native C++" if self.use_native else "python")

    def _signature(self) -> dict:
        """Signal-chain signature persisted next to each split's artifacts.

        Every config field that changes the VALUES in a spectrogram ``.npy``
        (not just which clips render) is included; ``incremental=True`` runs
        re-render the whole split when the stored signature mismatches, so
        old-config and new-config spectrograms can never mix in one corpus.
        Mirrors the tokenizer's centroid-mtime staleness guard
        (spec_tokenizer.py) and the K-means checkpoint's stream signature
        (cluster_creator.py).  The reference had no incremental mode at all
        (destructive restart, reference spectrogram_generator.py:43-44).
        """
        cfg = self.config
        return {
            "common_sr": cfg.common_sr,
            "n_mels": cfg.n_mels,
            "n_fft": cfg.n_fft,
            "hop_length": cfg.hop_length,
            "normalize": bool(cfg.normalize),
            "clip_samples": cfg.clip_samples,
            "pcm_wire": cfg.pcm_wire,  # i16 wire quantizes decoded samples
        }

    SIGNATURE_NAME = "_signature.json"

    def _write_signature(self, output_dir: Path) -> None:
        tmp = output_dir / (self.SIGNATURE_NAME + ".tmp")
        tmp.write_text(json.dumps(self._signature(), sort_keys=True))
        tmp.replace(output_dir / self.SIGNATURE_NAME)

    def run(self) -> None:
        for split in ["train", "validation"]:
            logger.info("Creating %s spectrograms", split)
            output_dir = Path(self.config.dest_spec_path) / split
            ytids = self.data_split[split]
            if self.config.incremental:
                if distributed.is_coordinator():
                    output_dir.mkdir(parents=True, exist_ok=True)
                distributed.barrier(f"spec-mkdir-{split}")
                sig_path = output_dir / self.SIGNATURE_NAME
                try:
                    stored = json.loads(sig_path.read_text())
                except (FileNotFoundError, json.JSONDecodeError):
                    stored = None
                has_artifacts = any(output_dir.glob("*.npy"))
                if (stored == self._signature() or not has_artifacts
                        or stored is None):
                    # stored None + artifacts = a corpus rendered before the
                    # signature existed: adopt it under the current config
                    # (the pre-signature existence-only semantics) rather
                    # than wiping what may be TBs of decode work; only a
                    # RECORDED mismatching signature proves staleness
                    if distributed.is_coordinator() and stored != self._signature():
                        self._write_signature(output_dir)
                    before = len(ytids)
                    ytids = [y for y in ytids
                             if not (output_dir / f"{y}.npy").exists()]
                    logger.info("incremental: %d/%d clips already done",
                                before - len(ytids), before)
                else:
                    # every process reads the same file post-barrier, so the
                    # staleness decision is identical everywhere
                    logger.info(
                        "incremental: signal-chain signature changed "
                        "(%s -> %s); re-rendering the whole %s split",
                        stored, self._signature(), split)
                    if distributed.is_coordinator():
                        shutil.rmtree(output_dir, ignore_errors=True)
                        output_dir.mkdir(parents=True)
                        self._write_signature(output_dir)
                    distributed.barrier(f"spec-rerender-{split}")
            else:  # reference semantics: destructive restart (once, proc 0)
                if distributed.is_coordinator():
                    shutil.rmtree(output_dir, ignore_errors=True)
                    output_dir.mkdir(parents=True)
                    self._write_signature(output_dir)
                distributed.barrier(f"spec-wipe-{split}")
            # multi-host: each process renders its strided slice of the split
            # (same split file everywhere -> pure arithmetic, no coordination)
            local_ytids = distributed.process_shard(ytids)
            with maybe_trace(self.config.profile_dir), \
                    StageTimer(f"spectrograms/{split}") as timer:
                n_ok = self.populate_specs(local_ytids, output_dir)
                timer.count("clips", n_ok)
            distributed.barrier(f"spec-done-{split}")
            logger.info(
                "%s: %d/%d spectrograms saved to %s%s",
                split.capitalize(), n_ok, len(local_ytids), output_dir,
                f" (process {distributed.process_index()}'s shard of "
                f"{len(ytids)})" if distributed.is_multiprocess() else "",
            )

    # ------------------------------------------------------------------
    def populate_specs(self, ytids: List[str], output_dir: Path) -> int:
        """Decode (threaded) -> batch -> device frontend -> save. Returns count."""
        n_ok = 0
        for ytid, spec in self.iter_specs(ytids):
            atomic_save_npy(output_dir / f"{ytid}.npy", spec)
            n_ok += 1
        return n_ok

    def iter_specs(self, ytids: List[str]):
        """Yield (ytid, (n_mels, frames) float32 spec) without touching disk.

        Same values the staged pipeline writes to ``.npy`` (the frontend math
        is row-independent, so batch composition doesn't change a clip's
        spectrogram); skip-and-log semantics for missing/undecodable/NaN
        clips are identical.  Consumed by the save path above and by the
        fused pipeline's streaming cluster stage.
        """
        if self.use_native:
            yield from self._iter_specs_native(ytids)
            return
        bs = self.config.device_batch_size
        pending: List[Tuple[str, np.ndarray]] = []
        for ytid, wave in self._decoded_waves(ytids):
            pending.append((ytid, wave))
            if len(pending) == bs:
                yield from self._specs_for_batch(pending)
                pending = []
        if pending:
            yield from self._specs_for_batch(pending)

    def _decoded_waves(self, ytids: List[str]):
        """Threaded decode with bounded decode-ahead: yields (ytid, wave)
        for decodable, finite, sane-amplitude clips.

        Executor.map would submit every ytid up front, letting decoders run
        arbitrarily far ahead of the device-bound consumer and buffer the
        whole corpus's waveforms in completed futures (~GBs at real scale);
        a sliding window of in-flight futures keeps the threads busy with
        O(window) live waveforms instead.  One implementation shared by the
        python iter_specs and iter_wave_batches paths so the staged and
        fused feeds cannot drift (r4 review)."""
        from collections import deque

        window = max(2 * self.config.device_batch_size,
                     2 * self.config.num_workers)
        inflight: deque = deque()
        it = iter(ytids)
        while True:
            while len(inflight) < window:
                y = next(it, None)
                if y is None:
                    break
                inflight.append((y, self._decode_pool.submit(
                    self._decode_one, y)))
            if not inflight:
                break
            ytid, fut = inflight.popleft()
            wave = fut.result()
            if wave is None:
                continue
            amax = float(np.max(np.abs(wave))) if wave.size else 0.0
            if not np.isfinite(amax) or amax > AMPLITUDE_LIMIT:
                logger.info("skipping %s: non-finite or extreme samples "
                            "(max |s| = %.3g)", ytid, amax)
                continue
            yield ytid, wave

    def iter_wave_batches(self, ytids: List[str]):
        """Decode-only batches: (padded (B, L) waveforms, lengths (B,) int32,
        row_ytids list — None for padding rows).

        No DSP, no device involvement — the all-device fused cluster feed
        (cluster_creator._fused_frames_device) consumes these so waveforms
        are the ONLY host->device traffic of the whole feature chain; the
        row ytids let it record a per-clip frame manifest for the resident
        handoff to the tokenize stage.  Native backend: failed/non-finite
        rows carry length -1 and pcm_wire='i16' ships int16 PCM
        (decode_wire reconstructs in-program).  Python backend: failures
        and non-finite clips are dropped (same screens as iter_specs) and
        rows are float32.
        """
        cfg = self.config
        bs = cfg.device_batch_size
        if self.use_native:
            found = [(y, p) for y in ytids
                     if (p := self.find_audio_file(y)) is not None]
            dtype = np.int16 if cfg.pcm_wire == "i16" else np.float32
            for i in range(0, len(found), bs):
                chunk = found[i : i + bs]
                batch, lengths = native_loader.decode_batch(
                    [p for _, p in chunk], cfg.common_sr, cfg.clip_samples,
                    cfg.n_fft, n_threads=cfg.num_workers, dtype=dtype,
                )
                if dtype is np.float32:
                    # the staged paths screen the computed SPECTROGRAM for
                    # NaN/Inf; the wave feed never materializes one, so
                    # screen the waveform for non-finite AND extreme
                    # amplitude (which would overflow |spec|^2 in-program —
                    # see AMPLITUDE_LIMIT); int16 PCM is safe by construction
                    amax = np.abs(batch).max(axis=1)
                    for r in np.flatnonzero(
                            ~np.isfinite(amax) | (amax > AMPLITUDE_LIMIT)):
                        logger.info("skipping %s: non-finite or extreme "
                                    "samples", chunk[r][1])
                        lengths[r] = -1
                row_ytids = [y for y, _ in chunk] + [None] * (bs - len(chunk))
                if len(chunk) < bs:
                    batch = np.concatenate([batch, np.zeros(
                        (bs - len(chunk), batch.shape[1]), batch.dtype)])
                    lengths = np.concatenate(
                        [lengths, np.full(bs - len(chunk), -1, np.int32)])
                yield batch, lengths, row_ytids
            return
        waves: List[np.ndarray] = []
        wave_ytids: List[str] = []

        def flush(waves, wave_ytids):
            batch, lengths = self.frontend.prepare_batch(waves)
            row_ytids = wave_ytids + [None] * (bs - len(waves))
            if len(waves) < bs:
                batch = np.concatenate([batch, np.zeros(
                    (bs - len(waves), batch.shape[1]), np.float32)])
                lengths = np.concatenate(
                    [lengths, np.full(bs - len(waves), -1, np.int32)])
            return batch, lengths, row_ytids

        for y, wave in self._decoded_waves(ytids):
            waves.append(wave)
            wave_ytids.append(y)
            if len(waves) == bs:
                yield flush(waves, wave_ytids)
                waves, wave_ytids = [], []
        if waves:
            yield flush(waves, wave_ytids)

    def _iter_specs_native(self, ytids: List[str]):
        """C++ threaded decode straight into the device-ready padded layout."""
        cfg = self.config
        bs = cfg.device_batch_size
        found = [(y, p) for y in ytids if (p := self.find_audio_file(y)) is not None]
        for i in range(0, len(found), bs):
            chunk = found[i : i + bs]
            # pcm_wire='i16' ships int16 PCM here too (halves the staged
            # stage's wire); MelFrontend._spectrum decodes the wire, so the
            # staged artifacts and the fused feeds stay numerically
            # identical under the same config
            batch, lengths = native_loader.decode_batch(
                [p for _, p in chunk], cfg.common_sr, cfg.clip_samples,
                cfg.n_fft, n_threads=cfg.num_workers,
                dtype=np.int16 if cfg.pcm_wire == "i16" else np.float32,
            )
            if len(chunk) < bs:  # keep the compiled shape
                batch = np.concatenate(
                    [batch, np.zeros((bs - len(chunk), batch.shape[1]),
                                     batch.dtype)]
                )
                lengths = np.concatenate(
                    [lengths, np.full(bs - len(chunk), -1, np.int32)]
                )
            if batch.dtype == np.float32:
                # same amplitude screen as the wave feeds (_decoded_waves /
                # iter_wave_batches): a finite extreme-amplitude clip must
                # be dropped from the staged corpus too, or the staged and
                # fused pipelines would tokenize different clip sets
                # (int16 PCM is safe by construction)
                amax = np.abs(batch).max(axis=1)
                for r in np.flatnonzero(
                        (~np.isfinite(amax) | (amax > AMPLITUDE_LIMIT))
                        & (lengths >= 0)):
                    logger.info("skipping %s: non-finite or extreme "
                                "samples", chunk[r][1])
                    lengths[r] = -2  # distinct from decode failure (-1)
            ok_lengths = np.maximum(lengths, 0)
            if cfg.normalize:
                specs = np.asarray(self.frontend.normalized(batch, ok_lengths))
            else:
                specs = np.asarray(self.frontend(batch))
            WIRE.h2d(batch)   # wave batch up / mel batch down: the staged
            WIRE.d2h(specs)   # stage's wire (fused mode never pays the d2h)
            for row, (ytid, path) in enumerate(chunk):
                if lengths[row] == -2:  # amplitude screen, logged above
                    continue
                if lengths[row] < 0:
                    logger.info("skipping %s: %s", path, native_loader.last_error())
                    continue
                n_valid = num_frames(int(lengths[row]), cfg.hop_length)
                spec = specs[row, :, :n_valid]
                if not np.isfinite(spec).all():
                    logger.debug("Warning: NaN/Inf values found in spectrogram %s", ytid)
                    continue
                if cfg.normalize and spec.size and spec.min() == spec.max():
                    # degenerate min-max range (digital silence): the
                    # reference's normalize produced NaN here and its screen
                    # dropped the clip (spectrogram_generator.py:128-146);
                    # ours is NaN-free, so drop explicitly for corpus parity
                    logger.debug("skipping %s: constant spectrogram", ytid)
                    continue
                yield ytid, spec

    def _decode_one(self, ytid: str) -> Optional[np.ndarray]:
        path = self.find_audio_file(ytid)
        if path is None:
            return None
        return decode_clip(self.config, path)

    def find_audio_file(self, ytid: str) -> Optional[Path]:
        path = find_audio_file(self.config, ytid)
        if path is None:
            logger.debug("Audio file not found: %s", ytid)
        return path

    def _specs_for_batch(self, items: List[Tuple[str, np.ndarray]]):
        """One device program over a padded batch -> (ytid, trimmed spec)."""
        bs = self.config.device_batch_size
        waves = [w for _, w in items]
        batch, lengths = self.frontend.prepare_batch(waves)
        if len(items) < bs:  # pad to the static batch shape; extra rows ignored
            pad = np.zeros((bs - len(items), batch.shape[1]), np.float32)
            batch = np.concatenate([batch, pad], axis=0)
            lengths = np.concatenate([lengths, np.zeros(bs - len(items), np.int32)])
        if self.config.normalize:
            specs = np.asarray(self.frontend.normalized(batch, lengths))
        else:
            specs = np.asarray(self.frontend(batch))
        WIRE.h2d(batch)
        WIRE.d2h(specs)

        for i, (ytid, wave) in enumerate(items):
            n_valid = num_frames(min(len(wave), self.config.clip_samples),
                                 self.config.hop_length)
            spec = specs[i, :, :n_valid]
            if not np.isfinite(spec).all():
                logger.debug("Warning: NaN/Inf values found in spectrogram %s", ytid)
                continue
            if self.config.normalize and spec.size and spec.min() == spec.max():
                logger.debug("skipping %s: constant spectrogram", ytid)
                continue
            yield ytid, spec


if __name__ == "__main__":
    SpectrogramGenerator(AudioTokensConfig.from_args()).run()
