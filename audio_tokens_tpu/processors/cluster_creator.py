"""Stage 2: cluster training-set STFT frames into a centroid vocabulary.

Same artifact contract as the reference
(reference: processors/cluster_creator.py:36-62): reads
``{source_spec_path}/train/*.npy``, produces L2-normalized
``centroids.npy`` of shape ``(vocab_size, feature_dim)`` plus a 2-D PCA
scatter plot at ``output/centroids_visualization.png``.

Replaces FAISS ``Kmeans`` with the mesh-sharded MXU Lloyd loop in
``ops/kmeans.py``.  Two modes (``config.kmeans_mode``):

  * ``batch_warm_start`` — the reference's exact schedule: each
    ``clustering_batch_size``-file frame batch re-trains ``niter`` Lloyd
    iterations seeded from the previous batch's centroids
    (reference :49-56 / SURVEY.md §2.7.4);
  * ``full`` — one Lloyd fit over the whole corpus (statistically sounder;
    the recommended TPU mode since the sharded loop makes it cheap).

File order is sorted (the reference used unsorted ``glob`` order, which is
filesystem-dependent — sorting makes the batch schedule reproducible).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.ops.conv_features import ConvFeatures
from audio_tokens_tpu.ops.kmeans import (
    KMeans,
    kmeans_fit,
    kmeans_fit_streaming,
    kmeans_plusplus_init,
    precision_from_str,
)
from audio_tokens_tpu.ops.vq import l2_normalize
from audio_tokens_tpu.parallel import distributed
from audio_tokens_tpu.parallel.mesh import data_mesh
from audio_tokens_tpu.utils.profiling import WIRE
from audio_tokens_tpu.utils.seeding import key_for, set_seed

logger = logging.getLogger(__name__)

CONV_STAGE_NAME = "conv_features"  # shared by cluster + tokenize stages


def make_conv_features(config: AudioTokensConfig) -> Optional[ConvFeatures]:
    """The conv front-end shared between stages 2 and 3 (fixes SURVEY §2.7.3)."""
    if not config.use_convolution:
        return None
    return ConvFeatures(
        config.num_kernels,
        config.kernel_size,
        key_for(config.random_seed, CONV_STAGE_NAME),
    )


class ClusterCreator:
    def __init__(self, config: AudioTokensConfig):
        self.config = config
        distributed.maybe_initialize(config)
        set_seed(config.random_seed)
        self.conv = make_conv_features(config)
        self.mesh = data_mesh(config)  # global: the Lloyd psum spans processes
        if distributed.is_multiprocess() and config.kmeans_mode != "full":
            raise ValueError(
                "multi-host clustering requires kmeans_mode='full' (the "
                "streaming Lloyd loop psums per-process shards); the "
                "reference's batch_warm_start schedule is inherently "
                "sequential and single-host"
            )

    def run(self) -> np.ndarray:
        logger.info("starting clustering (mode=%s)", self.config.kmeans_mode)
        # which route the fit actually took (tools report wire economics
        # from this instead of re-deriving the predicate — r4 review)
        self.used_device_feed = False
        if self.config.kmeans_mode == "full":
            if self._use_fused_device_feed():
                self.used_device_feed = True
                # all-device feature chain: waveforms are the only
                # host->device traffic; frames land directly in HBM and
                # kmeans_fit consumes them device-resident.  Applies to any
                # corpus whose frames fit kmeans_hbm_cache_mb — including
                # ones beyond the HOST in-memory budget that would otherwise
                # stream (the balanced-AudioSet frame corpus is ~9.8 GB,
                # inside one v5e's HBM)
                frames, n_valid = self._fused_frames_device()
                with WIRE.device():  # frames resident: the fit is device work
                    centroids, obj = kmeans_fit(
                        frames,
                        self.config.vocab_size,
                        self.config.niter,
                        seed=self.config.random_seed,
                        mesh=self.mesh,
                        max_points_per_centroid=self.config.max_points_per_centroid,
                        init=self.config.kmeans_init,
                        empty_policy=self.config.kmeans_empty_policy,
                        precision=precision_from_str(
                            self.config.kmeans_precision),
                        n_valid=n_valid,
                    )
                logger.info("full kmeans over %d frames: obj=%.2f",
                            n_valid, obj)
            elif self._should_stream() or distributed.is_multiprocess():
                if self.config.max_points_per_centroid is not None:
                    logger.warning(
                        "kmeans streaming uses every frame: "
                        "max_points_per_centroid=%d is ignored in the "
                        "streaming path",
                        self.config.max_points_per_centroid,
                    )
                wire = self.config.kmeans_wire
                if wire == "bf16":
                    import ml_dtypes

                    wire_dtype = ml_dtypes.bfloat16
                elif wire == "f32":
                    wire_dtype = np.float32
                else:
                    raise ValueError(
                        f"kmeans_wire must be 'f32' or 'bf16', got '{wire}'")
                start_iter, init_c = self._load_kmeans_checkpoint()
                if init_c is None:
                    init_c = self._global_init_centroids()
                if start_iter >= self.config.niter:
                    # the fit finished but the run died before saving
                    # centroids.npy — the checkpoint IS the result
                    logger.info(
                        "streaming kmeans checkpoint already complete "
                        "(%d iterations); skipping the fit", start_iter)
                    centroids = init_c
                else:
                    centroids, obj, n = kmeans_fit_streaming(
                        lambda: self._batch_generator(
                            self.config.clustering_batch_size
                        ),
                        self.config.vocab_size,
                        self.config.niter,
                        d=self.feature_dim,
                        seed=self.config.random_seed,
                        init_centroids=init_c,
                        start_iter=start_iter,
                        checkpoint_fn=self._save_kmeans_checkpoint,
                        mesh=self.mesh,
                        superbatch_rows=self.config.kmeans_superbatch_rows,
                        init=self.config.kmeans_init,
                        empty_policy=self.config.kmeans_empty_policy,
                        precision=precision_from_str(
                            self.config.kmeans_precision),
                        cache_mb=self.config.kmeans_stream_cache_mb,
                        cache_spill_path=(
                            Path(self.config.base_dir) / "output" /
                            "kmeans_stream_spill"
                            f".p{distributed.process_index()}.bin"
                            if self.config.kmeans_stream_spill_mb > 0
                            else None),
                        cache_spill_mb=self.config.kmeans_stream_spill_mb,
                        hbm_cache_mb=self.config.kmeans_hbm_cache_mb,
                        wire_dtype=wire_dtype,
                    )
                    logger.info("streaming kmeans over %d frames: obj=%.2f",
                                n, obj)
            else:
                batches = list(
                    self._batch_generator(self.config.clustering_batch_size)
                )
                frames = np.concatenate(batches, axis=0)
                # present the fit with the SAME capacity-buffer layout the
                # all-device feed uses (chunk-aligned capacity + n_valid)
                # whenever that layout fits BOTH budgets: the scan chunking
                # — and therefore the f32 summation association — is a
                # function of the buffer shape, so this keeps staged and
                # fused centroids BIT-identical (tested).  The pad is
                # host-side zeros; masked rows contribute exact zeros.
                # Skipped when kmeans_fit would subsample anyway (the
                # gather discards the layout, and its indices depend only
                # on n_valid — identity holds pad or no pad) and when the
                # capacity rows exceed the HOST in-memory budget that
                # routed us here (short-clip corpora: actual frames can be
                # far below the every-clip-at-frames_max capacity estimate,
                # and a capacity-sized zero pad would defeat that budget).
                n_valid = frames.shape[0]
                cap = self._feed_capacity_rows(self._n_train_clips())
                cap_pts = self.config.max_points_per_centroid
                will_subsample = (
                    cap_pts is not None
                    and n_valid > self.config.vocab_size * cap_pts)
                cap_bytes = cap * self.feature_dim * 4
                budget = (1 << 20) * min(
                    self.config.kmeans_hbm_cache_mb,
                    self.config.kmeans_inmemory_budget_mb)
                if cap >= n_valid and cap_bytes <= budget and not will_subsample:
                    frames = np.concatenate(
                        [frames, np.zeros((cap - n_valid, self.feature_dim),
                                          np.float32)])
                else:
                    n_valid = None
                centroids, obj = kmeans_fit(
                    frames,
                    self.config.vocab_size,
                    self.config.niter,
                    seed=self.config.random_seed,
                    mesh=self.mesh,
                    max_points_per_centroid=self.config.max_points_per_centroid,
                    init=self.config.kmeans_init,
                    empty_policy=self.config.kmeans_empty_policy,
                    precision=precision_from_str(self.config.kmeans_precision),
                    n_valid=n_valid,
                )
                logger.info("full kmeans over %d frames: obj=%.2f",
                            n_valid if n_valid is not None else len(frames),
                            obj)
        else:  # batch_warm_start (reference schedule)
            km = KMeans(
                self.feature_dim,
                self.config.vocab_size,
                niter=self.config.niter,
                seed=self.config.random_seed,
                mesh=self.mesh,
                max_points_per_centroid=self.config.max_points_per_centroid,
                init=self.config.kmeans_init,
                empty_policy=self.config.kmeans_empty_policy,
                precision=precision_from_str(self.config.kmeans_precision),
            )
            for i, batch in enumerate(
                self._batch_generator(self.config.clustering_batch_size)
            ):
                if i == 0:
                    km.train(batch)
                else:
                    km.train(batch, init_centroids=km.centroids)
            centroids = km.centroids
            if centroids is None:
                raise RuntimeError("no training spectrograms found")

        centroids = np.asarray(l2_normalize(centroids))
        logger.info("Centroids shape: %s", centroids.shape)
        if distributed.is_coordinator():  # single-writer artifacts
            out_path = Path(self.config.centroids_path)
            out_path.parent.mkdir(parents=True, exist_ok=True)
            np.save(out_path, centroids)
            if self.conv is not None:
                np.savez(out_path.with_suffix(".conv.npz"),
                         **self.conv.state_dict())
            # the durable artifact exists; the in-progress fit checkpoint
            # has served its purpose
            self._kmeans_ckpt_path().unlink(missing_ok=True)
            self.visualize_centroids(centroids)
        # every process must see centroids.npy before the tokenizer stage
        distributed.barrier("centroids-saved")
        return centroids

    @property
    def feature_dim(self) -> int:
        return self.config.feature_dim

    # -- mid-fit checkpoint/resume (streaming mode) ----------------------
    # At corpus scale the streaming fit is the pipeline's longest stage
    # (BASELINE.md 2M-clip projection); a killed run used to restart from
    # iteration 0.  The per-iteration centroid update is the only
    # cross-iteration state, so one small npz per iteration makes the stage
    # resumable to the exact iteration (bit-identical trajectory — the
    # stream is deterministic by contract).

    def _kmeans_ckpt_path(self) -> Path:
        return Path(self.config.centroids_path).with_suffix(".kmeans_ckpt.npz")

    def _stream_signature(self) -> str:
        """Everything that shapes the Lloyd trajectory: a checkpoint from a
        different corpus/config must not be resumed.  Cached after the first
        call — the per-iteration checkpoint writer would otherwise re-glob
        the whole train spec directory (seconds at 2M files) for a value
        that cannot change mid-fit."""
        cached = getattr(self, "_stream_sig_cache", None)
        if cached is not None:
            return cached
        import json as _json

        cfg = self.config
        if cfg.fused_pipeline:
            n_src = self._n_train_clips()
        else:
            spec_dir = Path(cfg.source_spec_path) / "train"
            n_src = len(list(spec_dir.glob("*.npy")))
        self._stream_sig_cache = _json.dumps([
            cfg.vocab_size, self.feature_dim, cfg.niter, cfg.random_seed,
            cfg.kmeans_init, cfg.kmeans_empty_policy, cfg.kmeans_precision,
            cfg.kmeans_wire, cfg.clustering_batch_size,
            cfg.kmeans_superbatch_rows, int(n_src),
        ])
        return self._stream_sig_cache

    def _save_kmeans_checkpoint(self, completed: int, centroids: np.ndarray,
                                obj: float) -> None:
        if not distributed.is_coordinator():
            return
        import io

        from audio_tokens_tpu.utils.npy_io import atomic_save_bytes

        buf = io.BytesIO()
        np.savez(buf, centroids=np.asarray(centroids, np.float32),
                 iter=np.int64(completed), obj=np.float64(obj),
                 signature=np.str_(self._stream_signature()))
        atomic_save_bytes(self._kmeans_ckpt_path(), buf.getvalue())

    def _load_kmeans_checkpoint(self):
        """(start_iter, init_centroids) — (0, None) unless ``incremental``
        finds a resumable in-progress fit for this exact stream.

        Multi-host: every process must enter the streaming fit with the SAME
        start_iter/centroids or the per-iteration psum collectives mismatch
        and the job hangs.  Only the coordinator writes the checkpoint, so on
        a non-shared filesystem other processes won't see it; the local load
        is therefore reconciled across processes (allgather of
        iter + centroid checksum) and any disagreement restarts everyone
        from iteration 0."""
        start, c = self._load_kmeans_checkpoint_local()
        if not distributed.is_multiprocess():
            return start, c
        import zlib

        from jax.experimental import multihost_utils

        crc = 0 if c is None else zlib.crc32(np.ascontiguousarray(c).tobytes())
        gathered = np.asarray(multihost_utils.process_allgather(
            np.array([start, crc], np.int64)))
        if not (gathered == gathered[0]).all():
            if start:
                logger.info(
                    "kmeans checkpoint not visible/identical on every "
                    "process; restarting the fit from iteration 0")
            return 0, None
        return start, c

    def _load_kmeans_checkpoint_local(self):
        path = self._kmeans_ckpt_path()
        if not path.exists():
            return 0, None
        if not self.config.incremental:
            if distributed.is_coordinator():
                path.unlink(missing_ok=True)  # destructive-restart semantics
            return 0, None
        try:
            z = np.load(path, allow_pickle=False)
            if str(z["signature"]) != self._stream_signature():
                logger.info("kmeans checkpoint ignored: stream/config changed")
                return 0, None
            completed = int(z["iter"])
            c = np.asarray(z["centroids"], np.float32)
            if c.shape != (self.config.vocab_size, self.feature_dim):
                return 0, None
            logger.info(
                "resuming streaming kmeans from checkpoint: %d/%d "
                "iterations already done", completed, self.config.niter)
            return completed, c
        except Exception as e:
            logger.warning("kmeans checkpoint unreadable (%s); restarting", e)
            return 0, None

    def _use_fused_device_feed(self) -> bool:
        """Whether the full-mode fit can take the all-device fused feed
        (``_fused_frames_device``): fused pipeline, single-process, no
        min-max normalize (its degenerate-clip screen is host-side), and the
        whole frame corpus fits the ``kmeans_hbm_cache_mb`` device budget —
        the budget covers the corpus buffer, which is the PEAK residency:
        the buffer is chunk-aligned so ``kmeans_fit(..., n_valid=...)``
        consumes it with no slice/pad copy, and the Lloyd working set adds
        only centroid-sized state on top.

        ``kmeans_streaming='always'`` is an explicit user bound on device
        memory and wins over this routing.  Note on ``pcm_wire='i16'``:
        the wire format applies to every device-bound waveform path
        (this feed, the streaming feed's decode, and the fused tokenizer
        alike), so routing between them never changes numerics; int16
        round-trip is bit-exact for 16-bit sources (all of AudioSet)."""
        cfg = self.config
        if (not cfg.fused_pipeline or cfg.normalize
                or cfg.kmeans_streaming == "always"
                or distributed.is_multiprocess()):
            return False
        budget = cfg.kmeans_hbm_cache_mb * (1 << 20)
        if budget <= 0:
            return False
        est = (self._feed_capacity_rows(self._n_train_clips())
               * self.feature_dim * 4)
        if est > budget:
            logger.info(
                "fused device feed declined: ~%.1f GB of frames exceeds "
                "kmeans_hbm_cache_mb=%d -> streaming",
                est / 2**30, cfg.kmeans_hbm_cache_mb)
            return False
        return True

    def _n_train_clips(self) -> int:
        """Train-split clip count — sizes the fused feed's capacity buffer
        and the staged fit's matching capacity pad (bit-identity contract)."""
        import json as _json

        with open(self.config.split_file) as f:
            return len(_json.load(f)["train"])

    def _feed_capacity_rows(self, n_clips: int) -> int:
        """HBM rows the fused device feed allocates for ``n_clips``: every
        clip at max frames, one batch of update slack, rounded up to a whole
        number of kmeans scan chunks across the mesh so ``kmeans_fit``
        consumes the buffer with NO slice or pad copy (the buffer IS the
        peak residency — r4 review found the old slice+pad path peaked at
        ~2x the corpus)."""
        from audio_tokens_tpu.ops.kmeans import DEFAULT_CHUNK

        cfg = self.config
        frames_max = 1 + cfg.clip_samples // cfg.hop_length
        rows = (n_clips + cfg.device_batch_size) * frames_max
        n_dev = (int(np.prod([self.mesh.shape[a]
                              for a in self.mesh.axis_names]))
                 if self.mesh else 1)
        unit = DEFAULT_CHUNK * n_dev
        return -(-rows // unit) * unit

    def _should_stream(self) -> bool:
        """Whether full-mode k-means must stream super-batches (bounded host
        memory) instead of concatenating every frame in RAM."""
        mode = self.config.kmeans_streaming
        if mode in ("always", "never"):
            return mode == "always"
        if mode != "auto":
            raise ValueError(f"unknown kmeans_streaming '{mode}'")
        budget = self.config.kmeans_inmemory_budget_mb * (1 << 20)
        expansion = (self.config.num_kernels
                     if self.config.use_convolution else 1)
        if self.config.max_points_per_centroid is not None:
            # the in-memory fit subsamples to k*cap points BEFORE clustering,
            # so only the subsample needs to fit the budget
            cap_bytes = (self.config.vocab_size
                         * self.config.max_points_per_centroid
                         * self.feature_dim * 4)
            if cap_bytes <= budget:
                return False
        if self.config.fused_pipeline:
            frames_max = 1 + self.config.clip_samples // self.config.hop_length
            est = (self._n_train_clips() * frames_max * self.config.n_mels
                   * expansion * 4)
        else:
            spec_dir = Path(self.config.source_spec_path) / "train"
            est = sum(f.stat().st_size for f in spec_dir.glob("*.npy"))
            est *= expansion
        if est > budget:
            logger.info(
                "full kmeans: ~%.1f GB of frames exceeds the %.1f GB in-memory "
                "budget -> streaming super-batches",
                est / 2**30, budget / 2**30,
            )
            return True
        return False

    def _global_init_centroids(self) -> np.ndarray:
        """Topology-invariant init for the streaming fit.

        ``kmeans_fit_streaming``'s fallback init draws from process 0's
        first LOCAL super-batch, whose contents depend on how the corpus is
        sharded — so a 1-process and an N-process fit of the SAME corpus
        would start from different centroids and follow entirely different
        Lloyd trajectories (the composed-pipeline rehearsal caught this:
        57% of centroid elements diverged).  Here the seeded sample is
        drawn from the GLOBAL sorted train clip list, which is identical
        for every process count, so the init — and therefore the whole
        trajectory — depends only on (corpus, config), not topology.
        The coordinator computes and ``all_sum_hosts`` broadcasts, so
        device-side draws (kmeans++) cannot diverge across hosts.
        """
        cfg = self.config
        k = cfg.vocab_size
        if distributed.is_coordinator():
            sample = self._global_init_sample()
            if sample.shape[0] < k:
                raise ValueError(
                    f"init sample has {sample.shape[0]} frames < k={k}")
            if cfg.kmeans_init == "kmeans++":
                c0 = np.asarray(kmeans_plusplus_init(
                    sample, k, seed=cfg.random_seed))
            elif cfg.kmeans_init == "random":
                rng = np.random.default_rng(cfg.random_seed)
                c0 = sample[rng.choice(
                    sample.shape[0], size=k, replace=False)]
            else:
                raise ValueError(
                    f"unknown kmeans_init '{cfg.kmeans_init}'")
            c0 = np.ascontiguousarray(c0, np.float32)
        else:
            c0 = np.zeros((k, self.feature_dim), np.float32)
        if distributed.is_multiprocess():
            c0 = np.asarray(distributed.all_sum_hosts(c0), np.float32)
        return c0

    def _global_init_sample(self) -> np.ndarray:
        """Frames from a seeded subset of the GLOBAL train clip list, through
        the same spec->conv->L2 chain the feeds use (reference frame
        pipeline, cluster_creator.py:83-102 there)."""
        cfg = self.config
        rng = np.random.default_rng(cfg.random_seed)
        # enough clips for a k-sized draw (kmeans++ benefits from slack)
        target = max(4 * cfg.vocab_size, 2048)
        n_pick = min(-(-target // max(1, cfg.frames_per_clip)) + 2, 10_000)
        if cfg.fused_pipeline:
            from audio_tokens_tpu.processors.spectrogram_generator import (
                SpectrogramGenerator,
            )

            gen = getattr(self, "_fused_gen", None)
            if gen is None:
                gen = self._fused_gen = SpectrogramGenerator(cfg)
            clips = sorted(gen.data_split["train"])
            n_pick = min(n_pick, len(clips))
            chosen = [clips[i] for i in sorted(
                rng.choice(len(clips), size=n_pick, replace=False))]
            specs = [spec for _, spec in gen.iter_specs(chosen)]
        else:
            spec_dir = Path(cfg.source_spec_path) / "train"
            files = sorted(spec_dir.glob("*.npy"))
            if not files:
                raise FileNotFoundError(f"no spectrograms under {spec_dir}")
            n_pick = min(n_pick, len(files))
            chosen = [files[i] for i in sorted(
                rng.choice(len(files), size=n_pick, replace=False))]
            specs = [np.load(f) for f in chosen]
        frames = np.concatenate(
            [s.T for s in specs], axis=0).astype(np.float32)
        if self.conv is not None:
            frames = np.asarray(self.conv(frames))
        return np.asarray(l2_normalize(frames))

    def _batch_generator(self, batch_size: int) -> Iterator[np.ndarray]:
        """Yield (frames, feature_dim) float32 matrices, L2-normalized, per
        file-batch — the reference's frame pipeline (:83-102) with the conv
        + normalize applied on device.

        ``config.fused_pipeline=True`` streams the same frames from audio via
        the device mel frontend instead of reading ``.npy`` artifacts; the
        clip order (sorted ytids) and batch grouping match the staged glob,
        and the frontend math is row-independent, so the Lloyd trajectory is
        identical."""
        if self.config.fused_pipeline:
            yield from self._fused_batch_generator(batch_size)
            return
        spec_dir = Path(self.config.source_spec_path) / "train"
        files = sorted(spec_dir.glob("*.npy"))
        if not files:
            raise FileNotFoundError(f"no spectrograms under {spec_dir}")
        # multi-host: each process streams its strided shard; the streaming
        # Lloyd loop psums the per-process statistics
        files = distributed.process_shard(files)
        for i in range(0, len(files), batch_size):
            batch_data = [np.load(f).T for f in files[i : i + batch_size]]
            frames = np.concatenate(batch_data, axis=0).astype(np.float32)
            if self.conv is not None:
                frames = np.asarray(self.conv(frames))
            yield np.asarray(l2_normalize(frames))

    def _fused_frames_device(self):
        """In-memory fused feed with NO spec/frame host round-trips.

        The host-mediated fused generator crosses the link four times per
        batch (waves up, specs down, frames up for conv/normalize, result
        down) and kmeans_fit ships the corpus up once more — ~5x the
        corpus bytes.  Here mel + conv + L2-normalize + valid-row
        compaction run in ONE jitted program per decode batch that writes
        straight into a preallocated HBM buffer (donated, updated in
        place), so waveforms (optionally int16 PCM, config ``pcm_wire``)
        are the only host->device traffic and ``kmeans_fit`` consumes the
        buffer device-resident.  Rows are bit-identical to the host path
        (mel/conv/normalize are row-independent; compaction preserves clip
        and frame order).  Gated by ``_use_fused_device_feed`` (fused
        single-process, ``normalize=False`` — the min-max screen drops
        degenerate clips host-side — and frames within the
        ``kmeans_hbm_cache_mb`` device budget); the routing in ``run()``
        falls back to the host generator / streaming loop otherwise.
        Measured on the 10k-clip rehearsal corpus (15.5M frames): the
        clustering stage ran in 111 s on this sandbox's tunneled link —
        the in-memory-fit rerun with the host-mediated generator took
        1,068 s (see BASELINE.md)."""
        import functools

        import jax
        import jax.numpy as jnp

        from audio_tokens_tpu.ops.mel import num_frames
        from audio_tokens_tpu.processors.spectrogram_generator import (
            SpectrogramGenerator,
        )

        cfg = self.config
        gen = getattr(self, "_fused_gen", None)
        if gen is None:
            gen = self._fused_gen = SpectrogramGenerator(cfg)
        ytids = distributed.process_shard(sorted(gen.data_split["train"]))
        fe = gen.frontend
        bs, t_max, m = cfg.device_batch_size, fe.frames_max, cfg.n_mels
        # chunk-aligned capacity: kmeans_fit(n_valid=...) consumes the
        # buffer with no slice/pad copy, so this allocation IS the fit's
        # peak HBM residency (plus centroid-sized state)
        cap = self._feed_capacity_rows(len(ytids))
        buffer = jnp.zeros((cap, self.feature_dim), jnp.float32)
        conv = self.conv

        @functools.partial(jax.jit, donate_argnums=(0,))
        def accum(buf, batch, idx, offset):
            mel = fe.mel_frames(batch)  # (B, T, M); decodes the PCM wire
            fr = mel.reshape(bs * t_max, m)
            if conv is not None:
                fr = conv(fr)
            fr = l2_normalize(fr)
            fr = jnp.take(fr, idx, axis=0)                # valid-row prefix
            return jax.lax.dynamic_update_slice(buf, fr, (offset, 0))

        offset = 0
        manifest: dict = {}
        arange = np.arange(t_max, dtype=np.int32)
        for batch, lengths, row_ytids in gen.iter_wave_batches(ytids):
            idx = np.zeros(bs * t_max, np.int32)
            fill = 0
            for c, ln in enumerate(np.asarray(lengths)):
                if ln < 0:
                    continue
                nv = num_frames(min(int(ln), cfg.clip_samples),
                                cfg.hop_length)
                idx[fill:fill + nv] = c * t_max + arange[:nv]
                manifest[row_ytids[c]] = (offset + fill, nv)
                fill += nv
            WIRE.h2d(batch, idx)  # waveforms: the feed's only wire traffic
            buffer = accum(buffer, jnp.asarray(batch), jnp.asarray(idx),
                           jnp.int32(offset))
            offset += fill
        if offset == 0:
            raise FileNotFoundError(
                "fused cluster feed found no decodable training audio")
        # resident handoff: the tokenize stage can assign train-split tokens
        # straight from these frames — the composed pipeline then decodes
        # the train audio ONCE (see SpecTokenizer resident_frames).  The
        # FULL capacity buffer is handed around (never sliced — a device
        # slice would copy the corpus); rows >= offset are masked by
        # consumers via n_valid / the manifest ranges.
        self.resident_frames = buffer
        self.resident_manifest = manifest
        return buffer, offset

    def take_resident_frames(self):
        """(frames, {ytid: (offset, n_frames)}) from the fused device feed,
        or None if the fit didn't take it.  The caller owns the HBM buffer
        after this (the creator drops its reference so the memory's
        lifetime follows the tokenize stage)."""
        frames = getattr(self, "resident_frames", None)
        if frames is None:
            return None
        manifest = self.resident_manifest
        self.resident_frames = self.resident_manifest = None
        return frames, manifest

    def _fused_batch_generator(self, batch_size: int) -> Iterator[np.ndarray]:
        from audio_tokens_tpu.processors.spectrogram_generator import (
            SpectrogramGenerator,
        )

        # one generator for the whole fit: kmeans_fit_streaming calls
        # batches_fn once per Lloyd iteration, and each SpectrogramGenerator
        # owns a decode thread pool — constructing one per iteration strands
        # niter * num_workers idle threads
        gen = getattr(self, "_fused_gen", None)
        if gen is None:
            gen = self._fused_gen = SpectrogramGenerator(self.config)
        ytids = distributed.process_shard(sorted(gen.data_split["train"]))

        def finish(specs):
            frames = np.concatenate(
                [s.T for s in specs], axis=0
            ).astype(np.float32)
            if self.conv is not None:
                frames = np.asarray(self.conv(frames))
            return np.asarray(l2_normalize(frames))

        buf: list = []
        produced = False
        for _, spec in gen.iter_specs(ytids):
            buf.append(spec)
            if len(buf) == batch_size:
                produced = True
                yield finish(buf)
                buf = []
        if buf:
            produced = True
            yield finish(buf)
        if not produced and not distributed.is_multiprocess():
            # multi-process: an empty LOCAL shard is legal (tiny corpus, many
            # hosts); the streaming loop's global point count catches a truly
            # empty corpus without breaking the lock-step protocol
            raise FileNotFoundError(
                f"no decodable training audio under {self.config.audio_source_path}"
            )

    def evaluate_clustering(self, data: np.ndarray, labels: np.ndarray,
                            sample_size: int = 10000,
                            seed: int = 0) -> float:
        """Mean silhouette score on a sample (reference :115-117 — sklearn
        ``silhouette_score(sample_size=10000)``; that helper was dead code
        there, working here).  Pure numpy: for each sampled point, a = mean
        distance to co-cluster points, b = min over other clusters of mean
        distance; s = (b - a) / max(a, b)."""
        data = np.asarray(data, np.float32)
        labels = np.asarray(labels)
        if len(data) > sample_size:
            sel = np.random.default_rng(seed).choice(
                len(data), sample_size, replace=False)
            data, labels = data[sel], labels[sel]
        uniq = np.unique(labels)
        if len(uniq) < 2:
            # sklearn raises here too: a single-cluster assignment has no
            # silhouette; a silent 0.0 would read as a legitimate mid score
            raise ValueError(
                "silhouette requires >= 2 clusters in the (sampled) labels"
            )
        # pairwise distances on the sample (sample_size^2 floats, ~400 MB max)
        sq = (data * data).sum(1)
        d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (data @ data.T), 0.0)
        dist = np.sqrt(d2, dtype=np.float32)
        masks = {c: labels == c for c in uniq}
        counts = {c: int(m.sum()) for c, m in masks.items()}
        mean_to = np.stack([dist[:, masks[c]].mean(axis=1) for c in uniq],
                           axis=1)  # (n, n_clusters)
        scores = np.zeros(len(data), np.float32)
        for j, c in enumerate(uniq):
            mine = masks[c]
            if counts[c] < 2:
                continue  # singleton clusters score 0 (sklearn convention)
            # own-cluster mean excludes self: n/(n-1) correction of the mean
            a = mean_to[mine, j] * counts[c] / (counts[c] - 1)
            b = np.min(np.delete(mean_to[mine], j, axis=1), axis=1)
            scores[mine] = (b - a) / np.maximum(np.maximum(a, b), 1e-12)
        score = float(scores.mean())
        logger.info("Silhouette Score: %s", score)
        return score

    def visualize_centroids(self, centroids: np.ndarray) -> None:
        """2-D PCA scatter (reference :104-113), PCA via numpy SVD."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            centered = centroids - centroids.mean(axis=0, keepdims=True)
            _, _, vt = np.linalg.svd(centered, full_matrices=False)
            pts = centered @ vt[:2].T
            plt.figure(figsize=(10, 8))
            plt.scatter(pts[:, 0], pts[:, 1])
            plt.title("2D PCA of Centroids")
            out = Path(self.config.base_dir) / "output" / "centroids_visualization.png"
            out.parent.mkdir(parents=True, exist_ok=True)
            plt.savefig(out)
            plt.close()
            logger.info("Centroids visualization saved to %s", out)
        except Exception as e:  # plotting is best-effort
            logger.warning("centroid visualization failed: %s", e)


if __name__ == "__main__":
    ClusterCreator(AudioTokensConfig.from_args()).run()
