"""VQ assignment exactness + K-means parity vs a pure-numpy Lloyd reference,
plus sharded == unsharded equivalence on the virtual 8-device CPU mesh."""

from pathlib import Path

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from audio_tokens_tpu.ops.kmeans import KMeans, kmeans_fit
from audio_tokens_tpu.ops.vq import l2_normalize, pairwise_sqdist, vq_assign


def numpy_lloyd(x, init, niter):
    """Independent reference: plain Lloyd with keep-previous empty handling."""
    c = init.astype(np.float64).copy()
    x = x.astype(np.float64)
    for _ in range(niter):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(c.shape[0]):
            pts = x[a == j]
            if len(pts):
                c[j] = pts.mean(0)
    return c


def test_l2_normalize_matches_reference_formula(rng):
    v = rng.standard_normal((50, 16)).astype(np.float32)
    ours = np.asarray(l2_normalize(v))
    expect = v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-10)
    np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_vq_assign_exact_vs_bruteforce(rng):
    x = rng.standard_normal((1000, 24)).astype(np.float32)
    c = rng.standard_normal((37, 24)).astype(np.float32)
    ours = vq_assign(x, c, chunk=128)
    brute = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(ours, brute)


def test_vq_assign_tie_breaks_low_index():
    c = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)  # dup centroids
    x = np.array([[1.0, 0.0], [0.5, 0.5]], np.float32)
    a = vq_assign(x, c)
    assert a[0] == 0  # tie between centroid 0 and 1 -> lowest index


def test_vq_assign_distances(rng):
    x = rng.standard_normal((100, 8)).astype(np.float32)
    c = rng.standard_normal((10, 8)).astype(np.float32)
    a, d = vq_assign(x, c, return_distances=True)
    brute = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, brute.min(1), atol=1e-4)


def test_pairwise_sqdist(rng):
    x = rng.standard_normal((64, 12)).astype(np.float32)
    c = rng.standard_normal((9, 12)).astype(np.float32)
    ours = np.asarray(pairwise_sqdist(x, c))
    brute = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, brute, atol=1e-4)


def test_kmeans_matches_numpy_lloyd(rng):
    x = rng.standard_normal((500, 8)).astype(np.float32)
    init = x[:10].copy()
    ours, obj = kmeans_fit(x, 10, niter=5, init_centroids=init, chunk=128)
    expect = numpy_lloyd(x, init, 5)
    np.testing.assert_allclose(ours, expect, atol=1e-4)
    assert obj > 0


def test_kmeans_objective_decreases(rng):
    x = rng.standard_normal((2000, 16)).astype(np.float32)
    objs = []
    for niter in (1, 3, 10):
        _, obj = kmeans_fit(x, 8, niter=niter, seed=0)
        objs.append(obj)
    assert objs[0] >= objs[1] >= objs[2]


def test_kmeans_deterministic(rng):
    x = rng.standard_normal((300, 8)).astype(np.float32)
    c1, o1 = kmeans_fit(x, 6, niter=4, seed=3)
    c2, o2 = kmeans_fit(x, 6, niter=4, seed=3)
    np.testing.assert_array_equal(c1, c2)
    assert o1 == o2


def test_sharded_kmeans_matches_unsharded(rng):
    """8-device data-sharded Lloyd must equal the single-device result."""
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    x = rng.standard_normal((4096, 8)).astype(np.float32)
    init = x[rng.choice(4096, 32, replace=False)]
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    sharded, obj_s = kmeans_fit(x, 32, niter=6, init_centroids=init, mesh=mesh, chunk=64)
    single, obj_1 = kmeans_fit(x, 32, niter=6, init_centroids=init, chunk=512)
    np.testing.assert_allclose(sharded, single, atol=1e-3)
    assert obj_s == pytest.approx(obj_1, rel=1e-4)


def test_kmeans_warm_start_refines(rng):
    """Reference batch schedule: train(b0) then train(b1, init=centroids)."""
    x0 = rng.standard_normal((400, 8)).astype(np.float32)
    x1 = rng.standard_normal((400, 8)).astype(np.float32) + 2.0
    km = KMeans(8, 8, niter=4, seed=1)
    km.train(x0)
    c0 = km.centroids.copy()
    km.train(x1, init_centroids=km.centroids)
    assert not np.allclose(c0, km.centroids)
    # warm-started result equals a direct fit with that init
    expect, _ = kmeans_fit(x1, 8, niter=4, init_centroids=c0, seed=1)
    np.testing.assert_allclose(km.centroids, expect, atol=1e-5)


def test_kmeans_subsampling_cap(rng):
    x = rng.standard_normal((4000, 4)).astype(np.float32)
    c, _ = kmeans_fit(x, 4, niter=2, seed=0, max_points_per_centroid=100)
    assert c.shape == (4, 4)


def test_empty_cluster_keeps_previous_centroid():
    x = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0]], np.float32)
    far = np.array([[0.05, 0.0], [10.0, 10.0], [99.0, 99.0]], np.float32)
    c, _ = kmeans_fit(x, 3, niter=3, init_centroids=far)
    np.testing.assert_allclose(c[2], [99.0, 99.0], atol=1e-6)  # never assigned


def test_kmeans_plusplus_init(rng):
    from audio_tokens_tpu.ops.kmeans import kmeans_plusplus_init

    # 4 well-separated blobs: k-means++ should pick one seed from each
    centers = np.array([[0, 0], [50, 0], [0, 50], [50, 50]], np.float32)
    x = np.concatenate(
        [c + rng.standard_normal((100, 2)).astype(np.float32) for c in centers]
    )
    init = kmeans_plusplus_init(x, 4, seed=0)
    assert init.shape == (4, 2)
    # every blob represented
    blob_of = ((init[:, None, :] - centers[None]) ** 2).sum(-1).argmin(1)
    assert sorted(blob_of.tolist()) == [0, 1, 2, 3]
    # deterministic
    np.testing.assert_array_equal(init, kmeans_plusplus_init(x, 4, seed=0))
    # better (or equal) objective than random init on structured data
    from audio_tokens_tpu.ops.kmeans import kmeans_fit

    _, obj_pp = kmeans_fit(x, 4, niter=3, seed=0, init="kmeans++")
    _, obj_rand = kmeans_fit(x, 4, niter=3, seed=0, init="random")
    assert obj_pp <= obj_rand * 1.5


class TestStreamingKMeans:
    """kmeans_fit_streaming: bounded-memory full-corpus Lloyd."""

    @staticmethod
    def _blobs(rng, n=6000, d=16, k=8):
        centers = rng.standard_normal((k, d)).astype(np.float32) * 5
        idx = rng.integers(0, k, n)
        return (centers[idx] + 0.1 * rng.standard_normal((n, d))).astype(
            np.float32
        )

    def test_matches_inmemory_fit(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit, kmeans_fit_streaming
        from audio_tokens_tpu.ops.vq import vq_assign

        x = self._blobs(rng)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()

        mem_c, mem_obj = kmeans_fit(x, k, niter=5, init_centroids=init)
        # stream in awkward feed sizes; several super-batches per pass
        feeds = [x[i : i + 700] for i in range(0, len(x), 700)]
        st_c, st_obj, n_total = kmeans_fit_streaming(
            lambda: iter(feeds), k, niter=5, init_centroids=init,
            superbatch_rows=1024, chunk=256,
        )
        assert n_total == len(x)
        # accumulation association differs (super-batch partials vs one scan):
        # centroids agree to fp-reassociation noise, tokens exactly
        np.testing.assert_allclose(st_c, mem_c, rtol=2e-3, atol=2e-3)
        assert abs(st_obj - mem_obj) / abs(mem_obj) < 1e-3
        # the codebooks tokenize near-identically (boundary points may flip
        # under fp reassociation; cluster structure must be unchanged)
        agree = np.mean(vq_assign(x, st_c) == vq_assign(x, mem_c))
        assert agree >= 0.999, f"token agreement {agree:.4f}"

    def test_sharded_matches_unsharded(self, rng):
        import jax
        from jax.sharding import Mesh

        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=4096)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        feeds = [x[i : i + 1000] for i in range(0, len(x), 1000)]
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

        c1, o1, _ = kmeans_fit_streaming(
            lambda: iter(feeds), k, niter=4, init_centroids=init,
            superbatch_rows=2048, chunk=128,
        )
        c2, o2, _ = kmeans_fit_streaming(
            lambda: iter(feeds), k, niter=4, init_centroids=init,
            superbatch_rows=2048, chunk=128, mesh=mesh,
        )
        np.testing.assert_allclose(c2, c1, rtol=1e-6, atol=1e-6)
        assert abs(o2 - o1) / abs(o1) < 1e-6

    def test_feeder_fixed_capacity_write_once_buffers(self, rng):
        """Feeds are fixed-capacity and each buffer is FRESH (write-once):
        it may be retained by an async device transfer or the stream cache,
        so reusing one buffer would corrupt in-flight feeds.  Host memory
        stays bounded by the transfer-pipeline depth, not the corpus."""
        import gc
        import weakref

        from audio_tokens_tpu.ops.kmeans import _SuperbatchFeeder

        d = 8
        feeder = _SuperbatchFeeder(512, d)
        total = 0
        refs = []
        chunks = [rng.standard_normal((337, d)).astype(np.float32)
                  for _ in range(11)]
        prev = None
        for buf, fill in feeder.feeds(iter(chunks)):
            assert buf is not prev  # never reused
            refs.append(weakref.ref(buf))
            prev = buf
            total += fill
            assert buf.shape == (512, d)
        assert total == 337 * 11
        del buf, prev
        gc.collect()
        # dropped feeds are collectable -> live memory is O(pipeline depth)
        assert sum(r() is not None for r in refs) == 0

    def test_stream_cache_replays_without_reproducing(self, rng):
        """cache_mb > 0: the stream is produced once; iterations 2..n replay
        the cached super-batches and the result matches the uncached run."""
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=3000)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        calls = {"n": 0}

        def batches():
            calls["n"] += 1
            return iter([x[i : i + 700] for i in range(0, len(x), 700)])

        c_cached, o_cached, n1 = kmeans_fit_streaming(
            batches, k, niter=4, d=x.shape[1], init_centroids=init,
            superbatch_rows=1024, chunk=256, cache_mb=64,
        )
        assert calls["n"] == 1  # stream produced exactly once
        c_plain, o_plain, n2 = kmeans_fit_streaming(
            lambda: iter([x[i : i + 700] for i in range(0, len(x), 700)]),
            k, niter=4, init_centroids=init,
            superbatch_rows=1024, chunk=256,
        )
        assert n1 == n2 == len(x)
        np.testing.assert_allclose(c_cached, c_plain, rtol=1e-6, atol=1e-6)
        assert abs(o_cached - o_plain) / abs(o_plain) < 1e-6

    def test_hbm_cache_replay_is_bit_identical(self, rng):
        """hbm_cache_mb > 0: iteration 0's device feeds are retained and
        later iterations replay them — the stream is produced once and the
        trajectory is BIT-identical to re-streaming (same arrays, same
        order, same programs)."""
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=3000)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        calls = {"n": 0}

        def batches():
            calls["n"] += 1
            return iter([x[i : i + 700] for i in range(0, len(x), 700)])

        c_hbm, o_hbm, n1 = kmeans_fit_streaming(
            batches, k, niter=4, d=x.shape[1], init_centroids=init,
            superbatch_rows=1024, chunk=256, hbm_cache_mb=64,
        )
        assert calls["n"] == 1  # stream produced exactly once
        c_plain, o_plain, n2 = kmeans_fit_streaming(
            lambda: iter([x[i : i + 700] for i in range(0, len(x), 700)]),
            k, niter=4, init_centroids=init,
            superbatch_rows=1024, chunk=256,
        )
        assert n1 == n2 == len(x)
        np.testing.assert_array_equal(np.asarray(c_hbm), np.asarray(c_plain))
        assert o_hbm == o_plain

    def test_hbm_cache_dropped_when_over_budget(self, rng, caplog):
        """An over-budget corpus drops the resident set, logs, and still
        converges to the re-streamed result."""
        import logging

        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=40000)  # ~2.6 MB: exceeds the 1 MB budget
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        with caplog.at_level(logging.INFO, logger="audio_tokens_tpu.ops.kmeans"):
            c_a, o_a, _ = kmeans_fit_streaming(
                lambda: iter([x[i : i + 700] for i in range(0, len(x), 700)]),
                k, niter=3, d=x.shape[1], init_centroids=init,
                superbatch_rows=1024, chunk=256, hbm_cache_mb=1,
            )
        assert any("HBM corpus cache dropped" in r.getMessage()
                   for r in caplog.records)
        c_b, o_b, _ = kmeans_fit_streaming(
            lambda: iter([x[i : i + 700] for i in range(0, len(x), 700)]),
            k, niter=3, init_centroids=init,
            superbatch_rows=1024, chunk=256,
        )
        np.testing.assert_array_equal(np.asarray(c_a), np.asarray(c_b))

    def test_stream_cache_dropped_when_over_budget(self, rng, caplog):
        """An over-budget corpus drops the cache and re-streams every
        iteration (and says so)."""
        import logging

        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        # 20 feeds x 64 KB = 1.25 MB > the 1 MB budget
        x = self._blobs(rng, n=20000)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        calls = {"n": 0}

        def batches():
            calls["n"] += 1
            return iter([x[i : i + 700] for i in range(0, len(x), 700)])

        with caplog.at_level(logging.INFO, logger="audio_tokens_tpu.ops.kmeans"):
            kmeans_fit_streaming(
                batches, k, niter=3, d=x.shape[1], init_centroids=init,
                superbatch_rows=1024, chunk=256, cache_mb=1,
            )
        assert calls["n"] == 3  # cache dropped -> one stream per iteration
        assert any("cache dropped" in r.message for r in caplog.records)

    def test_stream_spill_replays_bit_identical(self, rng, tmp_path):
        """cache_spill: when the packed stream outgrows the RAM budget it
        spills to one sequential file, the stream is still produced exactly
        once, replay matches re-streaming BIT-identically (masked pad rows
        contribute exact zeros), and the scratch file is deleted on
        return."""
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=20000)  # ~1.25 MB packed > 1 MB RAM budget
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        calls = {"n": 0}

        def batches():
            calls["n"] += 1
            return iter([x[i : i + 700] for i in range(0, len(x), 700)])

        spill = tmp_path / "kmeans_spill.bin"
        c_spill, o_spill, n1 = kmeans_fit_streaming(
            batches, k, niter=4, d=x.shape[1], init_centroids=init,
            superbatch_rows=1024, chunk=256, cache_mb=1,
            cache_spill_path=spill, cache_spill_mb=64,
        )
        assert calls["n"] == 1  # stream produced exactly once
        assert not spill.exists()  # per-fit scratch, deleted on return
        c_plain, o_plain, n2 = kmeans_fit_streaming(
            lambda: iter([x[i : i + 700] for i in range(0, len(x), 700)]),
            k, niter=4, init_centroids=init,
            superbatch_rows=1024, chunk=256,
        )
        assert n1 == n2 == len(x)
        np.testing.assert_array_equal(np.asarray(c_spill),
                                      np.asarray(c_plain))
        assert o_spill == o_plain

    def test_stream_spill_dropped_when_over_budget(self, rng, tmp_path,
                                                   caplog):
        """Corpus beyond BOTH the RAM and disk budgets: the spill is
        dropped (file deleted), every iteration re-streams, and it's
        logged."""
        import logging

        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=20000)  # ~1.25 MB packed
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        calls = {"n": 0}

        def batches():
            calls["n"] += 1
            return iter([x[i : i + 700] for i in range(0, len(x), 700)])

        spill = tmp_path / "kmeans_spill.bin"
        with caplog.at_level(logging.INFO,
                             logger="audio_tokens_tpu.ops.kmeans"):
            kmeans_fit_streaming(
                batches, k, niter=3, d=x.shape[1], init_centroids=init,
                superbatch_rows=1024, chunk=256, cache_mb=1,
                cache_spill_path=spill, cache_spill_mb=1,
            )
        assert calls["n"] == 3  # spill dropped -> one stream per iteration
        assert not spill.exists()
        assert any("spill dropped" in r.message for r in caplog.records)

    def test_feeder_preserves_order_and_values(self, rng):
        from audio_tokens_tpu.ops.kmeans import _SuperbatchFeeder

        d = 4
        chunks = [rng.standard_normal((n, d)).astype(np.float32)
                  for n in (5, 900, 3, 250)]
        ref = np.concatenate(chunks)
        feeder = _SuperbatchFeeder(256, d)
        out = []
        for buf, fill in feeder.feeds(iter(chunks)):
            out.append(buf[:fill].copy())
        np.testing.assert_array_equal(np.concatenate(out), ref)

    def test_init_from_first_superbatch(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=2000, k=6)
        c, obj, n = kmeans_fit_streaming(
            lambda: iter([x[:1200], x[1200:]]), 6, niter=3,
            superbatch_rows=1024, chunk=128, seed=3,
        )
        assert c.shape == (6, x.shape[1]) and np.isfinite(obj) and n == 2000

    def test_resume_is_bit_identical(self, rng):
        """checkpoint_fn + start_iter: resuming a killed fit from its
        per-iteration checkpoint reproduces the uninterrupted trajectory
        EXACTLY (the stream is deterministic, so the resumed iterations see
        the same feeds; the iteration-invariant ||x||^2 objective term is
        re-collected on the first resumed iteration)."""
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=4000)
        k = 8
        init = x[rng.choice(len(x), k, replace=False)].copy()
        feeds = [x[i : i + 900] for i in range(0, len(x), 900)]

        ckpts = {}
        c_full, o_full, _ = kmeans_fit_streaming(
            lambda: iter(feeds), k, niter=5, init_centroids=init,
            superbatch_rows=1024, chunk=128,
            checkpoint_fn=lambda it, c, o: ckpts.__setitem__(
                it, (c.copy(), o)),
        )
        assert sorted(ckpts) == [1, 2, 3, 4, 5]
        np.testing.assert_array_equal(ckpts[5][0], c_full)

        c_resumed, o_resumed, n_resumed = kmeans_fit_streaming(
            lambda: iter(feeds), k, niter=5, init_centroids=ckpts[2][0],
            start_iter=2, superbatch_rows=1024, chunk=128,
        )
        np.testing.assert_array_equal(c_resumed, c_full)
        assert o_resumed == o_full
        assert n_resumed == len(x)

    def test_resume_argument_validation(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x = self._blobs(rng, n=500)
        with pytest.raises(ValueError, match="init_centroids"):
            kmeans_fit_streaming(lambda: iter([x]), 4, niter=3, start_iter=1)
        with pytest.raises(ValueError, match="start_iter"):
            kmeans_fit_streaming(lambda: iter([x]), 4, niter=3, start_iter=3,
                                 init_centroids=x[:4])

    def test_cluster_stage_checkpoint_resume(self, tmp_path, caplog):
        """Stage-level mid-fit resume: an interrupted streaming clustering
        run leaves a .kmeans_ckpt.npz; an incremental rerun resumes at that
        iteration and lands on the uninterrupted run's exact centroids; the
        checkpoint is removed once centroids.npy is durably written."""
        import logging as _logging

        from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
        from audio_tokens_tpu.data.splitter import DatasetSplitter
        from audio_tokens_tpu.ops.kmeans import (
            kmeans_fit_streaming, precision_from_str,
        )
        from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
        from audio_tokens_tpu.processors.spectrogram_generator import (
            SpectrogramGenerator,
        )
        from tests import fixtures

        fixtures.make_workspace(tmp_path, n_clips=10)
        cfg = fixtures.test_config(
            tmp_path, kmeans_mode="full", kmeans_streaming="always",
            kmeans_superbatch_rows=1024, niter=4, incremental=True,
        )
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        SpectrogramGenerator(cfg).run()

        cc = ClusterCreator(cfg)
        c_full = cc.run()
        assert not cc._kmeans_ckpt_path().exists()

        # simulate the interruption: re-run the stage's exact fit for only
        # 2 iterations and plant its state as the in-progress checkpoint
        # (the stage seeds the fit with its topology-invariant global init,
        # so the partial fit must start from the same centroids)
        cc2 = ClusterCreator(cfg)
        c2, obj2, _ = kmeans_fit_streaming(
            lambda: cc2._batch_generator(cfg.clustering_batch_size),
            cfg.vocab_size, 2, d=cc2.feature_dim, seed=cfg.random_seed,
            init_centroids=cc2._global_init_centroids(),
            mesh=cc2.mesh,
            superbatch_rows=cfg.kmeans_superbatch_rows,
            init=cfg.kmeans_init, empty_policy=cfg.kmeans_empty_policy,
            precision=precision_from_str(cfg.kmeans_precision),
        )
        cc2._save_kmeans_checkpoint(2, c2, obj2)
        Path(cfg.centroids_path).unlink()

        with caplog.at_level(_logging.INFO):
            c_resumed = cc2.run()
        assert "resuming streaming kmeans from checkpoint: 2/4" in caplog.text
        np.testing.assert_array_equal(c_resumed, c_full)
        assert not cc2._kmeans_ckpt_path().exists()

        # a NON-incremental rerun must ignore (and clear) any stale ckpt
        cc2._save_kmeans_checkpoint(2, c2, obj2)
        cfg_destructive = fixtures.test_config(
            tmp_path, kmeans_mode="full", kmeans_streaming="always",
            kmeans_superbatch_rows=1024, niter=4, incremental=False,
        )
        c_fresh = ClusterCreator(cfg_destructive).run()
        np.testing.assert_array_equal(c_fresh, c_full)

    def test_global_init_is_deterministic_and_shard_independent(
            self, tmp_path):
        """The streaming fit's init is drawn from the GLOBAL clip list, so
        it depends only on (corpus, config) — not on how the feed is
        sharded.  Fresh ClusterCreator instances (staged AND fused routes)
        must produce identical init centroids; the composed two-process
        rehearsal (tests/test_pipeline_multiprocess.py) previously caught
        the first-local-super-batch init diverging 57% of centroid elements
        between process counts."""
        from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
        from audio_tokens_tpu.data.splitter import DatasetSplitter
        from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
        from audio_tokens_tpu.processors.spectrogram_generator import (
            SpectrogramGenerator,
        )
        from tests import fixtures

        fixtures.make_workspace(tmp_path, n_clips=10)
        cfg = fixtures.test_config(tmp_path, kmeans_mode="full",
                                   kmeans_streaming="always")
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        SpectrogramGenerator(cfg).run()
        c_a = ClusterCreator(cfg)._global_init_centroids()
        c_b = ClusterCreator(cfg)._global_init_centroids()
        assert c_a.shape == (cfg.vocab_size, cfg.n_mels)
        np.testing.assert_array_equal(c_a, c_b)
        # fused route: same clips through the device mel frontend — the
        # staged artifacts are bit-identical to iter_specs by contract
        cfg_f = fixtures.test_config(tmp_path, fused_pipeline=True,
                                     kmeans_mode="full",
                                     kmeans_streaming="always")
        c_fused = ClusterCreator(cfg_f)._global_init_centroids()
        np.testing.assert_array_equal(c_a, c_fused)

    def test_cluster_stage_streaming_matches_inmemory(self, tmp_path):
        """kmeans_streaming='always' through the pipeline stage produces a
        usable codebook on the same corpus as the in-memory full mode."""
        from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
        from audio_tokens_tpu.data.splitter import DatasetSplitter
        from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
        from audio_tokens_tpu.processors.spectrogram_generator import (
            SpectrogramGenerator,
        )
        from tests import fixtures

        fixtures.make_workspace(tmp_path, n_clips=10)
        cfg = fixtures.test_config(tmp_path, kmeans_mode="full",
                                   kmeans_streaming="always",
                                   kmeans_superbatch_rows=1024)
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        SpectrogramGenerator(cfg).run()
        ClusterCreator(cfg).run()
        c = np.load(cfg.centroids_path)
        assert c.shape == (cfg.vocab_size, cfg.n_mels)
        assert np.isfinite(c).all()


class TestEmptyClusterSplit:
    """empty_policy='split_largest': deterministic FAISS-style repair."""

    @staticmethod
    def _dead_centroid_setup(rng):
        """Two blobs + an init centroid far from all data: under 'keep' it
        stays dead forever; 'split_largest' must recycle it."""
        a = rng.standard_normal((300, 4)).astype(np.float32)
        b = rng.standard_normal((100, 4)).astype(np.float32) + 10.0
        x = np.concatenate([a, b])
        init = np.array(
            [[0, 0, 0, 0], [10, 10, 10, 10], [99, 99, 99, 99]], np.float32
        )
        return x, init

    def _nonempty_count(self, x, c):
        from audio_tokens_tpu.ops.vq import vq_assign

        return len(np.unique(vq_assign(x, c)))

    def test_dead_centroid_recycled(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit

        x, init = self._dead_centroid_setup(rng)
        keep_c, keep_obj = kmeans_fit(x, 3, niter=6, init_centroids=init,
                                      empty_policy="keep")
        np.testing.assert_allclose(keep_c[2], [99, 99, 99, 99], atol=1e-6)
        assert self._nonempty_count(x, keep_c) == 2

        split_c, split_obj = kmeans_fit(x, 3, niter=6, init_centroids=init,
                                        empty_policy="split_largest")
        assert self._nonempty_count(x, split_c) == 3  # no cluster stays empty
        assert np.abs(split_c[2]).max() < 15  # re-seeded into the data
        assert split_obj < keep_obj  # extra effective centroid helps

    def test_deterministic(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit

        x, init = self._dead_centroid_setup(rng)
        c1, o1 = kmeans_fit(x, 3, niter=6, init_centroids=init,
                            empty_policy="split_largest")
        c2, o2 = kmeans_fit(x, 3, niter=6, init_centroids=init,
                            empty_policy="split_largest")
        np.testing.assert_array_equal(c1, c2)
        assert o1 == o2

    def test_sharded_matches_unsharded(self, rng):
        import jax
        from jax.sharding import Mesh

        from audio_tokens_tpu.ops.kmeans import kmeans_fit

        x, init = self._dead_centroid_setup(rng)
        c1, _ = kmeans_fit(x, 3, niter=6, init_centroids=init,
                           empty_policy="split_largest", chunk=64)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        c2, _ = kmeans_fit(x, 3, niter=6, init_centroids=init, mesh=mesh,
                           empty_policy="split_largest", chunk=64)
        np.testing.assert_allclose(c2, c1, rtol=1e-4, atol=1e-4)

    def test_streaming_applies_split(self, rng):
        from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

        x, init = self._dead_centroid_setup(rng)
        c, obj, _ = kmeans_fit_streaming(
            lambda: iter([x[:150], x[150:]]), 3, niter=6,
            init_centroids=init, superbatch_rows=256, chunk=64,
            empty_policy="split_largest",
        )
        assert self._nonempty_count(x, c) == 3
        assert np.abs(c[2]).max() < 15

    def test_split_helper_host_device_agree(self, rng):
        import jax.numpy as jnp

        from audio_tokens_tpu.ops.kmeans import (
            _split_empty_clusters, _split_empty_clusters_np,
        )

        c = rng.standard_normal((10, 6)).astype(np.float32)
        counts = rng.integers(0, 50, 10).astype(np.float32)
        counts[[2, 5, 7]] = 0.0
        dc, dn = _split_empty_clusters(jnp.asarray(c), jnp.asarray(counts))
        hc, hn = _split_empty_clusters_np(c, counts)
        np.testing.assert_allclose(np.asarray(dc), hc, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dn), hn)
        assert (hn > 0).all()


def test_silhouette_matches_sklearn(rng, tmp_path):
    """ClusterCreator.evaluate_clustering == sklearn silhouette_score (the
    reference shipped this helper as dead code; here it works)."""
    from sklearn.metrics import silhouette_score

    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from tests import fixtures

    centers = rng.standard_normal((5, 8)) * 4
    labels = rng.integers(0, 5, 600)
    data = (centers[labels] + 0.3 * rng.standard_normal((600, 8))).astype(
        np.float32)
    fixtures.make_workspace(tmp_path, n_clips=4)
    cc = ClusterCreator(fixtures.test_config(tmp_path))
    ours = cc.evaluate_clustering(data, labels)
    assert abs(ours - float(silhouette_score(data, labels))) < 1e-5


def test_streaming_bf16_wire_close_to_f32():
    """kmeans_wire='bf16': frames rounded once on the host, accumulation
    still f32 — centroids land within bf16-rounding distance of the f32-wire
    run and the objective matches to ~1e-2 relative."""
    import ml_dtypes

    from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 16)).astype(np.float32) * 5
    x = (centers[rng.integers(0, 6, 4096)]
         + 0.1 * rng.standard_normal((4096, 16))).astype(np.float32)
    init = x[rng.choice(4096, 6, replace=False)].copy()
    feeds = [x[i: i + 700] for i in range(0, len(x), 700)]

    c32, o32, n32 = kmeans_fit_streaming(
        lambda: iter(feeds), 6, niter=4, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128)
    c16, o16, n16 = kmeans_fit_streaming(
        lambda: iter(feeds), 6, niter=4, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128, wire_dtype=ml_dtypes.bfloat16)
    assert n16 == n32 == 4096
    np.testing.assert_allclose(c16, c32, rtol=2e-2, atol=5e-2)
    assert abs(o16 - o32) / abs(o32) < 2e-2


def test_streaming_bf16_wire_with_cache_and_mesh():
    """bf16 wire composes with the stream cache and the 8-device mesh."""
    import jax
    import ml_dtypes
    from jax.sharding import Mesh

    from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

    rng = np.random.default_rng(4)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    init = x[:8].copy()
    feeds = [x[i: i + 600] for i in range(0, len(x), 600)]
    mesh = Mesh(np.array(jax.devices()), ("data",))
    c1, o1, n1 = kmeans_fit_streaming(
        lambda: iter(feeds), 8, niter=3, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128, mesh=mesh, cache_mb=64,
        wire_dtype=ml_dtypes.bfloat16)
    c2, o2, n2 = kmeans_fit_streaming(
        lambda: iter(feeds), 8, niter=3, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128, wire_dtype=ml_dtypes.bfloat16)
    assert n1 == n2 == 4096
    # sharded == unsharded on identical bf16-rounded inputs (fp reassoc only)
    np.testing.assert_allclose(c1, c2, rtol=2e-4, atol=2e-4)


def test_streaming_hbm_cache_with_mesh():
    """The HBM-resident corpus replay composes with the 8-device mesh:
    retained global sharded feeds replay bit-identically to re-streaming."""
    import jax
    from jax.sharding import Mesh

    from audio_tokens_tpu.ops.kmeans import kmeans_fit_streaming

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4096, 16)).astype(np.float32)
    init = x[:8].copy()
    feeds = [x[i: i + 600] for i in range(0, len(x), 600)]
    mesh = Mesh(np.array(jax.devices()), ("data",))
    calls = {"n": 0}

    def batches():
        calls["n"] += 1
        return iter(feeds)

    c1, o1, n1 = kmeans_fit_streaming(
        batches, 8, niter=3, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128, mesh=mesh, hbm_cache_mb=64)
    assert calls["n"] == 1  # produced once, replayed from device
    c2, o2, n2 = kmeans_fit_streaming(
        lambda: iter(feeds), 8, niter=3, d=16, init_centroids=init,
        superbatch_rows=1024, chunk=128, mesh=mesh)
    assert n1 == n2 == 4096
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert o1 == o2


def test_kmeans_ckpt_multiprocess_reconciliation(tmp_path, monkeypatch, rng):
    """Only the coordinator writes .kmeans_ckpt.npz; on a non-shared
    filesystem the other processes won't see it.  The load must reconcile
    across processes (every process either resumes the SAME state or all
    restart at 0) — divergence would mismatch the streaming fit's psum
    collectives and hang the job."""
    from jax.experimental import multihost_utils

    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.parallel import distributed
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )
    from tests import fixtures

    fixtures.make_workspace(tmp_path, n_clips=6)
    cfg = fixtures.test_config(tmp_path, kmeans_mode="full",
                               kmeans_streaming="always", niter=3,
                               incremental=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    cc = ClusterCreator(cfg)
    cents = rng.standard_normal(
        (cfg.vocab_size, cc.feature_dim)).astype(np.float32)
    cc._save_kmeans_checkpoint(2, cents, 1.0)

    monkeypatch.setattr(distributed, "is_multiprocess", lambda: True)

    # all processes report the same (iter, crc): resume proceeds
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda v: np.stack([v, v]))
    start, c = cc._load_kmeans_checkpoint()
    assert start == 2
    np.testing.assert_array_equal(c, cents)

    # another process saw no checkpoint (iter 0): everyone restarts
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda v: np.stack([v, np.zeros_like(np.asarray(v))]))
    start, c = cc._load_kmeans_checkpoint()
    assert start == 0 and c is None


def test_kmeans_fit_n_valid_capacity_buffer(rng):
    """A chunk-aligned CAPACITY buffer (junk rows beyond n_valid) fits
    identically to the exact-n array — the all-device cluster feed hands
    kmeans_fit its HBM buffer this way so no slice/pad copy is made (r4
    review: the old slice+pad path peaked at ~2x the corpus in HBM)."""
    import jax.numpy as jnp

    n, d, k, chunk = 1000, 8, 16, 128
    x = rng.standard_normal((n, d)).astype(np.float32)
    init = x[rng.choice(n, k, replace=False)]
    cap = 1280  # multiple of chunk, > n; junk tail must not matter
    buf = np.full((cap, d), 7.25, np.float32)
    buf[:n] = x
    exact, obj_e = kmeans_fit(x, k, niter=5, init_centroids=init, chunk=chunk)
    capped, obj_c = kmeans_fit(jnp.asarray(buf), k, niter=5,
                               init_centroids=init, chunk=chunk, n_valid=n)
    np.testing.assert_array_equal(capped, exact)
    assert obj_c == obj_e


def test_kmeans_fit_n_valid_with_random_init_and_validation(rng):
    """Random init must draw only valid rows; bad n_valid rejected."""
    n, d, k = 600, 6, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    buf = np.concatenate([x, np.full((424, d), 1e6, np.float32)])
    c, _ = kmeans_fit(buf, k, niter=3, seed=7, chunk=128, n_valid=n)
    # junk rows are huge (1e6); any leak into init/stats would show up as
    # a centroid far outside the data's range
    assert np.abs(c).max() < 100.0
    with pytest.raises(ValueError, match="n_valid"):
        kmeans_fit(buf, k, niter=1, n_valid=0)
    with pytest.raises(ValueError, match="n_valid"):
        kmeans_fit(buf, k, niter=1, n_valid=buf.shape[0] + 1)


def test_vq_assign_fused_sharded_block_loop(rng, monkeypatch):
    """The sharded corpus-scale block loop (r4 review: it used to pad the
    whole corpus and had no row blocking) produces the same assignments as
    the single-program path."""
    from audio_tokens_tpu.ops import vq as vq_mod

    assert len(jax.devices()) == 8
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    x = rng.standard_normal((3000, 16)).astype(np.float32)
    c = rng.standard_normal((24, 16)).astype(np.float32)
    ref = vq_mod.vq_assign_fused(x, c, mesh=mesh)
    monkeypatch.setattr(vq_mod, "ASSIGN_BLOCK", 128)
    blocked = vq_mod.vq_assign_fused(x, c, mesh=mesh)
    np.testing.assert_array_equal(blocked, ref)
    # single-device block loop too (non-pallas path falls through; force
    # the pallas interpret path to cover the block slicing)
    ref1 = vq_mod.vq_assign_fused(x, c, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(ref1, ref)


def test_kmeans_fit_small_n_valid_in_default_chunk_capacity(rng):
    """The copy-free contract holds when n_valid is much smaller than the
    buffer: the scan chunk is sized from the CAPACITY (one mostly-masked
    chunk), not from n_valid — sizing it from n_valid left cap % unit != 0
    and the pad branch copied the whole buffer (r4 review).  Junk rows are
    huge so any mask leak would blow the centroids out of data range."""
    import jax.numpy as jnp

    from audio_tokens_tpu.ops.kmeans import DEFAULT_CHUNK, kmeans_fit

    n, d, k = 500, 8, 8
    x = rng.standard_normal((n, d)).astype(np.float32)
    init = x[rng.choice(n, k, replace=False)]
    buf = np.full((DEFAULT_CHUNK, d), 1e6, np.float32)
    buf[:n] = x
    capped, obj_c = kmeans_fit(jnp.asarray(buf), k, niter=4,
                               init_centroids=init, n_valid=n)
    exact, obj_e = kmeans_fit(x, k, niter=4, init_centroids=init)
    assert np.abs(capped).max() < 100.0
    # different chunkings reassociate the f32 sums; allclose, not equal
    np.testing.assert_allclose(capped, exact, rtol=1e-5, atol=1e-5)
    assert abs(obj_c - obj_e) / abs(obj_e) < 1e-5
