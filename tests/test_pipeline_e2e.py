"""End-to-end pipeline tests on the synthetic corpus: split -> spectrograms ->
centroids -> tokens -> (model training tested separately in test_training)."""

import json
from pathlib import Path

import numpy as np
import pytest

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.ops.mel import num_frames
from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from audio_tokens_tpu.tokenizer import FusedTokenizer
from tests import fixtures


@pytest.fixture(scope="module")
def pipeline_ws(tmp_path_factory):
    """Run stages 0-3 once on a small synthetic corpus."""
    base = tmp_path_factory.mktemp("pipeline")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    return base, cfg


def test_spectrogram_artifacts(pipeline_ws):
    base, cfg = pipeline_ws
    split = json.loads(Path(cfg.split_file).read_text())
    for split_name in ("train", "validation"):
        out_dir = Path(cfg.dest_spec_path) / split_name
        files = list(out_dir.glob("*.npy"))
        assert len(files) == len(split[split_name])  # every synthetic clip decodes
        spec = np.load(files[0])
        assert spec.dtype == np.float32
        assert spec.shape[0] == cfg.n_mels
        assert np.isfinite(spec).all()


def test_spectrogram_frame_counts_match_clip_lengths(pipeline_ws):
    base, cfg = pipeline_ws
    split = json.loads(Path(cfg.split_file).read_text())
    ytid = split["train"][0]
    i = int(ytid[2:6])
    clip = fixtures.synth_clip(i)
    spec = np.load(Path(cfg.dest_spec_path) / "train" / f"{ytid}.npy")
    expected = num_frames(min(len(clip), cfg.clip_samples), cfg.hop_length)
    assert spec.shape[1] == expected


def test_centroid_artifacts(pipeline_ws):
    base, cfg = pipeline_ws
    centroids = np.load(cfg.centroids_path)
    assert centroids.shape == (cfg.vocab_size, cfg.n_mels)
    # L2-normalized (reference cluster_creator.py:58-59)
    np.testing.assert_allclose(np.linalg.norm(centroids, axis=1), 1.0, atol=1e-4)
    assert (Path(cfg.base_dir) / "output" / "centroids_visualization.png").exists()


def test_token_artifacts_one_token_per_frame(pipeline_ws):
    base, cfg = pipeline_ws
    for split_name in ("train", "validation"):
        spec_dir = Path(cfg.dest_spec_path) / split_name
        tok_dir = Path(cfg.dest_tokenized_path) / split_name
        specs = sorted(spec_dir.glob("*.npy"))
        toks = sorted(tok_dir.glob("*.npy"))
        assert [f.stem for f in specs] == [f.stem for f in toks]
        for sf, tf in zip(specs[:5], toks[:5]):
            spec, tok = np.load(sf), np.load(tf)
            assert tok.shape == (spec.shape[1],)  # one token per STFT frame
            assert tok.dtype == np.int64
            assert tok.min() >= 0 and tok.max() < cfg.vocab_size


def test_tokens_match_manual_assignment(pipeline_ws):
    """Stage-3 output must equal brute-force nearest-centroid by hand."""
    base, cfg = pipeline_ws
    centroids = np.load(cfg.centroids_path)
    tok_dir = Path(cfg.dest_tokenized_path) / "train"
    spec_dir = Path(cfg.dest_spec_path) / "train"
    f = sorted(spec_dir.glob("*.npy"))[0]
    frames = np.load(f).T.astype(np.float32)
    frames = frames / (np.linalg.norm(frames, axis=1, keepdims=True) + 1e-10)
    brute = ((frames[:, None, :] - centroids[None]) ** 2).sum(-1).argmin(1)
    saved = np.load(tok_dir / f.name)
    np.testing.assert_array_equal(saved, brute)


def test_fused_tokenizer_matches_staged_pipeline(pipeline_ws):
    """wav -> tokens in one device program == spectrogram stage + tokenize
    stage composed through .npy artifacts."""
    base, cfg = pipeline_ws
    split = json.loads(Path(cfg.split_file).read_text())
    ytid = split["train"][1]
    i = int(ytid[2:6])
    clip = fixtures.synth_clip(i)

    fused = FusedTokenizer.from_artifacts(cfg)
    fused_tokens = fused.tokenize_waveforms([clip])[0]
    staged = np.load(Path(cfg.dest_tokenized_path) / "train" / f"{ytid}.npy")
    assert fused_tokens.shape == staged.shape
    # identical up to fp associativity at VQ boundaries: require exact match
    np.testing.assert_array_equal(fused_tokens, staged)


def test_rerun_is_destructive_and_deterministic(pipeline_ws):
    """Stages wipe + recreate their output dirs (reference §2.7.8) and are
    deterministic at fixed seed."""
    base, cfg = pipeline_ws
    tok_dir = Path(cfg.dest_tokenized_path) / "train"
    before = {f.name: np.load(f) for f in sorted(tok_dir.glob("*.npy"))[:3]}
    marker = tok_dir / "stale_marker.npy"
    np.save(marker, np.zeros(3))
    SpecTokenizer(cfg).run()
    assert not marker.exists()
    for name, arr in before.items():
        np.testing.assert_array_equal(np.load(tok_dir / name), arr)


def test_zipf_stats_present(pipeline_ws):
    base, cfg = pipeline_ws
    stats = SpecTokenizer(cfg).run()
    s = stats["train"]
    assert s["total_tokens"] > 0
    assert 0 < s["unique_tokens"] <= cfg.vocab_size
    assert "zipf_slope" in s
    # both figures of the reference's token analysis exist (reference
    # processors/spec_tokenizer.py:132-139 and :211-224)
    assert (Path(cfg.base_dir) / "output" / "token_distribution.png").exists()
    assert (Path(cfg.base_dir) / "output" / "zipf_analysis.png").exists()


def test_fused_device_feed_matches_host_generator(tmp_path_factory):
    """The all-device fused cluster feed (waveforms as the only host->device
    traffic, frames assembled into a preallocated HBM buffer) yields exactly
    the host-mediated fused generator's rows, in clip/frame order — so the
    routing in ClusterCreator.run() can switch between them freely."""
    base = tmp_path_factory.mktemp("fused_dev_feed")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base, fused_pipeline=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    cc = ClusterCreator(cfg)
    buf, n_valid = cc._fused_frames_device()
    host = np.concatenate(
        list(cc._batch_generator(cfg.clustering_batch_size)), axis=0)
    # the buffer is a chunk-aligned CAPACITY allocation (consumed copy-free
    # via kmeans_fit(n_valid=...)); rows beyond n_valid are masked junk
    assert buf.shape[0] >= n_valid
    dev = np.asarray(buf)[:n_valid]
    assert dev.shape == host.shape
    np.testing.assert_array_equal(dev, host)


def test_fused_device_feed_engages(tmp_path_factory, monkeypatch):
    """run() routes to the device feed under fused_pipeline (single-process,
    normalize off) — guard against a silent fallback to the host path."""
    base = tmp_path_factory.mktemp("fused_dev_route")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base, fused_pipeline=True, kmeans_mode="full")
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    cc = ClusterCreator(cfg)
    calls = []
    orig = ClusterCreator._fused_frames_device
    monkeypatch.setattr(
        ClusterCreator, "_fused_frames_device",
        lambda self: calls.append(1) or orig(self))
    cc.run()
    assert calls


def test_fused_device_feed_routing_respects_hbm_budget(tmp_path_factory):
    """Routing boundaries: the device feed engages for corpora inside
    kmeans_hbm_cache_mb (even beyond the HOST in-memory budget, where the
    fit previously streamed) and declines above it or when disabled."""
    base = tmp_path_factory.mktemp("fused_dev_budget")
    fixtures.make_workspace(base)

    def creator(**over):
        cfg = fixtures.test_config(
            base, fused_pipeline=True, kmeans_mode="full", **over)
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        return ClusterCreator(cfg)

    assert creator()._use_fused_device_feed()
    # beyond the host in-memory budget but inside HBM: device feed wins over
    # streaming (kmeans_inmemory_budget_mb=0 would previously force a stream)
    assert creator(kmeans_inmemory_budget_mb=0)._use_fused_device_feed()
    # above the HBM budget: declined (falls to the streaming loop); the
    # tiny corpus is ~1.9 MB of frames, so a 1 MB budget is exceeded
    assert not creator(kmeans_hbm_cache_mb=1)._use_fused_device_feed()
    # budget 0 disables the device feed outright
    assert not creator(kmeans_hbm_cache_mb=0)._use_fused_device_feed()
    # normalize needs the host-side degenerate-clip screen
    assert not creator(normalize=True)._use_fused_device_feed()


def test_fused_pipeline_byte_identical_to_staged(tmp_path_factory):
    """config.fused_pipeline=True skips mel artifacts entirely; centroids and
    token artifacts must be byte-identical to the staged pipeline."""
    staged = tmp_path_factory.mktemp("staged_pl")
    fused = tmp_path_factory.mktemp("fused_pl")
    for base, fused_flag in ((staged, False), (fused, True)):
        fixtures.make_workspace(base)
        # kmeans_mode='full' so the fused arm takes the all-device feed and
        # the tokenizer consumes the resident-frames handoff (the train
        # split must still be byte-identical to the staged pipeline's)
        cfg = fixtures.test_config(base, fused_pipeline=fused_flag,
                                   kmeans_mode="full")
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        if not fused_flag:
            SpectrogramGenerator(cfg).run()
        cluster = ClusterCreator(cfg)
        cluster.run()
        resident = cluster.take_resident_frames()
        if fused_flag:
            assert resident is not None  # the device feed must have engaged
        SpecTokenizer(cfg, resident_frames=resident).run()
        if fused_flag:  # no mel artifacts were written
            assert not (Path(cfg.dest_spec_path) / "train").exists()

    np.testing.assert_array_equal(
        np.load(staged / "output" / "centroids.npy"),
        np.load(fused / "output" / "centroids.npy"),
    )
    for split in ("train", "validation"):
        a = sorted((staged / "tokenized_audio" / split).glob("*.npy"))
        b = sorted((fused / "tokenized_audio" / split).glob("*.npy"))
        assert [f.name for f in a] == [f.name for f in b] and a
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.load(fa), np.load(fb))


def test_wave_feed_amplitude_screen(tmp_path_factory, monkeypatch):
    """A finite but absurd-amplitude clip (|s| ~ 1e17 overflows f32 in the
    in-program |spec|^2) is dropped by the wave feed's host screen, exactly
    as the staged paths' spectrogram NaN/Inf screen would drop it — one
    such clip would otherwise write NaN rows into the HBM frame corpus and
    poison every centroid (r4 review)."""
    base = tmp_path_factory.mktemp("amp_screen")
    fixtures.make_workspace(base)
    # python backend: the rig injects via _decode_one (the native path
    # applies the same amax screen to its decoded batch rows)
    cfg = fixtures.test_config(base, fused_pipeline=True,
                               audio_backend="python")
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    gen = SpectrogramGenerator(cfg)
    ytids = sorted(gen.data_split["train"])[:4]
    bad = ytids[1]
    orig = SpectrogramGenerator._decode_one

    def rigged(self, ytid):
        wave = orig(self, ytid)
        if ytid == bad and wave is not None:
            wave = wave * np.float32(1e17)
        return wave

    monkeypatch.setattr(SpectrogramGenerator, "_decode_one", rigged)
    seen = []
    for batch, lengths, row_ytids in gen.iter_wave_batches(ytids):
        seen += [y for y in row_ytids if y is not None]
        assert np.isfinite(batch).all()
        assert np.abs(batch).max() < 1e8
    assert bad not in seen
    assert set(seen) == set(ytids) - {bad}


def test_fused_device_feed_respects_streaming_always(tmp_path_factory):
    """kmeans_streaming='always' is an explicit user bound on device memory
    and must win over the all-device feed routing (r4 review: the feed used
    to be consulted first, silently ignoring the override)."""
    base = tmp_path_factory.mktemp("stream_always")
    fixtures.make_workspace(base)
    DatasetSplitter(
        fixtures.test_config(base)
    ).create_split_file(AudiosetMetadataProcessor(fixtures.test_config(base)))
    cfg = fixtures.test_config(base, fused_pipeline=True, kmeans_mode="full",
                               kmeans_streaming="always")
    cc = ClusterCreator(cfg)
    assert not cc._use_fused_device_feed()
    cfg2 = fixtures.test_config(base, fused_pipeline=True, kmeans_mode="full")
    assert ClusterCreator(cfg2)._use_fused_device_feed()


def test_melfrontend_decodes_i16_wire(rng):
    """MelFrontend accepts int16 PCM rows directly (decode_wire applied
    inside _spectrum): every DSP consumer — staged specs, fused tokenizer,
    cluster feed — shares one wire-decode rule, so pipeline routing can
    never change numerics."""
    import jax.numpy as jnp

    from audio_tokens_tpu.ops.mel import MelFrontend

    fe = MelFrontend(sample_rate=22050, n_mels=32, n_fft=256, hop_length=128,
                     clip_samples=22050, normalize=False)
    pcm = rng.integers(-32768, 32767, (2, fe.padded_len)).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    out_i16 = np.asarray(fe(jnp.asarray(pcm)))
    out_f32 = np.asarray(fe(jnp.asarray(f32)))
    np.testing.assert_array_equal(out_i16, out_f32)


def test_assign_resident_sparse_gathers_only_covered(rng):
    """Incremental reruns with few clips left gather just the covered
    clips' row ranges instead of assigning the whole resident corpus
    (r4 review); both routes must produce identical tokens."""
    from types import SimpleNamespace

    from audio_tokens_tpu.ops.vq import l2_normalize

    d, k = 16, 12
    cents = np.asarray(l2_normalize(
        rng.standard_normal((k, d)).astype(np.float32)))
    frames = np.asarray(l2_normalize(
        rng.standard_normal((400, d)).astype(np.float32)))
    manifest = {f"y{i}": (i * 40, 40) for i in range(10)}
    stub = SimpleNamespace(centroids=cents, mesh=None)
    full = SpecTokenizer._assign_resident(
        stub, frames, manifest, [f"y{i}" for i in range(10)])
    sparse = SpecTokenizer._assign_resident(stub, frames, manifest, ["y3"])
    assert set(sparse) == {"y3"}
    np.testing.assert_array_equal(sparse["y3"], full["y3"])
    assert len(full) == 10 and all(len(v) == 40 for v in full.values())


def test_staged_capacity_pad_gates(tmp_path_factory, monkeypatch):
    """The staged in-memory fit adopts the device feed's capacity layout
    (n_valid set) ONLY when it helps: it must decline when the capacity
    rows exceed the host in-memory budget (short-clip corpora — the pad
    would defeat the budget that routed the run in-memory) and when
    max_points_per_centroid will subsample anyway (the gather discards
    the layout, so the pad is pure wasted allocation)."""
    import audio_tokens_tpu.processors.cluster_creator as cc_mod

    base = tmp_path_factory.mktemp("pad_gate")
    fixtures.make_workspace(base)
    cfg0 = fixtures.test_config(base, kmeans_mode="full",
                                kmeans_streaming="never")
    DatasetSplitter(cfg0).create_split_file(AudiosetMetadataProcessor(cfg0))
    SpectrogramGenerator(cfg0).run()

    seen = {}
    real_fit = cc_mod.kmeans_fit

    def spy_fit(x, *a, **kw):
        seen["n_valid"] = kw.get("n_valid")
        seen["rows"] = x.shape[0]
        return real_fit(x, *a, **kw)

    monkeypatch.setattr(cc_mod, "kmeans_fit", spy_fit)

    def run(**overrides):
        seen.clear()
        cfg = fixtures.test_config(base, kmeans_mode="full",
                                   kmeans_streaming="never", **overrides)
        return ClusterCreator(cfg).run()

    padded = run()
    assert seen["n_valid"] is not None and seen["rows"] > seen["n_valid"]

    plain = run(kmeans_inmemory_budget_mb=0)  # capacity exceeds host budget
    assert seen["n_valid"] is None
    np.testing.assert_allclose(plain, padded, rtol=1e-5, atol=1e-6)

    run(max_points_per_centroid=2)  # subsample discards the layout
    assert seen["n_valid"] is None
