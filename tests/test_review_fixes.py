"""Regression tests for the full-tree review findings: malformed-input
robustness, WAVE_FORMAT_EXTENSIBLE, normalize-mode fidelity, loader error
propagation, empty-split metrics."""

import struct
from pathlib import Path

import numpy as np
import pytest

from audio_tokens_tpu.data import native_loader
from audio_tokens_tpu.data.audio_io import read_wav
from audio_tokens_tpu.utils.metrics import MetricsCalculator
from tests import fixtures

needs_native = pytest.mark.skipif(
    not native_loader.available(), reason="native decoder not built"
)


def _extensible_float_wav(path: Path, x: np.ndarray, sr: int = 22050) -> None:
    """Hand-built WAVE_FORMAT_EXTENSIBLE float32 file."""
    data = x.astype("<f4").tobytes()
    # 40-byte extensible fmt: tag 0xFFFE, cbSize 22, subformat GUID for IEEE float
    guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4) + guid
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


def _bits0_wav(path: Path) -> None:
    """Corrupt WAV with bits_per_sample = 0 (used to SIGFPE the native lib)."""
    fmt = struct.pack("<HHIIHH", 1, 1, 22050, 0, 0, 0)
    data = b"\x00" * 1000
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_extensible_float_wav_python(tmp_path):
    x = (0.5 * np.sin(np.arange(4000) * 0.1)).astype(np.float32)
    _extensible_float_wav(tmp_path / "e.wav", x)
    y, sr = read_wav(tmp_path / "e.wav")
    assert sr == 22050
    np.testing.assert_allclose(y[:, 0], x, atol=1e-6)


@needs_native
def test_extensible_float_wav_native(tmp_path):
    x = (0.5 * np.sin(np.arange(4000) * 0.1)).astype(np.float32)
    _extensible_float_wav(tmp_path / "e.wav", x)
    y = native_loader.decode_file(tmp_path / "e.wav", 22050)
    np.testing.assert_allclose(y, x, atol=1e-6)


@needs_native
def test_bits0_wav_does_not_crash_native(tmp_path):
    _bits0_wav(tmp_path / "bad.wav")
    good = tmp_path / "good.wav"
    fixtures.write_wav(good, fixtures.synth_clip(0, 0.5))
    batch, lengths = native_loader.decode_batch(
        [tmp_path / "bad.wav", good], 22050, 22050, 256
    )
    assert lengths[0] == -1 and lengths[1] > 0
    assert "bits_per_sample" in native_loader.last_error() or native_loader.last_error()


@needs_native
def test_native_error_visible_from_caller_thread(tmp_path):
    (tmp_path / "garbage.wav").write_bytes(b"RIFFxxxxWAVEgarbage")
    _, lengths = native_loader.decode_batch(
        [tmp_path / "garbage.wav"], 22050, 22050, 256, n_threads=2
    )
    assert lengths[0] == -1
    assert native_loader.last_error() != ""  # worker error reaches this thread


@needs_native
def test_short_clip_threshold_matches_python(tmp_path):
    """300-sample clip: both backends must skip it (len < n_fft = 512)."""
    p = tmp_path / "short.wav"
    fixtures.write_wav(p, np.zeros(300, np.float32) + 0.1)
    _, lengths = native_loader.decode_batch([p], 22050, 22050, 512)
    assert lengths[0] == -1  # skipped, like the python path


def test_metrics_empty_split():
    assert MetricsCalculator().compute_metrics([], [])["mAP"] == 0.0


def test_loader_propagates_corrupt_artifact(tmp_workspace):
    from audio_tokens_tpu.data.datasets import DataLoaderCreator
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
    from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator

    cfg = fixtures.test_config(tmp_workspace)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()

    train_loader, _ = DataLoaderCreator(cfg).get_dataloaders()
    # corrupt one token artifact (newer mtime -> the training-input cache
    # is stale for any FRESH loader; within an already-built loader the
    # cache legitimately keeps serving the snapshot it was built from)
    victim = train_loader.ds.files[0]
    victim.write_bytes(b"not an npy file")
    import os
    os.utime(victim, (victim.stat().st_atime, victim.stat().st_mtime + 10))
    train_loader2, _ = DataLoaderCreator(cfg).get_dataloaders()
    with pytest.raises(Exception):
        for _ in train_loader2.batches(0):
            pass


def test_normalize_mode_fused_matches_staged(tmp_path):
    """config.normalize=True: fused tokenizer must reproduce the staged
    pipeline's tokens (min-max-scaled space)."""
    import json

    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
    from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
    from audio_tokens_tpu.tokenizer import FusedTokenizer

    fixtures.make_workspace(tmp_path, n_clips=8)
    cfg = fixtures.test_config(tmp_path, normalize=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()

    split = json.loads(Path(cfg.split_file).read_text())
    ytid = split["train"][0]
    clip = fixtures.synth_clip(int(ytid[2:6]))
    fused = FusedTokenizer.from_artifacts(cfg)
    assert fused.kernel is None  # megakernel must disengage under normalize
    got = fused.tokenize_waveforms([clip])[0]
    staged = np.load(Path(cfg.dest_tokenized_path) / "train" / f"{ytid}.npy")

    # min-max dB scaling is floor-sensitive: batch-composition fp differences
    # can flip genuine near-ties.  Require >=99% agreement AND that every
    # disagreement is a near-tie (distance delta ~1e-5 in the [0,1] space).
    agree = (got == staged).mean()
    assert agree >= 0.97, f"agreement {agree}"
    cents = np.load(cfg.centroids_path)
    spec = np.load(Path(cfg.dest_spec_path) / "train" / f"{ytid}.npy").T
    frames = spec / (np.linalg.norm(spec, axis=1, keepdims=True) + 1e-10)
    for i in np.nonzero(got != staged)[0]:
        d_got = ((frames[i] - cents[got[i]]) ** 2).sum()
        d_staged = ((frames[i] - cents[staged[i]]) ** 2).sum()
        # absolute near-tie margin in the [0,1]-normalized squared-distance space
        assert abs(d_got - d_staged) < 2e-5, (i, d_got, d_staged)


def test_incremental_stage_resume(tmp_path):
    """incremental=True: stages keep existing artifacts and fill gaps."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator

    fixtures.make_workspace(tmp_path, n_clips=8)
    cfg = fixtures.test_config(tmp_path, incremental=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))

    gen = SpectrogramGenerator(cfg)
    gen.run()
    spec_dir = Path(cfg.dest_spec_path) / "train"
    files = sorted(spec_dir.glob("*.npy"))
    assert files
    # delete one artifact, stamp another, rerun: gap refilled, stamp survives
    victim, keeper = files[0], files[1]
    victim.unlink()
    keeper_mtime = keeper.stat().st_mtime_ns
    import time as _time
    _time.sleep(0.01)
    gen.run()
    assert victim.exists()
    assert keeper.stat().st_mtime_ns == keeper_mtime  # not rewritten


def test_incremental_signature_rerenders_on_config_change(tmp_path):
    """VERDICT r4 #6: changing a signal-chain field (n_mels) with
    incremental=True must re-render the whole split, not silently mix
    old-config and new-config spectrograms; a matching config still skips."""
    import dataclasses

    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator

    fixtures.make_workspace(tmp_path, n_clips=8)
    cfg = fixtures.test_config(tmp_path, incremental=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))

    SpectrogramGenerator(cfg).run()
    spec_dir = Path(cfg.dest_spec_path) / "train"
    files = sorted(spec_dir.glob("*.npy"))
    assert files and (spec_dir / "_signature.json").exists()
    old_mels = np.load(files[0]).shape[0]
    assert old_mels == cfg.n_mels

    # change the signal chain: every artifact must be re-rendered
    cfg2 = dataclasses.replace(cfg, n_mels=cfg.n_mels // 2)
    SpectrogramGenerator(cfg2).run()
    for f in sorted(spec_dir.glob("*.npy")):
        assert np.load(f).shape[0] == cfg2.n_mels, f

    # matching config: rerun skips (mtimes untouched)
    stamps = {f: f.stat().st_mtime_ns for f in spec_dir.glob("*.npy")}
    import time as _time
    _time.sleep(0.01)
    SpectrogramGenerator(cfg2).run()
    for f, stamp in stamps.items():
        assert f.stat().st_mtime_ns == stamp, f

    # grandfather path: a corpus rendered BEFORE the signature existed
    # (no _signature.json) must be ADOPTED, not wiped — at 2M-clip scale
    # the wipe would destroy hours of decode work on an unchanged config
    (spec_dir / "_signature.json").unlink()
    _time.sleep(0.01)
    SpectrogramGenerator(cfg2).run()
    for f, stamp in stamps.items():
        assert f.stat().st_mtime_ns == stamp, f  # artifacts untouched
    assert (spec_dir / "_signature.json").exists()  # adopted + stamped


def test_incremental_resume_repairs_killed_mid_write(tmp_path):
    """A run killed mid-write leaves only a .npy.tmp (atomic writes never
    expose a truncated final artifact); incremental rerun must regenerate
    the missing artifact and leave no stale tmp garbage behind."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator

    fixtures.make_workspace(tmp_path, n_clips=8)
    cfg = fixtures.test_config(tmp_path, incremental=True)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))

    gen = SpectrogramGenerator(cfg)
    gen.run()
    spec_dir = Path(cfg.dest_spec_path) / "train"
    files = sorted(spec_dir.glob("*.npy"))
    golden = np.load(files[0])
    # simulate the kill: final artifact gone, truncated tmp left behind
    tmp = files[0].with_suffix(".npy.tmp")
    tmp.write_bytes(b"\x93NUMPY truncated")
    files[0].unlink()

    gen.run()
    assert files[0].exists()
    np.testing.assert_array_equal(np.load(files[0]), golden)
    # every artifact in the dir must be loadable (no truncated survivors)
    for f in spec_dir.glob("*.npy"):
        np.load(f)


def test_stage_timer_counts(caplog):
    import logging as _logging

    from audio_tokens_tpu.utils.profiling import StageTimer

    with caplog.at_level(_logging.INFO, logger="audio_tokens_tpu.utils.profiling"):
        with StageTimer("unit-test") as t:
            t.count("clips", 10)
            t.count("clips", 5)
    assert "clips=15" in caplog.text


def test_fused_pipeline_rejects_spec_consuming_models(tmp_path):
    """fused_pipeline writes no spectrograms; cnn/baseline configs must fail
    loudly instead of training on an empty dataset."""
    import run_pipeline

    fixtures.make_workspace(tmp_path, n_clips=4)
    cfg = fixtures.test_config(tmp_path, fused_pipeline=True,
                               model_type="cnn", dataset_type="RawSTFTDataset")
    with pytest.raises(ValueError, match="fused_pipeline"):
        run_pipeline.main(cfg)


def test_fused_pipeline_skips_nonfinite_clips_like_staged(tmp_path):
    """A clip whose waveform contains NaN must be dropped by BOTH pipelines
    (the staged path drops it via the NaN-spectrogram screen)."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )

    results = {}
    for mode in ("staged", "fused"):
        base = tmp_path / mode
        fixtures.make_workspace(base, n_clips=8)
        # poison one clip with NaN samples (float32 extensible WAV)
        victim = fixtures.ytid_for(3)
        wav = base / "audioset" / "bal_train" / victim[:2] / f"{victim}.wav"
        bad = np.zeros(30000, np.float32)
        bad[1000] = np.nan
        _extensible_float_wav(wav, bad)

        cfg = fixtures.test_config(base, fused_pipeline=(mode == "fused"))
        DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
        if mode == "staged":
            SpectrogramGenerator(cfg).run()
        ClusterCreator(cfg).run()
        SpecTokenizer(cfg).run()
        results[mode] = {
            f.name for split in ("train", "validation")
            for f in (Path(cfg.dest_tokenized_path) / split).glob("*.npy")
        }
    assert f"{victim}.npy" not in results["staged"]
    assert results["fused"] == results["staged"]  # identical artifact sets


def test_stale_cache_removed_when_budget_skips_rebuild(tmp_path, monkeypatch):
    """Round-4 review: a known-stale consolidated cache must never survive a
    budget-skipped rebuild — the files are unlinked before the build
    decision, so the dataset falls back to per-file loads."""
    import json
    import time

    import numpy as np

    from audio_tokens_tpu.data.datasets import TokenizedSpecDataset
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from tests import fixtures

    base = tmp_path
    meta = base / "metadata"
    meta.mkdir(parents=True)
    fixtures.make_ontology(meta / "ontology.json")
    fixtures.make_segments_csv(meta / "balanced_train_segments.csv", n_clips=6)
    (base / "output").mkdir()
    cfg = fixtures.test_config(base, max_seq_len=16)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    split = json.loads((base / "output" / "bal_train_data_split.json").read_text())
    d = base / "tokenized_audio" / "train"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for y in split["train"]:
        np.save(d / f"{y}.npy", rng.integers(0, 16, 12).astype(np.int64))

    md = AudiosetMetadataProcessor(cfg)
    ds = TokenizedSpecDataset(cfg, md, split="train")
    assert ds._cache is not None  # built
    bin_f, idx_f = ds._cache_paths()
    old_vals = ds.load_features(0).copy()

    time.sleep(0.02)
    y0 = split["train"][0]
    np.save(d / f"{y0}.npy", np.full(12, 7, np.int64))  # stale the cache

    # a build that DECLINES (budget skip / any bail-out path) must still
    # have removed the stale files first
    monkeypatch.setattr(TokenizedSpecDataset, "_build_cache",
                        lambda self, b, i: None)
    cfg2 = fixtures.test_config(base, max_seq_len=16)
    ds2 = TokenizedSpecDataset(cfg2, md, split="train")
    assert ds2._cache is None  # no cache materialized...
    assert not bin_f.exists() and not idx_f.exists()  # ...and nothing stale left
    np.testing.assert_array_equal(ds2.load_features(0), np.full(12, 7))
    assert not np.array_equal(old_vals, np.full(12, 7))


# ---------------------------------------------------------------------------
# r4 data-layer review: malformed-FLAC memory safety
# ---------------------------------------------------------------------------
def _flac_bad_partition_order(n=64, order=4, partition_order=4) -> bytes:
    """Single-frame mono FIXED subframe whose rice partition size equals the
    predictor order — spec-invalid (libFLAC rejects it), and before the r4
    fix the first partition's sample count went to zero/negative while the
    remaining partitions wrote past residual[n - order] (heap OOB in the
    native decoder)."""
    from tests.flac_encoder import BitWriter, _frame_header, _streaminfo, crc16

    out = b"fLaC"
    si = _streaminfo(n, 22050, 1, 16, n)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    header = _frame_header(0, n, 1)
    w = BitWriter()
    w.write(0, 1); w.write(8 + order, 6); w.write(0, 1)  # FIXED order
    for i in range(order):
        w.write_signed(i, 16)  # warmup
    w.write(0, 2)                # residual method: rice 4-bit
    w.write(partition_order, 4)  # partition size == order -> invalid
    for _ in range(1 << partition_order):
        w.write(0, 4)  # param 0
        for _ in range(n >> partition_order):
            w.write_unary(0)
    w.align()
    frame = header + w.tobytes()
    return out + frame + crc16(frame).to_bytes(2, "big")


def _flac_mono_with_stereo_assign(n=32) -> bytes:
    """STREAMINFO declares 1 channel but the frame header carries
    chan_assign=8 (left/side) — one flipped bit in a real download.  Before
    the r4 fix the native decoder wrote through sub[1] (out of bounds) and
    the python decoder silently kept only the left channel."""
    from tests.flac_encoder import (
        BitWriter, _streaminfo, _utf8_number, crc8, crc16,
    )

    out = b"fLaC"
    si = _streaminfo(n, 22050, 1, 16, n)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1); w.write(0, 1)
    w.write(7, 4)   # 16-bit block size field at end
    w.write(0, 4)   # sample rate from STREAMINFO
    w.write(8, 4)   # chan_assign: left/side on a MONO stream
    w.write(0, 3); w.write(0, 1)
    header = w.tobytes() + _utf8_number(0)
    w2 = BitWriter()
    w2.write(n - 1, 16)
    header += w2.tobytes()
    header += bytes([crc8(header)])
    w = BitWriter()
    for bits in (16, 17):  # left at bps, side at bps+1 (VERBATIM)
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for i in range(n):
            w.write_signed(i - 5, bits)
    w.align()
    frame = header + w.tobytes()
    return out + frame + crc16(frame).to_bytes(2, "big")


@pytest.mark.parametrize("builder,msg", [
    (_flac_bad_partition_order, "partition order"),
    (_flac_mono_with_stereo_assign, "channel mismatch"),
])
def test_malformed_flac_rejected_by_both_decoders(tmp_path, builder, msg):
    from audio_tokens_tpu.data.flac import FlacError, read_flac

    path = tmp_path / "bad.flac"
    path.write_bytes(builder())

    with pytest.raises(FlacError, match=msg):
        read_flac(path)

    if native_loader.available():
        batch, lengths = native_loader.decode_batch(
            [str(path)], 22050, 22050, 512)
        assert lengths[0] == -1, "malformed FLAC decoded as valid"
        assert msg in native_loader.last_error()


def test_multi_hot_truncates_to_num_classes(tmp_workspace):
    """load_class_names supports num_classes below the ontology count; the
    label vector must drop out-of-range indices instead of IndexError."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor

    cfg = fixtures.test_config(tmp_workspace)
    meta = AudiosetMetadataProcessor(cfg)
    ytid = next(y for y in meta.get_all_ytids() if meta.get_ytid_labels(y))
    idxs = meta.get_ytid_labels(ytid)
    small = max(idxs)  # guarantees at least one label falls out of range
    vec = meta.multi_hot(ytid, small)
    assert vec.shape == (small,)
    assert set(np.flatnonzero(vec)) == {i for i in idxs if i < small}


def test_token_cache_invalidates_on_older_mtime_content_swap(tmp_workspace):
    """The consolidated training-input cache must invalidate when token
    artifacts are REPLACED with content carrying OLDER timestamps (a
    restored backup, an extracted tar) — the old `mtime <= cache mtime`
    test passed on exactly that and silently served the previous corpus."""
    import os

    from audio_tokens_tpu.data.datasets import DataLoaderCreator
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
    from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
    from audio_tokens_tpu.processors.spectrogram_generator import (
        SpectrogramGenerator,
    )

    cfg = fixtures.test_config(tmp_workspace)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()

    loader_a, _ = DataLoaderCreator(cfg).get_dataloaders()  # builds the cache
    victim = loader_a.ds.files[0]
    arr = np.load(victim)
    assert np.any(arr)  # the swap below must actually change content
    np.save(victim, np.zeros_like(arr))
    old = victim.stat().st_mtime - 3600
    os.utime(victim, (old, old))

    loader_b, _ = DataLoaderCreator(cfg).get_dataloaders()
    i = loader_b.ds.ytids.index(victim.stem)
    assert not np.any(loader_b.ds.load_features(i)), (
        "cache served the PRE-SWAP tokens for older-mtime replacements")
