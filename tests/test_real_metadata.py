"""Parse the REAL bundled AudioSet metadata assets (not synthetic fixtures).

The repo bundles the same public AudioSet ontology/segment files the
reference ships in its metadata/ dir (reference:
processors/audioset_metadata_processor.py:30-67 — 543 non-restricted classes
out of 632 ontology entries, 22,160 balanced-train ytids).
"""

from pathlib import Path

import pytest

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor

REPO = Path(__file__).resolve().parents[1]
BUNDLED = REPO / "metadata"

pytestmark = pytest.mark.skipif(
    not (BUNDLED / "ontology.json").exists(), reason="metadata not bundled"
)


def _real_config(tmp_path, **kw):
    # base_dir has no metadata/ dir, so config must fall back to the bundle
    return AudioTokensConfig(base_dir=str(tmp_path), **kw)


def test_config_falls_back_to_bundled_metadata(tmp_path):
    cfg = _real_config(tmp_path)
    assert cfg.ontology_json_file == str(BUNDLED / "ontology.json")
    assert cfg.csv_index_files == [str(BUNDLED / "balanced_train_segments.csv")]


def test_user_metadata_dir_wins(tmp_path):
    user = tmp_path / "metadata"
    user.mkdir()
    (user / "ontology.json").write_text("[]")
    cfg = _real_config(tmp_path)
    assert cfg.ontology_json_file == str(user / "ontology.json")
    # CSV not present under base_dir -> still the bundled one
    assert cfg.csv_index_files == [str(BUNDLED / "balanced_train_segments.csv")]


def test_real_ontology_543_dense_classes(tmp_path):
    meta = AudiosetMetadataProcessor(_real_config(tmp_path))
    assert meta.num_classes == 543
    # dense 0..542 in ontology file order
    assert sorted(meta.index_label) == list(range(543))
    assert meta.index_label[0] == "/m/09x0r"  # "Speech", first entry
    assert meta.label_name["/m/09x0r"] == "Speech"


def test_real_balanced_csv_22160_ytids(tmp_path):
    meta = AudiosetMetadataProcessor(_real_config(tmp_path))
    assert len(meta.get_all_ytids()) == 22160
    # every label index in range, at least one labeled clip
    counts = [len(meta.get_ytid_labels(y)) for y in meta.get_all_ytids()]
    assert max(counts) >= 1
    all_idx = {i for y in meta.get_all_ytids() for i in meta.get_ytid_labels(y)}
    assert all_idx <= set(range(543))


def test_real_eval_csv_parses(tmp_path):
    cfg = _real_config(tmp_path)
    cfg.csv_index_files = [str(BUNDLED / "eval_segments.csv")]
    meta = AudiosetMetadataProcessor(cfg)
    assert len(meta.get_all_ytids()) == 20371
