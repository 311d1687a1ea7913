import json

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter, load_split
from tests import fixtures


def test_ontology_dense_indices(tmp_workspace):
    cfg = fixtures.test_config(tmp_workspace)
    mp = AudiosetMetadataProcessor(cfg)
    # restricted entries skipped; dense 0..N-1 in file order
    assert mp.num_classes == fixtures.N_CLASSES
    assert sorted(mp.index_label.keys()) == list(range(fixtures.N_CLASSES))
    assert mp.label_index["/m/test000"] == 0
    assert "/m/restricted000" not in mp.label_index


def test_segment_parse_drops_restricted(tmp_workspace):
    cfg = fixtures.test_config(tmp_workspace)
    mp = AudiosetMetadataProcessor(cfg)
    assert len(mp.ytid_labels) == fixtures.N_CLIPS
    for ytid, labels in mp.ytid_labels.items():
        assert all(0 <= l < fixtures.N_CLASSES for l in labels)
        assert len(labels) >= 1  # restricted label dropped but >=1 real one


def test_multi_hot(tmp_workspace):
    cfg = fixtures.test_config(tmp_workspace)
    mp = AudiosetMetadataProcessor(cfg)
    ytid = mp.get_all_ytids()[0]
    vec = mp.multi_hot(ytid, cfg.num_classes)
    assert vec.shape == (cfg.num_classes,)
    assert set(vec[i] for i in mp.get_ytid_labels(ytid)) == {1.0}
    assert vec.sum() == len(mp.get_ytid_labels(ytid))


def test_split_deterministic_and_disjoint(tmp_workspace):
    cfg = fixtures.test_config(tmp_workspace)
    mp = AudiosetMetadataProcessor(cfg)
    DatasetSplitter(cfg).create_split_file(mp)
    split = load_split(cfg.split_file)
    train, val = split["train"], split["validation"]
    assert not set(train) & set(val)  # disjoint (reference tools/check_overlap.py)
    n_total = int(fixtures.N_CLIPS * cfg.dataset_ratio)
    assert len(train) + len(val) == n_total
    assert len(train) == int(n_total * (1 - cfg.validation_ratio))
    # deterministic under the same seed
    DatasetSplitter(cfg).create_split_file(mp)
    assert load_split(cfg.split_file) == split


def test_split_matches_reference_algorithm(tmp_workspace):
    """Same seeded-global-shuffle semantics as reference dataset_splitter.py:35-42."""
    import random

    cfg = fixtures.test_config(tmp_workspace, dataset_ratio=0.5)
    mp = AudiosetMetadataProcessor(cfg)
    DatasetSplitter(cfg).create_split_file(mp)
    split = load_split(cfg.split_file)

    ytids = mp.get_all_ytids()
    random.seed(cfg.random_seed)
    random.shuffle(ytids)
    size = int(len(ytids) * cfg.dataset_ratio)
    ytids = ytids[:size]
    cut = int(len(ytids) * (1 - cfg.validation_ratio))
    assert split["train"] == ytids[:cut]
    assert split["validation"] == ytids[cut:]
