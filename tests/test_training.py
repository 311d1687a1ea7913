"""Trainer tests: every model family trains end-to-end on the synthetic
corpus; loss decreases; checkpoints save; DP sharding works on the 8-device
mesh."""

import json
from pathlib import Path

import numpy as np
import pytest

from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
from audio_tokens_tpu.processors.model_trainer import ModelTrainer
from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from tests import fixtures


@pytest.fixture(scope="module")
def artifacts_ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("train_ws")
    fixtures.make_workspace(base)
    cfg = fixtures.test_config(base)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    return base


def _train_cfg(base, **kw):
    defaults = dict(epochs=2, training_batch_size=8, learning_rate=3e-3)
    defaults.update(kw)
    return fixtures.test_config(base, **defaults)


@pytest.mark.parametrize(
    "model_type,dataset_type",
    [
        ("simple", "TokenizedSpecDataset"),
        ("lstm", "TokenizedSpecDataset"),
        ("bert", "TokenizedSpecDataset"),
        ("cnn", "RawSTFTDataset"),
        ("baseline", "RawSTFTFlatDataset"),
    ],
)
def test_all_model_families_train(artifacts_ws, model_type, dataset_type):
    cfg = _train_cfg(
        artifacts_ws,
        model_type=model_type,
        dataset_type=dataset_type,
        hidden_size=32,
        num_layers=1,
        epochs=1,
        save_best_checkpoint=False,
    )
    val_loss, val_metrics = ModelTrainer(cfg).run()
    assert np.isfinite(val_loss)
    assert 0.0 <= val_metrics["mAP"] <= 1.0


def test_training_reduces_loss(artifacts_ws):
    cfg = _train_cfg(artifacts_ws, model_type="simple", epochs=8,
                     save_best_checkpoint=False)
    trainer = ModelTrainer(cfg)
    train_loader, _ = __import__(
        "audio_tokens_tpu.data.datasets", fromlist=["DataLoaderCreator"]
    ).DataLoaderCreator(cfg).get_dataloaders()
    params, opt_state = trainer._init_state(train_loader)
    train_step, _ = trainer._build_steps()
    first_loss = last_loss = None
    step = 0
    for epoch in range(cfg.epochs):
        params, opt_state, step, loss, _ = trainer._train_epoch(
            train_step, params, opt_state, train_loader, epoch, step
        )
        if first_loss is None:
            first_loss = loss
        last_loss = loss
    assert last_loss < first_loss


def test_checkpoint_saved_and_restorable(artifacts_ws):
    cfg = _train_cfg(artifacts_ws, model_type="simple", epochs=1)
    trainer = ModelTrainer(cfg)
    trainer.run()
    ckpt_dir = Path(cfg.checkpoint_dir) / "no-wandb-best"
    assert (ckpt_dir / "meta.json").exists()
    meta = json.loads((ckpt_dir / "meta.json").read_text())
    assert meta["step"] > 0

    from audio_tokens_tpu.train.checkpoint import load_params

    restored = load_params(cfg.checkpoint_dir, "no-wandb-best", trainer._final_params)
    leaves = np.asarray(
        __import__("jax").tree_util.tree_leaves(restored)[0]
    )
    assert np.isfinite(leaves).all()


def test_dp_sharded_training_runs(artifacts_ws):
    """batch 8 over the 8-device mesh: mesh must be picked up, loss finite."""
    cfg = _train_cfg(artifacts_ws, model_type="simple", epochs=1,
                     training_batch_size=8, save_best_checkpoint=False)
    trainer = ModelTrainer(cfg)
    val_loss, _ = trainer.run()
    assert trainer.mesh is not None, "expected DP mesh with 8 CPU devices"
    assert np.isfinite(val_loss)


def test_partial_batch_masked(artifacts_ws):
    """Batch size that doesn't divide the dataset: padded rows must not leak
    into metrics (predictions count == dataset size)."""
    cfg = _train_cfg(artifacts_ws, model_type="simple", epochs=1,
                     training_batch_size=7, save_best_checkpoint=False)
    trainer = ModelTrainer(cfg)
    val_loss, val_metrics = trainer.run()
    assert np.isfinite(val_loss)


def test_parallel_loader_matches_single_threaded(artifacts_ws):
    """num_workers>1 must yield byte-identical batches in identical order."""
    from audio_tokens_tpu.data.datasets import BatchLoader, TokenizedSpecDataset
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor

    cfg = fixtures.test_config(artifacts_ws)
    meta = AudiosetMetadataProcessor(cfg)
    ds = TokenizedSpecDataset(cfg, meta, split="train")
    single = BatchLoader(ds, 4, shuffle=True, seed=1, num_workers=1)
    multi = BatchLoader(ds, 4, shuffle=True, seed=1, num_workers=4)
    got_s = list(single.batches(epoch=2))
    got_m = list(multi.batches(epoch=2))
    assert len(got_s) == len(got_m) > 0
    for bs, bm in zip(got_s, got_m):
        assert bs["n_valid"] == bm["n_valid"]
        np.testing.assert_array_equal(bs["inputs"], bm["inputs"])
        np.testing.assert_array_equal(bs["lengths"], bm["lengths"])
        np.testing.assert_array_equal(bs["labels"], bm["labels"])


def test_parallel_loader_propagates_errors_and_cleans_up(artifacts_ws):
    from audio_tokens_tpu.data.datasets import BatchLoader, TokenizedSpecDataset
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor

    cfg = fixtures.test_config(artifacts_ws)
    meta = AudiosetMetadataProcessor(cfg)
    ds = TokenizedSpecDataset(cfg, meta, split="train")
    loader = BatchLoader(ds, 4, shuffle=False, num_workers=4)

    orig = ds.load_features
    def boom(idx):
        if idx == 5:
            raise OSError("corrupt artifact")
        return orig(idx)
    ds.load_features = boom
    with pytest.raises(OSError, match="corrupt artifact"):
        list(loader.batches(epoch=0))
    ds.load_features = orig
    # early abandon must not deadlock
    it = loader.batches(epoch=0)
    next(it)
    it.close()
