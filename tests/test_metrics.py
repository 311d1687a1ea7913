import numpy as np
import pytest
from sklearn.metrics import average_precision_score

from audio_tokens_tpu.utils.metrics import (
    MetricsCalculator,
    binary_average_precision,
    macro_mean_average_precision,
)


@pytest.mark.parametrize("n,seed", [(50, 0), (200, 1), (1000, 2)])
def test_binary_ap_matches_sklearn(n, seed):
    rng = np.random.default_rng(seed)
    y = (rng.random(n) < 0.3).astype(float)
    if y.sum() == 0:
        y[0] = 1.0
    s = rng.random(n)
    assert binary_average_precision(y, s) == pytest.approx(
        average_precision_score(y, s), abs=1e-12
    )


def test_binary_ap_with_ties_matches_sklearn():
    rng = np.random.default_rng(3)
    y = (rng.random(500) < 0.2).astype(float)
    s = rng.integers(0, 5, 500).astype(float)  # heavy ties
    assert binary_average_precision(y, s) == pytest.approx(
        average_precision_score(y, s), abs=1e-12
    )


def test_macro_map_skips_positive_free_classes():
    rng = np.random.default_rng(4)
    labels = (rng.random((100, 8)) < 0.2).astype(float)
    labels[:, 3] = 0.0  # class with no positives must be excluded
    preds = rng.random((100, 8))
    expected = np.mean(
        [
            average_precision_score(labels[:, i], preds[:, i])
            for i in range(8)
            if labels[:, i].sum() > 0
        ]
    )
    assert macro_mean_average_precision(labels, preds) == pytest.approx(expected, abs=1e-12)


def test_metrics_calculator_batched_interface():
    rng = np.random.default_rng(5)
    labels = (rng.random((64, 6)) < 0.3).astype(float)
    preds = rng.random((64, 6))
    chunks = np.array_split(np.arange(64), 5)
    out = MetricsCalculator().compute_metrics(
        [preds[c] for c in chunks], [labels[c] for c in chunks]
    )
    assert out["mAP"] == pytest.approx(
        macro_mean_average_precision(labels, preds), abs=1e-12
    )


def test_perfect_and_zero():
    y = np.array([0, 0, 1, 1], dtype=float)
    assert binary_average_precision(y, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert macro_mean_average_precision(np.zeros((4, 3)), np.random.rand(4, 3)) == 0.0


class TestStreamingMAP:
    """Constant-memory histogram mAP vs the exact implementation."""

    def test_matches_exact_on_random_scores(self, rng):
        from audio_tokens_tpu.utils.metrics import (
            StreamingMAP, macro_mean_average_precision,
        )

        n, c = 4000, 20
        labels = (rng.random((n, c)) < 0.1).astype(np.float32)
        scores = rng.random((n, c)).astype(np.float32)
        exact = macro_mean_average_precision(labels, scores)
        acc = StreamingMAP(c, bins=8192)
        for i in range(0, n, 333):  # ragged incremental updates
            acc.update(labels[i : i + 333], scores[i : i + 333])
        approx = acc.result()["mAP"]
        assert abs(approx - exact) < 2e-3, (approx, exact)

    def test_tied_scores_grouped_like_exact(self):
        from audio_tokens_tpu.utils.metrics import (
            StreamingMAP, macro_mean_average_precision,
        )

        # scores quantized so binning is lossless -> results must be equal
        labels = np.array([[1], [0], [1], [0], [1], [0]], np.float32)
        scores = np.array([[0.75], [0.75], [0.5], [0.5], [0.25], [0.25]],
                          np.float32)
        acc = StreamingMAP(1, bins=4)
        acc.update(labels, scores)
        exact = macro_mean_average_precision(labels, scores)
        assert acc.result()["mAP"] == pytest.approx(exact, abs=1e-12)

    def test_memory_independent_of_stream_length(self, rng):
        from audio_tokens_tpu.utils.metrics import StreamingMAP

        acc = StreamingMAP(543, bins=2048)
        base = acc.pos.nbytes + acc.neg.nbytes
        for _ in range(20):
            labels = (rng.random((64, 543)) < 0.05).astype(np.float32)
            scores = rng.random((64, 543)).astype(np.float32)
            acc.update(labels, scores)
        assert acc.pos.nbytes + acc.neg.nbytes == base
        assert base < 20 * 2**20  # well under 20 MB for the 543-class config

    def test_empty_and_no_positive_classes(self):
        from audio_tokens_tpu.utils.metrics import StreamingMAP

        acc = StreamingMAP(3, bins=16)
        assert acc.result()["mAP"] == 0.0
        acc.update(np.zeros((4, 3)), np.random.default_rng(0).random((4, 3)))
        assert acc.result()["mAP"] == 0.0


def test_trainer_streaming_map_trains(tmp_path):
    """streaming_map_bins>0 through the full trainer: same learning outcome."""
    from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
    from audio_tokens_tpu.data.splitter import DatasetSplitter
    from audio_tokens_tpu.processors import (
        ClusterCreator, ModelTrainer, SpecTokenizer, SpectrogramGenerator,
    )
    from tests import fixtures

    fixtures.make_workspace(tmp_path, n_clips=10)
    cfg = fixtures.test_config(tmp_path, model_type="simple", epochs=2,
                               learning_rate=3e-3, streaming_map_bins=4096,
                               save_best_checkpoint=False)
    DatasetSplitter(cfg).create_split_file(AudiosetMetadataProcessor(cfg))
    SpectrogramGenerator(cfg).run()
    ClusterCreator(cfg).run()
    SpecTokenizer(cfg).run()
    val_loss, metrics = ModelTrainer(cfg).run()
    assert np.isfinite(val_loss) and 0.0 <= metrics["mAP"] <= 1.0
