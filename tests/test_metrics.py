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
