"""Exact macro mAP as a jittable device function.

The streaming Trainer fetches every batch's sigmoid matrix to the host and
computes mAP there (utils/metrics.py, sklearn-parity).  The device-resident
epoch programs (train/device_epoch.py) instead keep the whole epoch's
predictions in HBM and evaluate the metric ON device, so an epoch's
device->host traffic is two scalars — the TPU-native answer to the
reference's per-batch ``.cpu()`` prediction fetches
(reference: processors/model_trainer.py:93-94,120).

Numerics: identical threshold/tie semantics to
``utils.metrics.binary_average_precision`` (every run of equal scores is one
threshold group, precision evaluated at the group end).  Accumulation is
float32 — cumulative true-positive counts are integers, exact in f32 up to
2^24 rows; the final precision divisions differ from the numpy/f64 path only
in last-ulp rounding (tested to 1e-6 in tests/test_device_epoch.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def macro_map_device(scores: jax.Array, labels: jax.Array,
                     valid: jax.Array) -> jax.Array:
    """Macro mean-average-precision over classes with >=1 positive.

    scores (N, C) float in [0, 1]; labels (N, C) {0,1}-ish; valid (N,) bool
    marks real rows (padding rows are excluded exactly).  Returns a scalar
    f32; 0.0 when no class has a positive (matching
    utils.metrics.macro_mean_average_precision).
    """
    n = scores.shape[0]
    # Invalid rows: score -> -1 sorts them after every real sigmoid (>= 0)
    # and label -> 0 makes them a trailing zero-positive threshold group,
    # which contributes exactly nothing to AP (recall delta 0).
    s = jnp.where(valid[:, None], scores.astype(jnp.float32), -1.0).T  # (C, N)
    y = jnp.where(valid[:, None], labels > 0.5, False).T               # (C, N)

    order = jnp.argsort(-s, axis=1)  # stable; descending scores
    s_sorted = jnp.take_along_axis(s, order, axis=1)
    y_sorted = jnp.take_along_axis(y, order, axis=1).astype(jnp.float32)

    tps = jnp.cumsum(y_sorted, axis=1)  # exact: integer counts in f32
    n_pos = tps[:, -1]

    # Threshold groups = runs of equal scores; AP sums precision at each
    # group END weighted by the group's positive count:
    #   AP = (1/n_pos) * sum_i y_i * precision[group_end(i)]
    # group_end(i) = min{j >= i : score[j] != score[j+1]} via reverse cummin.
    is_last = jnp.concatenate(
        [s_sorted[:, 1:] != s_sorted[:, :-1],
         jnp.ones((s.shape[0], 1), bool)], axis=1,
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_last, idx[None, :], n - 1)
    group_end = jax.lax.cummin(cand[:, ::-1], axis=1)[:, ::-1]

    tps_end = jnp.take_along_axis(tps, group_end, axis=1)
    prec_end = tps_end / (group_end.astype(jnp.float32) + 1.0)
    ap = (y_sorted * prec_end).sum(axis=1) / jnp.maximum(n_pos, 1.0)

    has_pos = n_pos > 0
    return jnp.where(
        has_pos.any(),
        (ap * has_pos).sum() / jnp.maximum(has_pos.sum(), 1),
        0.0,
    )
