"""Training objective shared by the Trainer's step paths.

One definition of the multi-label BCE loss (reference:
processors/model_trainer.py:37,116 — ``BCEWithLogitsLoss`` over sigmoid
logits) consumed by three compiled-program shapes: per-step jit (GSPMD),
per-step shard_map (Pallas LSTM under DP), and the whole-epoch device-corpus
programs (train/device_epoch.py).  Padded batch rows carry weight 0 so the
loss exactly matches ragged-batch semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_loss_fn(model, use_lengths: bool):
    """Global weighted-mean BCE: (bce * row_w).sum() / max(row_w.sum()*C, 1).

    Inputs arrive in the minimized wire format (uint16 tokens / uint8
    labels) and are cast back on device.
    """

    def loss_fn(params, inputs, lengths, labels, row_w, key, deterministic):
        labels = labels.astype(jnp.float32)  # shipped uint8
        if jnp.issubdtype(inputs.dtype, jnp.integer):
            inputs = inputs.astype(jnp.int32)  # shipped uint16
        elif inputs.dtype != jnp.float32:
            # bf16 HBM-resident spec corpus rows (device_corpus_dtype): the
            # model always sees f32 — the only numerics change is the
            # storage rounding, independent of flax dtype promotion rules
            inputs = inputs.astype(jnp.float32)
        logits = model.apply(
            {"params": params},
            inputs,
            lengths=lengths if use_lengths else None,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": key},
        )
        bce = optax.sigmoid_binary_cross_entropy(logits, labels)  # (B, C)
        denom = jnp.maximum(row_w.sum() * labels.shape[1], 1.0)
        return (bce * row_w[:, None]).sum() / denom, logits

    return loss_fn


def make_local_loss(model, use_lengths: bool):
    """Per-device numerator/weight of the GLOBAL weighted-mean loss for
    shard_map programs (callers psum the numerator and the weight sum).
    Folds the device index into the dropout key to decorrelate dropout
    across the 'data' axis."""

    def local_loss(params, inputs, lengths, labels, row_w, key, deterministic):
        labels = labels.astype(jnp.float32)  # shipped uint8
        if jnp.issubdtype(inputs.dtype, jnp.integer):
            inputs = inputs.astype(jnp.int32)  # shipped uint16
        elif inputs.dtype != jnp.float32:
            # bf16 HBM-resident spec corpus rows (device_corpus_dtype): the
            # model always sees f32 — the only numerics change is the
            # storage rounding, independent of flax dtype promotion rules
            inputs = inputs.astype(jnp.float32)
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        logits = model.apply(
            {"params": params},
            inputs,
            lengths=lengths if use_lengths else None,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": key},
        )
        bce = optax.sigmoid_binary_cross_entropy(logits, labels)
        return (bce * row_w[:, None]).sum(), logits

    return local_loss
