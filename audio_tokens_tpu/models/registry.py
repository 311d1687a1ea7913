"""Model factory (reference: utils/model_utils.py:13-43): the same five
``model_type`` strings select the same architectures with the same config
fields."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.models.cnn import CNNClassifier
from audio_tokens_tpu.models.lstm import SimpleLSTMTokenClassifier
from audio_tokens_tpu.models.mlp import BaselineMLPClassifier
from audio_tokens_tpu.models.simple import SimpleTokenClassifier
from audio_tokens_tpu.models.transformer import TransformerClassifier

# What each model consumes: 'tokens' (int IDs), 'spec' (B,T,M), 'flat' (B,D)
_INPUT_KINDS = {
    "lstm": "tokens",
    "simple": "tokens",
    "bert": "tokens",
    "cnn": "spec",
    "baseline": "flat",
}


def model_input_kind(config: AudioTokensConfig) -> str:
    if config.model_type in ("lstm", "bert") and config.use_precomputed_embeddings:
        return "spec"  # raw-frame embeddings path (reference lstm :26-31)
    try:
        return _INPUT_KINDS[config.model_type]
    except KeyError:
        raise ValueError(f"Unknown model type: {config.model_type}") from None


def _resolve_lstm_backend(config: AudioTokensConfig) -> str:
    """'auto' -> the Pallas sequence kernel on a SINGLE TPU chip, XLA scan
    elsewhere.  pallas_call cannot be auto-partitioned by GSPMD, so under a
    multi-device DP mesh the jitted train step must use the scan (every
    other Pallas kernel here runs under an explicit shard_map instead)."""
    backend = getattr(config, "lstm_backend", "auto")
    if backend in ("pallas", "pallas_interpret") and config.lstm_remat_chunk > 0:
        # the remat scan replaces the recurrence entirely (models/lstm.py
        # routes remat_chunk>0 before the backend branch); an explicit Pallas
        # request must not silently run the XLA scan instead
        raise ValueError(
            f"lstm_backend='{backend}' is incompatible with "
            f"lstm_remat_chunk={config.lstm_remat_chunk}: chunked remat runs "
            "the XLA scan (the Pallas sequence kernel stores the per-step "
            "residuals remat exists to avoid); use lstm_backend='auto'/'xla' "
            "with remat, or lstm_remat_chunk=0 with the Pallas kernel")
    if backend in ("xla", "pallas", "pallas_interpret"):
        return backend
    if backend != "auto":
        # a typo must not silently degrade to the scan (the user believes
        # they ran the Pallas kernel) — same contract as
        # _resolve_transformer_attention below
        raise ValueError(
            f"lstm_backend must be 'auto', 'xla', 'pallas' or "
            f"'pallas_interpret', got '{backend}'")
    try:
        import jax

        return (
            "pallas"
            if jax.devices()[0].platform == "tpu" and jax.device_count() == 1
            else "xla"
        )
    except Exception:
        return "xla"


def _resolve_transformer_attention(config: AudioTokensConfig) -> str:
    """'auto' -> XLA attention.  The Pallas flash path exists as an
    explicit opt-in ('flash', TPU-only, deterministic passes) but was
    measured SLOWER inside the full model — interleaved in-process A/B at
    the full-clip shape: 8.98 vs 11.97 ms/batch fwd at B=8, 33.3 vs 48.9
    at B=32 (BASELINE.md) — XLA's fused attention beats the library kernel
    at these shapes even though the kernel wins a standalone attention
    microbench.  Kept as a knob for other shapes/versions; 'auto' never
    engages it."""
    impl = getattr(config, "transformer_attention", "auto")
    if impl in ("xla", "flash"):
        return impl
    if impl != "auto":
        raise ValueError(
            f"transformer_attention must be 'auto', 'xla' or 'flash', "
            f"got '{impl}'")
    return "xla"


def get_model(config: AudioTokensConfig) -> nn.Module:
    compute_dtype = jnp.dtype(config.compute_dtype)
    if config.model_type == "lstm":
        return SimpleLSTMTokenClassifier(
            vocab_size=config.vocab_size,
            embed_dim=config.lstm_embed_dim,
            hidden_dim=config.lstm_hidden_dim,
            num_layers=config.num_layers,
            num_classes=config.num_classes,
            dropout=config.dropout,
            lstm_backend=_resolve_lstm_backend(config),
            remat_chunk=config.lstm_remat_chunk,
        )
    elif config.model_type == "simple":
        return SimpleTokenClassifier(
            vocab_size=config.vocab_size,
            hidden_size=config.hidden_size,
            num_classes=config.num_classes,
        )
    elif config.model_type == "bert":
        return TransformerClassifier(
            vocab_size=config.vocab_size,
            num_layers=config.num_layers,
            num_classes=config.num_classes,
            hidden_size=config.hidden_size,
            max_position=config.transformer_max_position,
            dropout=config.dropout,
            compute_dtype=compute_dtype,
            attention_impl=_resolve_transformer_attention(config),
            remat_blocks=config.transformer_remat,
        )
    elif config.model_type == "cnn":
        return CNNClassifier(num_classes=config.num_classes,
                             compute_dtype=compute_dtype)
    elif config.model_type == "baseline":
        return BaselineMLPClassifier(num_classes=config.num_classes,
                                     compute_dtype=compute_dtype)
    else:
        raise ValueError(f"Unknown model type: {config.model_type}")
