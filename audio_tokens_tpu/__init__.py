"""audio_tokens_tpu — a TPU-native audio-tokenization + classification framework.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of the
danavery/audio-tokens reference pipeline (see SURVEY.md):

  1. waveform -> mel-spectrogram     (fused DFT-as-GEMM + mel filterbank kernel)
  2. frames   -> K-means vocabulary  (jitted, mesh-sharded Lloyd's loop)
  3. clips    -> token-ID sequences  (pairwise-L2 argmin, fused with stage 1)
  4. tokens   -> multi-label classifier (MLP / CNN / mean-pool / biLSTM / BERT)

Public surface mirrors the reference's stage contract
(reference: run_pipeline.py:8-14):

    from audio_tokens_tpu import AudioTokensConfig
    from audio_tokens_tpu.processors import (
        SpectrogramGenerator, ClusterCreator, SpecTokenizer, ModelTrainer,
        DatasetSplitter, AudiosetMetadataProcessor,
    )
"""

import os as _os


def _enable_compilation_cache() -> None:
    """Persist XLA compilations to disk (first TPU compile of the fused
    frontend costs minutes on remote-compile setups; reruns should not).
    Opt out with AUDIO_TOKENS_NO_COMPILE_CACHE=1."""
    if _os.environ.get("AUDIO_TOKENS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "AUDIO_TOKENS_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "audio_tokens_tpu", "jax"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # never block import on cache setup
        pass


_enable_compilation_cache()

from audio_tokens_tpu.config import AudioTokensConfig

__version__ = "0.1.0"

__all__ = ["AudioTokensConfig", "__version__"]
