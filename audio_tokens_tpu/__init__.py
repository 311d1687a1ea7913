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

from audio_tokens_tpu.config import AudioTokensConfig

__version__ = "0.1.0"

__all__ = ["AudioTokensConfig", "__version__"]
