"""Full 4-stage pipeline driver (reference: run_pipeline.py:8-14).

Stage semantics and artifact contract match the reference: spectrograms ->
centroids -> tokens -> trained classifier, all under one shared config.  The
split manifest must exist first (``python -m audio_tokens_tpu.data.splitter``),
exactly as in the reference (README.md:143).
"""

import logging

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.processors import (
    ClusterCreator,
    ModelTrainer,
    SpecTokenizer,
    SpectrogramGenerator,
)

logger = logging.getLogger(__name__)


def main(config: AudioTokensConfig | None = None):
    config = config or AudioTokensConfig.from_args()
    if config.fused_pipeline:
        # clips never round-trip through mel .npy artifacts: clustering
        # streams wav->frames and the tokenizer runs the fused wav->tokens
        # program (token artifacts are byte-identical to the staged path)
        if (config.dataset_type != "TokenizedSpecDataset"
                or config.use_precomputed_embeddings):
            raise ValueError(
                "fused_pipeline=True writes no spectrogram artifacts, but "
                f"dataset_type={config.dataset_type!r} / "
                f"use_precomputed_embeddings={config.use_precomputed_embeddings} "
                "trains on raw spectrograms — run the staged pipeline for "
                "spec-consuming models (cnn/baseline/raw-embedding)"
            )
        logger.info("fused pipeline: skipping the spectrogram artifact stage")
    else:
        SpectrogramGenerator(config).run()
    cluster = ClusterCreator(config)
    cluster.run()
    # fused mode: if clustering built its frame corpus in HBM (the all-device
    # feed), the tokenize stage assigns train tokens straight from it — the
    # composed pipeline decodes the train audio exactly once
    SpecTokenizer(config,
                  resident_frames=cluster.take_resident_frames()).run()
    val_loss, val_metrics = ModelTrainer(config).run()
    logger.info(
        "Pipeline complete. Final Val Loss: %.4f, Val mAP: %.4f",
        val_loss, val_metrics["mAP"],
    )
    return val_loss, val_metrics


if __name__ == "__main__":
    main()
