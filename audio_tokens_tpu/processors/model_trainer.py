"""Stage 4: train a classifier on the tokenized (or raw-STFT) artifacts.

Stage-interface wrapper (``__init__(config)`` + ``run()``) around
``train.Trainer``, mirroring the reference's ModelTrainer stage contract
(reference: processors/model_trainer.py:24-64, run_pipeline.py:14).
"""

from __future__ import annotations

from audio_tokens_tpu.config import AudioTokensConfig
from audio_tokens_tpu.train.trainer import Trainer


class ModelTrainer(Trainer):
    pass


if __name__ == "__main__":
    import logging

    trainer = ModelTrainer(AudioTokensConfig.from_args())
    val_loss, val_metrics = trainer.run()
    logging.getLogger(__name__).info(
        "Final Validation Loss: %.4f, Final Validation mAP: %.4f",
        val_loss, val_metrics["mAP"],
    )
