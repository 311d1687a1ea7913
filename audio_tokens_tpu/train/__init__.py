from audio_tokens_tpu.train.trainer import Trainer

__all__ = ["Trainer"]
