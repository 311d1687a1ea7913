from audio_tokens_tpu.utils.seeding import set_seed
from audio_tokens_tpu.utils.metrics import MetricsCalculator, macro_mean_average_precision

__all__ = ["set_seed", "MetricsCalculator", "macro_mean_average_precision"]
