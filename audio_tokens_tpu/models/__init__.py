from audio_tokens_tpu.models.mlp import BaselineMLPClassifier
from audio_tokens_tpu.models.cnn import CNNClassifier
from audio_tokens_tpu.models.simple import SimpleTokenClassifier
from audio_tokens_tpu.models.lstm import SimpleLSTMTokenClassifier
from audio_tokens_tpu.models.transformer import TransformerClassifier
from audio_tokens_tpu.models.registry import get_model, model_input_kind

__all__ = [
    "BaselineMLPClassifier",
    "CNNClassifier",
    "SimpleTokenClassifier",
    "SimpleLSTMTokenClassifier",
    "TransformerClassifier",
    "get_model",
    "model_input_kind",
]
