from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter
from audio_tokens_tpu.processors.spectrogram_generator import SpectrogramGenerator
from audio_tokens_tpu.processors.cluster_creator import ClusterCreator
from audio_tokens_tpu.processors.spec_tokenizer import SpecTokenizer
from audio_tokens_tpu.processors.model_trainer import ModelTrainer

__all__ = [
    "AudiosetMetadataProcessor",
    "DatasetSplitter",
    "SpectrogramGenerator",
    "ClusterCreator",
    "SpecTokenizer",
    "ModelTrainer",
]
