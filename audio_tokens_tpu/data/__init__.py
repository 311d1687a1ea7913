from audio_tokens_tpu.data.metadata import AudiosetMetadataProcessor
from audio_tokens_tpu.data.splitter import DatasetSplitter

__all__ = ["AudiosetMetadataProcessor", "DatasetSplitter"]
