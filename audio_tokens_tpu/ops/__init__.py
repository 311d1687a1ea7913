from audio_tokens_tpu.ops.mel import (
    MelFrontend,
    amplitude_to_db,
    hann_window,
    mel_filterbank,
    reflect_pad_clip,
)
from audio_tokens_tpu.ops.vq import l2_normalize, pairwise_sqdist, vq_assign
from audio_tokens_tpu.ops.kmeans import KMeans, kmeans_fit
from audio_tokens_tpu.ops.conv_features import ConvFeatures

__all__ = [
    "MelFrontend",
    "amplitude_to_db",
    "hann_window",
    "mel_filterbank",
    "reflect_pad_clip",
    "l2_normalize",
    "pairwise_sqdist",
    "vq_assign",
    "KMeans",
    "kmeans_fit",
    "ConvFeatures",
]
