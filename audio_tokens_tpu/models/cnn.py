"""2-layer CNN over the 2-D spectrogram
(reference: models/cnn_classifier.py:16-43: Conv3x3(32) -> ReLU -> MaxPool2 ->
Conv3x3(64) -> ReLU -> MaxPool2 -> flatten -> 256 -> num_classes).

Input is (B, T, n_mels) as produced by the raw-STFT dataset; NHWC layout with
a single channel (TPU-preferred layout — channels innermost feeds the MXU's
implicit im2col directly).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class CNNClassifier(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # x: (B, T, M) -> NHWC
        x = x[..., None]
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)
