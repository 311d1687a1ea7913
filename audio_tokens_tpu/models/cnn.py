"""2-layer CNN over the 2-D spectrogram
(reference: models/cnn_classifier.py:16-43: Conv3x3(32) -> ReLU -> MaxPool2 ->
Conv3x3(64) -> ReLU -> MaxPool2 -> flatten -> 256 -> num_classes).

Input is (B, T, n_mels) as produced by the raw-STFT dataset; NHWC layout with
a single channel (TPU-preferred layout — channels innermost feeds the MXU's
implicit im2col directly).

``compute_dtype`` casts activations and conv/dense compute to bf16 (params
stay f32; logits return f32), like the transformer's knob.  Measured on v5e
at B=64/T=1728: 47.4 -> 26.3 ms/step (1.8x).  Two reformulations of the
1-channel stem conv (whose K=9 contraction starves the MXU) were built and
measured UNPROFITABLE at bf16, so the model keeps XLA's native conv:
  * reshape+max pooling instead of reduce_window (scatter-free backward):
    62.8 vs 46.4 ms/step f32 — reduce_window's select-and-scatter is
    already the faster lowering here;
  * a banded-GEMM stem (concat 3 time-shifted rows -> one
    (B*T, 3M)@(3M, M*32) GEMM, algebraically exact to 5e-7): wins 39.1 vs
    46.9 at f32-mixed but LOSES at bf16 (30.7 vs 26.3) — its 21x useful-FLOP
    inflation outweighs the better MXU shape once the conv runs bf16.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class CNNClassifier(nn.Module):
    num_classes: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        # x: (B, T, M) -> NHWC
        cd = self.compute_dtype
        x = x.astype(cd)[..., None]
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=cd,
                            name="conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=cd,
                            name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(256, dtype=cd, name="fc1")(x))
        return nn.Dense(self.num_classes, dtype=cd,
                        name="fc2")(x).astype(jnp.float32)
