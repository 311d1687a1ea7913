"""Random-weight Conv1d feature expansion for frame vectors.

The reference optionally expands each (n_mels,) frame vector to
(n_mels * num_kernels,) with an *untrained*, randomly initialized
``nn.Conv1d(1, num_kernels, kernel_size, padding=kernel_size//2)`` before
clustering/tokenizing (reference: processors/cluster_creator.py:28-34,68-81
and processors/spec_tokenizer.py:92-104,115-121).

Fixes SURVEY.md §2.7.3: the reference instantiated the conv *twice* (once per
stage) and relied on global-RNG coincidence for the weights to agree.  Here
one ``ConvFeatures`` is derived deterministically from (seed, stage-name), so
the cluster and tokenize stages share weights by construction; weights can
also be saved next to the centroids for reuse at inference.

Init matches torch Conv1d's distribution (kaiming-uniform(a=sqrt(5)) =>
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) under JAX's PRNG.
Output ordering matches the reference reshape: mel-major
[m0k0, m0k1, ..., m0k{K-1}, m1k0, ...].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class ConvFeatures:
    def __init__(self, num_kernels: int, kernel_size: int, key: jax.Array):
        if kernel_size % 2 != 1:
            raise ValueError("kernel_size must be odd (reference assumes 'same' length)")
        self.num_kernels = num_kernels
        self.kernel_size = kernel_size
        fan_in = 1 * kernel_size
        bound = 1.0 / np.sqrt(fan_in)
        wk, bk = jax.random.split(key)
        # (out_channels, in_channels=1, width)
        self.weight = jax.random.uniform(
            wk, (num_kernels, 1, kernel_size), jnp.float32, -bound, bound
        )
        self.bias = jax.random.uniform(bk, (num_kernels,), jnp.float32, -bound, bound)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, frames: jax.Array) -> jax.Array:
        """(N, n_mels) -> (N, n_mels * num_kernels), mel-major ordering."""
        x = frames[:, None, :].astype(jnp.float32)  # (N, 1, n_mels)
        pad = self.kernel_size // 2
        out = jax.lax.conv_general_dilated(
            x,
            self.weight,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (N, K, n_mels)
        out = out + self.bias[None, :, None]
        n, k, m = out.shape
        return jnp.transpose(out, (0, 2, 1)).reshape(n, m * k)

    def state_dict(self) -> dict:
        return {"weight": np.asarray(self.weight), "bias": np.asarray(self.bias)}

    def load_state_dict(self, state: dict) -> None:
        self.weight = jnp.asarray(state["weight"])
        self.bias = jnp.asarray(state["bias"])
