"""Pallas fused VQ kernel vs brute force / XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_tokens_tpu.ops.pallas_vq import vq_assign_pallas
from audio_tokens_tpu.ops.vq import l2_normalize, vq_assign


def test_pallas_matches_bruteforce(rng):
    x = rng.standard_normal((300, 24)).astype(np.float32)
    c = rng.standard_normal((37, 24)).astype(np.float32)
    ours = np.asarray(vq_assign_pallas(x, c, tile_n=128))
    brute = ((x[:, None, :] - c[None]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(ours, brute)


def test_pallas_matches_xla_path(rng):
    x = rng.standard_normal((1000, 64)).astype(np.float32)
    c = rng.standard_normal((500, 64)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(vq_assign_pallas(x, c, tile_n=256)), vq_assign(x, c, chunk=250)
    )


def test_pallas_fused_normalize(rng):
    x = (rng.standard_normal((256, 32)) * 5).astype(np.float32)
    c = rng.standard_normal((16, 32)).astype(np.float32)
    fused = np.asarray(vq_assign_pallas(x, c, normalize=True, tile_n=128))
    manual = vq_assign(np.asarray(l2_normalize(x)), c)
    np.testing.assert_array_equal(fused, manual)


def test_pallas_ragged_shapes(rng):
    # N not multiple of tile, K not multiple of 128, d not multiple of 128
    x = rng.standard_normal((517, 40)).astype(np.float32)
    c = rng.standard_normal((130, 40)).astype(np.float32)
    ours = np.asarray(vq_assign_pallas(x, c, tile_n=256))
    brute = ((x[:, None, :] - c[None]) ** 2).sum(-1).argmin(1)
    assert ours.shape == (517,)
    np.testing.assert_array_equal(ours, brute)


def test_pallas_tie_break_low_index():
    c = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
    x = np.array([[1.0, 0.0]], np.float32)
    assert int(vq_assign_pallas(x, c, tile_n=8)[0]) == 0


def test_vq_assign_fused_sharded_matches_unsharded(rng):
    """The pipeline's VQ router: sharded (8-dev mesh) == unsharded == manual,
    through both the XLA and (interpreted) Pallas local paths."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from audio_tokens_tpu.ops.vq import l2_normalize, vq_assign, vq_assign_fused

    x = (rng.random((1001, 24)) - 0.5).astype(np.float32)  # non-divisible N
    c = (rng.random((17, 24)) - 0.5).astype(np.float32)
    expect = vq_assign(np.asarray(l2_normalize(jnp.asarray(x))), c)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    got_xla = vq_assign_fused(x, c, mesh=mesh, normalize=True,
                              use_pallas=False, chunk=32)
    np.testing.assert_array_equal(got_xla, expect)

    got_pallas = vq_assign_fused(x, c, mesh=mesh, normalize=True,
                                 use_pallas=True, interpret=True)
    np.testing.assert_array_equal(got_pallas, expect)

    got_single = vq_assign_fused(x, c, mesh=None, normalize=True)
    np.testing.assert_array_equal(got_single, expect)


def test_vq_pallas_chunked_k_matches_bruteforce(rng):
    """K spanning multiple centroid chunks (running argmin across chunks),
    including +inf padding rows and low-index tie-breaks."""
    from audio_tokens_tpu.ops import pallas_vq

    x = (rng.random((300, 24)) - 0.5).astype(np.float32)
    k = 1000  # > 2 chunks at k_tile=384 below
    c = (rng.random((k, 24)) - 0.5).astype(np.float32)
    c[777] = c[111]  # duplicate across chunks: tie must pick index 111
    x[5] = c[111]
    got = np.asarray(pallas_vq._vq_pallas_jit(
        jnp.asarray(x), jnp.asarray(c), False, True, 128, 384))
    brute = ((x[:, None, :] - c[None]) ** 2).sum(-1).argmin(1)
    np.testing.assert_array_equal(got, brute)
    assert got[5] == 111


def test_vq_pallas_16k_vocab_interpret(rng):
    from audio_tokens_tpu.ops.pallas_vq import fits_vmem, vq_assign_pallas
    from audio_tokens_tpu.ops.vq import vq_assign

    assert fits_vmem(16384, 64)  # the north-star vocab is on the fused path
    x = (rng.random((64, 16)) - 0.5).astype(np.float32)
    c = (rng.random((16384, 16)) - 0.5).astype(np.float32)
    got = vq_assign_pallas(x, c, normalize=True, interpret=True)
    from audio_tokens_tpu.ops.vq import l2_normalize
    expect = vq_assign(np.asarray(l2_normalize(jnp.asarray(x))), c)
    np.testing.assert_array_equal(np.asarray(got), expect)
