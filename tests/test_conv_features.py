import numpy as np
import jax
import jax.numpy as jnp

from audio_tokens_tpu.ops.conv_features import ConvFeatures
from audio_tokens_tpu.utils.seeding import key_for


def numpy_conv1d_same(x, weight, bias):
    """Independent reference: per-row 1-D conv, 'same' padding, mel-major output."""
    n, m = x.shape
    k_out, _, ks = weight.shape
    pad = ks // 2
    xp = np.pad(x, ((0, 0), (pad, pad)))
    out = np.zeros((n, k_out, m), np.float64)
    for o in range(k_out):
        for t in range(m):
            out[:, o, t] = (xp[:, t : t + ks] * weight[o, 0]).sum(1) + bias[o]
    return out.transpose(0, 2, 1).reshape(n, m * k_out)


def test_conv_features_matches_numpy(rng):
    key = key_for(4242, "conv_features")
    cf = ConvFeatures(num_kernels=3, kernel_size=3, key=key)
    x = rng.standard_normal((20, 16)).astype(np.float32)
    ours = np.asarray(cf(x))
    expect = numpy_conv1d_same(
        x, np.asarray(cf.weight, np.float64), np.asarray(cf.bias, np.float64)
    )
    assert ours.shape == (20, 48)
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_stage_shared_weights_are_identical():
    """cluster + tokenize stages derive the SAME weights from (seed, name) —
    the deliberate fix of SURVEY.md §2.7.3."""
    a = ConvFeatures(4, 3, key_for(7, "conv_features"))
    b = ConvFeatures(4, 3, key_for(7, "conv_features"))
    np.testing.assert_array_equal(np.asarray(a.weight), np.asarray(b.weight))
    np.testing.assert_array_equal(np.asarray(a.bias), np.asarray(b.bias))
    c = ConvFeatures(4, 3, key_for(8, "conv_features"))
    assert not np.allclose(np.asarray(a.weight), np.asarray(c.weight))


def test_init_distribution_bounds():
    cf = ConvFeatures(64, 5, key_for(0, "x"))
    bound = 1.0 / np.sqrt(5)
    w = np.asarray(cf.weight)
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < 0.05


def test_state_dict_roundtrip(rng):
    cf = ConvFeatures(2, 3, key_for(1, "y"))
    state = cf.state_dict()
    cf2 = ConvFeatures(2, 3, key_for(99, "z"))
    cf2.load_state_dict(state)
    x = rng.standard_normal((5, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(cf(x)), np.asarray(cf2(x)))
