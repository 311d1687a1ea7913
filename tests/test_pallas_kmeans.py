"""Pallas Lloyd-stats kernel vs direct numpy computation (interpret on CPU)."""

import numpy as np
import pytest

from audio_tokens_tpu.ops.kmeans import kmeans_fit
from audio_tokens_tpu.ops.pallas_kmeans import lloyd_stats_pallas


def numpy_stats(x, n_valid, centroids):
    x = x[:n_valid].astype(np.float64)
    c = centroids.astype(np.float64)
    d2 = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    a = d2.argmin(1)
    k = len(c)
    sums = np.zeros((k, c.shape[1]))
    counts = np.zeros(k)
    for j in range(k):
        sel = x[a == j]
        counts[j] = len(sel)
        if len(sel):
            sums[j] = sel.sum(0)
    return sums, counts, d2.min(1).sum()


@pytest.mark.parametrize("n,k,d,n_valid", [(300, 16, 24, 300), (512, 37, 40, 400)])
def test_stats_match_numpy(rng, n, k, d, n_valid):
    x = rng.standard_normal((n, d)).astype(np.float32)
    c = rng.standard_normal((k, d)).astype(np.float32)
    sums, counts, obj = lloyd_stats_pallas(x, n_valid, c, tile_n=128,
                                           interpret=True)
    esums, ecounts, eobj = numpy_stats(x, n_valid, c)
    np.testing.assert_array_equal(np.asarray(counts), ecounts)
    np.testing.assert_allclose(np.asarray(sums), esums, atol=1e-4)
    assert float(obj) == pytest.approx(eobj, rel=1e-5)


def test_kmeans_pallas_backend_matches_scan(rng):
    x = rng.standard_normal((700, 32)).astype(np.float32)
    init = x[:12].copy()
    c_scan, o_scan = kmeans_fit(x, 12, niter=4, init_centroids=init,
                                use_pallas=False)
    # interpret-mode pallas backend (CPU): route through the private jit
    from audio_tokens_tpu.ops import kmeans as km
    import jax.numpy as jnp

    n_pad = 768
    xp = np.concatenate([x, np.zeros((n_pad - 700, 32), np.float32)])
    c_pl, o_pl = km._kmeans_jit(
        jnp.asarray(xp), jnp.int32(700), jnp.asarray(init),
        4, 256, None, None, None, True, True,
    )
    np.testing.assert_allclose(np.asarray(c_pl), c_scan, atol=1e-4)
    assert float(o_pl) == pytest.approx(o_scan, rel=1e-5)
