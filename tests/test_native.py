"""Native ray-batch kernel vs the numpy fallback (exact parity)."""
import numpy as np
import pytest

from autolabel_tpu.core import rays


@pytest.fixture
def rotation():
    return np.linalg.qr(
        np.random.default_rng(0).normal(size=(3, 3)))[0]


@pytest.mark.skipif(rays._raybatch is None,
                    reason="native extension not built "
                    "(python setup.py build_ext --inplace)")
def test_native_matches_numpy(rotation):
    idx = np.arange(48 * 36)
    d_n, n_n = rays.compute_directions(rotation, idx, 48, 30.0, 30.0,
                                       24.0, 18.0)
    saved = rays._raybatch
    try:
        rays._raybatch = None
        d_p, n_p = rays.compute_directions(rotation, idx, 48, 30.0, 30.0,
                                           24.0, 18.0)
    finally:
        rays._raybatch = saved
    np.testing.assert_allclose(d_n, d_p, atol=1e-5)
    np.testing.assert_allclose(n_n, n_p, atol=1e-5)


@pytest.mark.skipif(rays._raybatch is None,
                    reason="native extension not built")
def test_native_jitter_determinism(rotation):
    """Same RNG seed -> identical jittered rays in both implementations."""
    idx = np.arange(100)
    d_n, _ = rays.compute_directions(rotation, idx, 10, 8.0, 8.0, 5.0,
                                     5.0, rng=np.random.default_rng(7))
    saved = rays._raybatch
    try:
        rays._raybatch = None
        d_p, _ = rays.compute_directions(rotation, idx, 10, 8.0, 8.0, 5.0,
                                         5.0, rng=np.random.default_rng(7))
    finally:
        rays._raybatch = saved
    np.testing.assert_allclose(d_n, d_p, atol=1e-5)
