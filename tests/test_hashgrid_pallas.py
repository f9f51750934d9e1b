"""Pallas hash-grid kernel vs the XLA reference implementation
(interpret mode on CPU; the compiled path is exercised on real TPU by
bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autolabel_tpu.ops.encoders import (HashGridConfig, hashgrid_encode,
                                        hashgrid_init)
from autolabel_tpu.ops.hashgrid_pallas import (hashgrid_encode_pallas,
                                               supports)

SMALL = HashGridConfig(n_levels=4,
                       n_features=2,
                       log2_hashmap_size=12,
                       base_resolution=4,
                       per_level_scale=2.0)


def test_supports():
    assert supports(SMALL)
    assert supports(HashGridConfig())  # 2^19 x 2 fp32 = 4 MB


def test_matches_xla_reference():
    table = hashgrid_init(jax.random.PRNGKey(0), SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    expected = hashgrid_encode(table, x, SMALL)
    got = hashgrid_encode_pallas(table, x, SMALL, interpret=True)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6, rtol=1e-5)


def test_non_tile_multiple_and_boundaries():
    table = hashgrid_init(jax.random.PRNGKey(0), SMALL)
    # Points exactly on cell corners and domain boundaries.
    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.25, 0.5, 0.75],
                   [0.999999, 0.0, 0.5]])
    expected = hashgrid_encode(table, x, SMALL)
    got = hashgrid_encode_pallas(table, x, SMALL, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-6, rtol=1e-5)
