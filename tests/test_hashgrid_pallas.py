"""Pallas hash-grid kernel vs the XLA reference implementation.

These tests run the kernel in INTERPRET mode only: the compiled path
does not lower on the current Mosaic toolchain (its gather lowering
requires indices shaped like the operand, which for a hash-table lookup
forces a T-row tile whose index broadcast overflows VMEM — measured
round 2, see NOTES.md). Nothing exercises a compiled Pallas gather on
hardware; the production encode path is the XLA gather in
ops/encoders.py, which saturates the v5e gather engine."""
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
