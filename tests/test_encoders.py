"""Encoder correctness: frequency, spherical harmonics, hash grid."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autolabel_tpu.ops.encoders import (HashGridConfig, frequency_encode,
                                        hashgrid_encode, hashgrid_init,
                                        sh_encode)

SMALL = HashGridConfig(n_levels=4,
                       n_features=2,
                       log2_hashmap_size=10,
                       base_resolution=4,
                       per_level_scale=2.0)


def test_frequency_shapes_and_values():
    x = jnp.array([[0.25, 0.5, 1.0]])
    out = frequency_encode(x, 2)
    assert out.shape == (1, 12)
    # First frequency of the first dim: sin(pi * 0.25), cos(pi * 0.25).
    np.testing.assert_allclose(out[0, 0], np.sin(np.pi * 0.25), atol=1e-6)
    np.testing.assert_allclose(out[0, 2], np.cos(np.pi * 0.25), atol=1e-6)


def test_sh_norm_and_dc():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = sh_encode(d)
    assert out.shape == (2, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479, atol=1e-6)


def test_hashgrid_shapes():
    table = hashgrid_init(jax.random.PRNGKey(0), SMALL)
    assert table.shape == (4, 1024, 2)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    out = hashgrid_encode(table, x, SMALL)
    assert out.shape == (32, 8)
    assert jnp.isfinite(out).all()


def test_hashgrid_interpolation_continuity():
    """Output must be continuous in x (trilinear interpolation)."""
    table = hashgrid_init(jax.random.PRNGKey(0), SMALL) * 1e4  # O(1) values
    x = jnp.array([[0.3, 0.4, 0.5]])
    eps = 1e-5
    x2 = x + eps
    a = hashgrid_encode(table, x, SMALL)
    b = hashgrid_encode(table, x2, SMALL)
    assert jnp.abs(a - b).max() < 1e-2


def test_hashgrid_grad_flows_to_table():
    table = hashgrid_init(jax.random.PRNGKey(0), SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(t):
        return hashgrid_encode(t, x, SMALL).sum()

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert jnp.abs(g).sum() > 0
    # Each point touches 8 corners per level; weights sum to 1 per level.
    np.testing.assert_allclose(float(g.sum()),
                               16 * SMALL.n_levels * SMALL.n_features,
                               rtol=1e-4)


def test_hashgrid_corners_exact():
    """At an exact grid vertex the encoding equals the table entry."""
    cfg = HashGridConfig(n_levels=1,
                         n_features=2,
                         log2_hashmap_size=10,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(2), cfg)
    # Vertex (1, 2, 3) of the level-0 grid (res 4 -> dense stride 5).
    x = jnp.array([[1 / 4, 2 / 4, 3 / 4]])
    out = hashgrid_encode(table, x, cfg)
    idx = 1 + 5 * (2 + 5 * 3)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(table[0, idx]),
                               atol=1e-6)


def test_rows_and_lanes_paths_agree():
    from autolabel_tpu.ops.encoders import _encode_lanes, _encode_rows
    cfg = HashGridConfig(n_levels=3,
                         n_features=8,
                         log2_hashmap_size=10,
                         base_resolution=4,
                         per_level_scale=3.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))
    np.testing.assert_allclose(np.asarray(_encode_rows(table, x, cfg)),
                               np.asarray(_encode_lanes(table, x, cfg)),
                               atol=1e-6, rtol=1e-5)


def test_tpu_grid_preset():
    from autolabel_tpu.ops.encoders import TPU_GRID
    # Same parameter budget as the reference 16 x 2^19 x 2 table.
    assert TPU_GRID.n_levels * TPU_GRID.table_size * TPU_GRID.n_features \
        == 16 * 2 ** 19 * 2
    assert TPU_GRID.resolutions[0] == 16
    assert 1500 <= TPU_GRID.resolutions[-1] <= 2600


def test_desired_resolution_scale():
    cfg = HashGridConfig.from_desired_resolution(2 ** 18)
    res = cfg.resolutions
    assert res[0] == 16
    assert abs(res[-1] - 2 ** 18) / 2 ** 18 < 0.01


def test_stochastic_corners_unbiased():
    """Mean of stochastic-corner encodes over many keys converges to the
    exact trilinear interpolation (both wide-row and narrow layouts)."""
    for n_features in (8, 2):
        cfg = HashGridConfig(n_levels=2,
                             n_features=n_features,
                             log2_hashmap_size=8,
                             base_resolution=4,
                             per_level_scale=2.0)
        table = hashgrid_init(jax.random.PRNGKey(5), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(6), (16, 3))
        exact = np.asarray(hashgrid_encode(table, x, cfg))

        n_draws = 4000
        acc = np.zeros_like(exact)
        for i in range(n_draws):
            k = jax.random.PRNGKey(1000 + i)
            acc += np.asarray(hashgrid_encode(table, x, cfg, key=k))
        mean = acc / n_draws
        # Table values are U(-1e-4, 1e-4); MC error ~ 1e-4/sqrt(n_draws).
        np.testing.assert_allclose(mean, exact, atol=6e-6)


def test_stochastic_corner_rows_are_table_rows():
    """Each stochastic encode output is exactly one gathered table row
    per level (weight 1), i.e. a member of the 8-corner support."""
    cfg = HashGridConfig(n_levels=1,
                         n_features=8,
                         log2_hashmap_size=8,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(8), (32, 3))
    out = np.asarray(hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(9)))
    rows = np.asarray(table[0])
    for row in out:
        dists = np.abs(rows - row[None]).max(axis=1)
        assert dists.min() < 1e-7


def test_stochastic_exact_levels_unbiased_and_exact_on_fine():
    """exact_levels keeps the finest levels exactly trilinear while the
    coarse levels remain unbiased (both layouts)."""
    for n_features in (8, 2):
        cfg = HashGridConfig(n_levels=3,
                             n_features=n_features,
                             log2_hashmap_size=8,
                             base_resolution=4,
                             per_level_scale=2.0)
        table = hashgrid_init(jax.random.PRNGKey(11), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(12), (8, 3))
        exact = np.asarray(hashgrid_encode(table, x, cfg))
        fine = slice((cfg.n_levels - 1) * n_features, None)

        out = np.asarray(hashgrid_encode(table, x, cfg,
                                         key=jax.random.PRNGKey(13),
                                         n_samples=2, exact_levels=1))
        # Finest level matches the exact interpolation bit-for-bit.
        np.testing.assert_allclose(out[:, fine], exact[:, fine], atol=1e-7)

        acc = np.zeros_like(exact)
        n_draws = 3000
        for i in range(n_draws):
            acc += np.asarray(
                hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(i),
                                n_samples=1, exact_levels=1))
        np.testing.assert_allclose(acc / n_draws, exact, atol=8e-6)
