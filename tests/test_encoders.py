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


@pytest.mark.slow
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


@pytest.mark.slow
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


SIMPLEX_CFG = HashGridConfig(n_levels=2,
                             n_features=8,
                             log2_hashmap_size=8,
                             base_resolution=4,
                             per_level_scale=2.0)


def test_simplex_corners_partition_of_unity():
    from autolabel_tpu.ops.encoders import _simplex_corners
    frac = jax.random.uniform(jax.random.PRNGKey(21), (3, 64))
    offsets, weights = _simplex_corners(frac)
    w = np.asarray(weights)
    assert (w >= -1e-7).all()
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-6)
    # Offsets form a monotone lattice path 0 -> (1,1,1) wherever the
    # corresponding weights are nonzero.
    o = np.asarray(offsets)
    nonzero = w > 1e-6
    for i in range(3):
        step = o[i + 1] - o[i]  # (3, N)
        mask = nonzero[i + 1]
        assert (step[:, mask] >= 0).all()


def test_simplex_exact_on_vertices_and_linear_on_diagonal():
    """Tetrahedral interpolation agrees with trilinear on cell vertices;
    along the main diagonal (all fractions equal) it is the straight
    lerp between the two diagonal corners (trilinear is cubic there —
    the interpolants legitimately differ off vertices/edges)."""
    cfg = HashGridConfig(n_levels=1,
                         n_features=8,
                         log2_hashmap_size=10,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(22), cfg)
    # Vertex (1, 2, 3) of the level-0 grid (res 4 -> dense stride 5).
    x = jnp.array([[1 / 4, 2 / 4, 3 / 4]])
    out = hashgrid_encode(table, x, cfg, interp='simplex')
    idx = 1 + 5 * (2 + 5 * 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(table[0, idx]),
                               atol=1e-6)
    # Main diagonal of cell (1, 2, 3): frac (t, t, t) -> (1-t) * c_000 +
    # t * c_111.
    c000 = np.asarray(table[0, idx])
    c111 = np.asarray(table[0, 2 + 5 * (3 + 5 * 4)])
    for t in (0.25, 0.5, 0.75):
        x = jnp.array([[(1 + t) / 4, (2 + t) / 4, (3 + t) / 4]])
        sim = hashgrid_encode(table, x, cfg, interp='simplex')
        np.testing.assert_allclose(np.asarray(sim[0]),
                                   (1 - t) * c000 + t * c111, atol=1e-6)


def test_simplex_matches_trilinear_on_edges():
    """Along cell edges (two fractions zero) both interpolants are the
    same 1D lerp."""
    cfg = HashGridConfig(n_levels=1,
                         n_features=8,
                         log2_hashmap_size=10,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(23), cfg)
    for axis in range(3):
        base = np.array([1.0, 2.0, 3.0])
        for t in (0.2, 0.7):
            p = base.copy()
            p[axis] += t
            x = jnp.asarray(p[None] / 4)
            tri = hashgrid_encode(table, x, cfg)
            sim = hashgrid_encode(table, x, cfg, interp='simplex')
            np.testing.assert_allclose(np.asarray(sim), np.asarray(tri),
                                       atol=1e-6)


def test_simplex_continuity():
    """C0 across tetrahedron and cell boundaries: nearby points give
    nearby encodings (including across frac-ordering switches)."""
    cfg = SIMPLEX_CFG
    table = hashgrid_init(jax.random.PRNGKey(24), cfg)
    rng = np.random.default_rng(25)
    # Points near tetrahedron boundaries: two coords equal, and near cell
    # faces: one coord integral.
    for _ in range(20):
        base = rng.uniform(0.05, 0.95, 3)
        i, j = rng.choice(3, 2, replace=False)
        base[j] = base[i]  # on a tetra boundary
        eps = 1e-5
        delta = rng.normal(size=3) * eps
        a = jnp.asarray(np.clip(base, 0, 1)[None])
        b = jnp.asarray(np.clip(base + delta, 0, 1)[None])
        ea = np.asarray(hashgrid_encode(table, a, cfg, interp='simplex'))
        eb = np.asarray(hashgrid_encode(table, b, cfg, interp='simplex'))
        # Features are U(-1e-4, 1e-4) and cells are ~1/32 wide: an O(eps)
        # move can change the encoding by O(eps * res * feat) only.
        assert np.abs(ea - eb).max() < 1e-6


def test_stochastic_simplex_unbiased():
    """Mean of stochastic simplex draws converges to the exact
    tetrahedral interpolation."""
    cfg = SIMPLEX_CFG
    table = hashgrid_init(jax.random.PRNGKey(26), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(27), (16, 3))
    exact = np.asarray(hashgrid_encode(table, x, cfg, interp='simplex'))

    n_draws = 4000
    acc = np.zeros_like(exact)
    for i in range(n_draws):
        k = jax.random.PRNGKey(3000 + i)
        acc += np.asarray(hashgrid_encode(table, x, cfg, key=k,
                                          interp='simplex'))
    np.testing.assert_allclose(acc / n_draws, exact, atol=6e-6)


def test_stochastic_simplex_rows_are_table_rows():
    cfg = HashGridConfig(n_levels=1,
                         n_features=8,
                         log2_hashmap_size=8,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(28), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(29), (32, 3))
    out = np.asarray(hashgrid_encode(table, x, cfg,
                                     key=jax.random.PRNGKey(30),
                                     interp='simplex'))
    rows = np.asarray(table[0])
    for row in out:
        dists = np.abs(rows - row[None]).max(axis=1)
        assert dists.min() < 1e-7


def test_stochastic_simplex_exact_levels():
    cfg = HashGridConfig(n_levels=3,
                         n_features=8,
                         log2_hashmap_size=8,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(31), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(32), (8, 3))
    exact = np.asarray(hashgrid_encode(table, x, cfg, interp='simplex'))
    fine = slice((cfg.n_levels - 1) * cfg.n_features, None)
    out = np.asarray(hashgrid_encode(table, x, cfg,
                                     key=jax.random.PRNGKey(33),
                                     n_samples=2, exact_levels=1,
                                     interp='simplex'))
    np.testing.assert_allclose(out[:, fine], exact[:, fine], atol=1e-7)


def test_simplex_grad_flows_to_table():
    cfg = SIMPLEX_CFG
    table = hashgrid_init(jax.random.PRNGKey(34), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(35), (16, 3))

    def loss(t):
        return hashgrid_encode(t, x, cfg, interp='simplex').sum()

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    # 4 corners per (point, level), weights summing to 1 per level.
    np.testing.assert_allclose(float(g.sum()),
                               16 * cfg.n_levels * cfg.n_features,
                               rtol=1e-4)


@pytest.mark.slow
def test_residual_estimator_unbiased_and_lower_variance():
    """The Rao-Blackwellized 2-row estimator (deterministic max-weight
    corner + residual draw) has the exact mean and, for simplex,
    substantially lower variance than the antithetic pair at the same
    gather-row cost."""
    cfg = SIMPLEX_CFG
    table = hashgrid_init(jax.random.PRNGKey(40), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(41), (16, 3))
    n_draws = 1200
    for interp in ('trilinear', 'simplex'):
        exact = np.asarray(hashgrid_encode(table, x, cfg, interp=interp))
        acc = np.zeros_like(exact)
        var_res = 0.0
        var_anti = 0.0
        for i in range(n_draws):
            k = jax.random.PRNGKey(5000 + i)
            r = np.asarray(hashgrid_encode(table, x, cfg, key=k,
                                           n_samples=2, interp=interp,
                                           residual=True))
            a = np.asarray(hashgrid_encode(table, x, cfg, key=k,
                                           n_samples=2, interp=interp))
            acc += r
            var_res += ((r - exact) ** 2).mean()
            var_anti += ((a - exact) ** 2).mean()
        np.testing.assert_allclose(acc / n_draws, exact, atol=1.2e-5)
        if interp == 'simplex':
            assert var_res < 0.75 * var_anti, (var_res, var_anti)
        else:
            assert var_res < 1.1 * var_anti, (var_res, var_anti)


def test_residual_requires_two_samples():
    cfg = SIMPLEX_CFG
    table = hashgrid_init(jax.random.PRNGKey(42), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(43), (4, 3))
    with pytest.raises(NotImplementedError, match='2-row'):
        hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(44),
                        n_samples=1, residual=True)


def test_residual_exact_levels():
    cfg = HashGridConfig(n_levels=3,
                         n_features=8,
                         log2_hashmap_size=8,
                         base_resolution=4,
                         per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(45), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(46), (8, 3))
    for interp in ('trilinear', 'simplex'):
        exact = np.asarray(hashgrid_encode(table, x, cfg, interp=interp))
        fine = slice((cfg.n_levels - 1) * cfg.n_features, None)
        out = np.asarray(hashgrid_encode(table, x, cfg,
                                         key=jax.random.PRNGKey(47),
                                         n_samples=2, exact_levels=1,
                                         interp=interp, residual=True))
        np.testing.assert_allclose(out[:, fine], exact[:, fine], atol=1e-7)


def test_sampled_backward_forward_is_exact():
    """sampled_backward mode's forward equals the exact interpolation
    bit-for-bit for both interpolants."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=8,
                         base_resolution=4, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    for interp in ('trilinear', 'simplex'):
        exact = hashgrid_encode(table, x, cfg, interp=interp)
        for rows in (1, 2):
            out = hashgrid_encode(table, x, cfg,
                                  key=jax.random.PRNGKey(2), interp=interp,
                                  sampled_backward=rows)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))


@pytest.mark.parametrize('interp', ['trilinear', 'simplex'])
@pytest.mark.parametrize('rows', [1, 2, (1, 2)])
@pytest.mark.slow
def test_sampled_backward_gradient_unbiased(interp, rows):
    """E over draws of the sampled-backward table gradient equals the
    exact-interpolation gradient (the estimator is unbiased)."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (12, 3))
    # A fixed nontrivial cotangent: loss = sum(out * c).
    c = jax.random.normal(jax.random.PRNGKey(5), (12, cfg.out_dim))

    def loss_exact(t):
        return (hashgrid_encode(t, x, cfg, interp=interp) * c).sum()

    g_exact = np.asarray(jax.grad(loss_exact)(table))

    def loss_sampled(t, k):
        return (hashgrid_encode(t, x, cfg, key=k, interp=interp,
                                sampled_backward=rows) * c).sum()

    grad_fn = jax.jit(jax.grad(loss_sampled))
    n_draws = 3000
    acc = np.zeros_like(g_exact)
    for i in range(n_draws):
        acc += np.asarray(grad_fn(table, jax.random.PRNGKey(100 + i)))
    mean = acc / n_draws
    # Cotangent entries are O(1); MC error ~ 1/sqrt(n_draws) per atom.
    np.testing.assert_allclose(mean, g_exact, atol=0.12)
    # The residual pair (rows=2) must beat the single draw's variance:
    # spot-check that per-draw deviation shrinks.
    if rows == 2:  # (tuple specs mix both estimators; skip the check)
        single = np.asarray(grad_fn(table, jax.random.PRNGKey(100)))
        assert np.abs(single - g_exact).max() < np.abs(g_exact).max() + 2.0


@pytest.mark.parametrize('interp,n_atoms', [('trilinear', 8),
                                            ('simplex', 4)])
def test_sampled_backward_exact_level_gradient(interp, n_atoms):
    """A per-level row count equal to the atom count scatters the EXACT
    gradient on that level (zero variance), while other levels stay
    sampled-unbiased. The exact level's gradient must match the true VJP
    of the interpolation for every draw."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (12, 3))
    c = jax.random.normal(jax.random.PRNGKey(5), (12, cfg.out_dim))

    def loss_exact(t):
        return (hashgrid_encode(t, x, cfg, interp=interp) * c).sum()

    g_exact = np.asarray(jax.grad(loss_exact)(table))

    def loss_sampled(t, k):
        return (hashgrid_encode(t, x, cfg, key=k, interp=interp,
                                sampled_backward=(n_atoms, 2)) * c).sum()

    grad_fn = jax.jit(jax.grad(loss_sampled))
    for seed in (100, 200, 300):
        g = np.asarray(grad_fn(table, jax.random.PRNGKey(seed)))
        # Level 0 (exact spec): identical to the true gradient per draw.
        np.testing.assert_allclose(g[0], g_exact[0], atol=1e-6)
    # Level 1 (sampled): still unbiased over draws.
    acc = np.zeros_like(g_exact)
    n_draws = 2000
    for i in range(n_draws):
        acc += np.asarray(grad_fn(table, jax.random.PRNGKey(1000 + i)))
    np.testing.assert_allclose(acc[1] / n_draws, g_exact[1], atol=0.12)


def test_sampled_backward_zero_position_cotangent():
    """No gradient leaks to x (sample positions carry no parameter
    gradients in this renderer; the VJP must return zero for x)."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=8,
                         base_resolution=4, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(6), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(7), (8, 3))

    def loss(pts):
        return hashgrid_encode(table, pts, cfg, key=jax.random.PRNGKey(8),
                               sampled_backward=2).sum()

    gx = np.asarray(jax.grad(loss)(x))
    np.testing.assert_array_equal(gx, np.zeros_like(gx))


def test_backward_points_forward_is_exact():
    """Point subsampling shapes only the backward; the forward stays the
    exact interpolation bit-for-bit."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=8,
                         base_resolution=4, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    for interp in ('trilinear', 'simplex'):
        exact = hashgrid_encode(table, x, cfg, interp=interp)
        out = hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(2),
                              interp=interp, sampled_backward=2,
                              backward_points=0.5)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))


@pytest.mark.parametrize('interp', ['trilinear', 'simplex'])
@pytest.mark.parametrize('frac', [0.5, 0.25])
@pytest.mark.slow
def test_backward_points_gradient_unbiased(interp, frac):
    """E over draws of the point-subsampled table gradient equals the
    exact gradient: systematic resampling from p ~ ||g_i|| with
    counts/(K*p) inverse-probability weights is unbiased."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (16, 3))
    c = jax.random.normal(jax.random.PRNGKey(5), (16, cfg.out_dim))

    def loss_exact(t):
        return (hashgrid_encode(t, x, cfg, interp=interp) * c).sum()

    g_exact = np.asarray(jax.grad(loss_exact)(table))

    def loss_sampled(t, k):
        return (hashgrid_encode(t, x, cfg, key=k, interp=interp,
                                sampled_backward=2,
                                backward_points=frac) * c).sum()

    grad_fn = jax.jit(jax.grad(loss_sampled))
    n_draws = 4000
    acc = np.zeros_like(g_exact)
    for i in range(n_draws):
        acc += np.asarray(grad_fn(table, jax.random.PRNGKey(100 + i)))
    np.testing.assert_allclose(acc / n_draws, g_exact, atol=0.2)


@pytest.mark.slow
def test_backward_points_concentrated_cotangent():
    """When the cotangent is nonzero on only a few points, a fractional
    point budget that covers them scatters (nearly) the full-batch
    estimator: zero-gradient points are never drawn, so no budget is
    wasted on them. Check a single draw's table gradient agrees with the
    full sampled-backward estimator under the same key to within the
    count-rounding noise."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3))
    # Only 4 of 64 points carry gradient mass.
    c = np.zeros((64, cfg.out_dim), np.float32)
    c[:4] = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (4, cfg.out_dim)))
    c = jnp.asarray(c)

    def loss_exact(t):
        return (hashgrid_encode(t, x, cfg, interp='simplex') * c).sum()

    g_exact = np.asarray(jax.grad(loss_exact)(table))

    def loss_frac(t, k):
        return (hashgrid_encode(t, x, cfg, key=k, interp='simplex',
                                sampled_backward=2,
                                backward_points=0.25) * c).sum()

    grad_frac = jax.jit(jax.grad(loss_frac))
    acc = np.zeros_like(g_exact)
    n_draws = 1500
    for i in range(n_draws):
        acc += np.asarray(grad_frac(table, jax.random.PRNGKey(200 + i)))
    np.testing.assert_allclose(acc / n_draws, g_exact, atol=0.25)


def test_backward_points_zero_cotangent_is_finite():
    """An all-zero cotangent (p falls back to uniform) must produce a
    zero, NaN-free table gradient."""
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (16, 3))

    def loss(t):
        return (hashgrid_encode(t, x, cfg, key=jax.random.PRNGKey(9),
                                sampled_backward=2,
                                backward_points=0.5) * 0.0).sum()

    g = np.asarray(jax.grad(loss)(table))
    np.testing.assert_array_equal(g, np.zeros_like(g))


def test_backward_points_validates_range():
    cfg = HashGridConfig(n_levels=2, n_features=8, log2_hashmap_size=6,
                         base_resolution=3, per_level_scale=2.0)
    table = hashgrid_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 3))
    with pytest.raises(ValueError):
        hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(0),
                        sampled_backward=2, backward_points=0.0)
    with pytest.raises(ValueError):
        hashgrid_encode(table, x, cfg, key=jax.random.PRNGKey(0),
                        sampled_backward=2, backward_points=1.5)
