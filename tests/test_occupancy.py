"""Occupancy grid: cell math, frustum masking, renderer integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autolabel_tpu.core.rays import convert_pose
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.render.occupancy import OccupancyGrid, OccupancyGridConfig
from autolabel_tpu.render.renderer import RenderOptions, render_rays
from tests.synthetic import look_at_cv


@pytest.fixture(scope='module')
def small_field():
    config = FieldConfig(encoding='freq',
                         hidden_dim=32,
                         hidden_dim_color=32,
                         hidden_dim_semantic=8,
                         geo_feat_dim=7,
                         semantic_classes=2,
                         bound=1.0)
    field = Field(config)
    return field, field.init(jax.random.PRNGKey(0))


def test_cell_roundtrip():
    grid = OccupancyGrid(OccupancyGridConfig(resolution=16), bound=2.0)
    centers = grid.cell_centers()
    assert centers.shape == (16 ** 3, 3)
    idx = grid.cell_indices(centers)
    expect = jnp.stack(jnp.meshgrid(*([jnp.arange(16)] * 3),
                                    indexing='ij'), -1).reshape(-1, 3)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(expect))


def test_update_tracks_density(small_field):
    field, params = small_field
    grid = OccupancyGrid(OccupancyGridConfig(resolution=8), bound=1.0)
    grid.update(field, params)
    density = np.asarray(grid.density)
    assert density.shape == (8, 8, 8)
    assert np.isfinite(density).all()
    assert (density >= 0).all()


def test_mark_untrained_grid():
    grid = OccupancyGrid(OccupancyGridConfig(resolution=16), bound=1.0)
    # One camera at +x looking at the origin (OpenCV convention), through
    # the reference pose chain into ngp space.
    T_WC_cv = look_at_cv(np.array([2.0, 0.0, 0.0]), np.zeros(3))
    T_CW = np.linalg.inv(T_WC_cv)
    pose_ngp = convert_pose(T_CW)
    grid.mark_untrained_grid(pose_ngp[None], (20.0, 20.0, 16.0, 12.0),
                             (32, 24))
    trained = np.asarray(grid.trained)
    # Some cells visible, some not (a single narrow camera can't see the
    # whole cube).
    assert trained.any()
    assert not trained.all()
    # The cube center must be visible from a camera looking straight at it.
    assert trained[8, 8, 8]


def test_renderer_masks_empty_cells(small_field):
    field, params = small_field
    n = 4
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    dn = jnp.ones((n, 1))
    options = RenderOptions(num_steps=16)

    r = 8
    empty = (jnp.zeros((r, r, r)), jnp.ones((r, r, r), bool), 0.01)
    out = render_rays(field, params, o, d, dn, options=options,
                      occupancy=empty)
    # Everything masked: zero weights, white background, zero depth.
    np.testing.assert_allclose(np.asarray(out['weights_sum']), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out['image']), 1.0, atol=1e-6)

    full = (jnp.full((r, r, r), 10.0), jnp.ones((r, r, r), bool), 0.01)
    out_full = render_rays(field, params, o, d, dn, options=options,
                           occupancy=full)
    out_none = render_rays(field, params, o, d, dn, options=options)
    np.testing.assert_allclose(np.asarray(out_full['image']),
                               np.asarray(out_none['image']), atol=1e-6)


def test_shrink_near_far_brackets_occupied_span():
    """Rays through a known occupied slab get [near, far] tightened to
    it (with a one-probe margin); rays through empty space keep the
    full AABB interval."""
    from autolabel_tpu.render.renderer import (ray_aabb_intersect,
                                               shrink_near_far)
    bound = 1.0
    r = 64
    density = np.zeros((r, r, r), np.float32)
    # Occupied slab: x in [0.25, 0.5] (world), full y/z extent.
    x_lo, x_hi = int((0.25 + 1) / 2 * r), int((0.5 + 1) / 2 * r)
    density[x_lo:x_hi] = 1.0
    occupancy = (jnp.asarray(density), jnp.ones((r, r, r), bool), 0.01)

    rays_o = jnp.asarray([[-1.0, 0.0, 0.0], [-1.0, 0.9, 0.9]], jnp.float32)
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    near, far = ray_aabb_intersect(rays_o, rays_d, bound)
    n2, f2 = shrink_near_far(occupancy, rays_o, rays_d, near, far, bound)
    n2, f2 = np.asarray(n2), np.asarray(f2)
    # Ray 0 enters the AABB at x=-1 => slab at t in [1.25, 1.5].
    assert 1.0 <= n2[0, 0] <= 1.3
    assert 1.45 <= f2[0, 0] <= 1.75
    # Ray 1 also crosses the slab (slab spans full y/z): same bracket.
    assert f2[1, 0] - n2[1, 0] < np.asarray(far - near)[1, 0]

    # Fully empty grid: interval unchanged.
    empty = (jnp.zeros((r, r, r)), jnp.ones((r, r, r), bool), 0.01)
    n3, f3 = shrink_near_far(empty, rays_o, rays_d, near, far, bound)
    np.testing.assert_allclose(np.asarray(n3), np.asarray(near))
    np.testing.assert_allclose(np.asarray(f3), np.asarray(far))


def test_render_with_shrink_matches_geometry(small_field):
    """End-to-end: rendering with occupancy near/far shrink still
    composites a sane depth for a ray hitting the occupied region."""
    field, params = small_field
    bound = field.config.bound
    grid = OccupancyGrid(OccupancyGridConfig(resolution=64), bound)
    grid.update(field, params)
    occupancy = (*grid.state(), grid.config.threshold)

    rays_o = jnp.asarray([[0.0, 0.0, -1.5]], jnp.float32)
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    dn = jnp.ones((1, 1), jnp.float32)
    out_shrunk = render_rays(field, params, rays_o, rays_d, dn,
                             options=RenderOptions(num_steps=64),
                             occupancy=occupancy)
    out_full = render_rays(field, params, rays_o, rays_d, dn,
                           options=RenderOptions(
                               num_steps=64, occupancy_near_far=False),
                           occupancy=occupancy)
    # Both paths see the same surface; shrunk sampling must not move the
    # composited depth materially.
    d1 = float(np.asarray(out_shrunk['depth'])[0])
    d2 = float(np.asarray(out_full['depth'])[0])
    if d2 > 0.05:  # the random small_field may be near-empty
        assert abs(d1 - d2) < 0.15
    assert np.isfinite(np.asarray(out_shrunk['image'])).all()
