"""Volumetric renderer: compositing math and the field output contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.render.renderer import (RenderOptions, _composite_weights,
                                           ray_aabb_intersect, render_rays,
                                           sample_pdf)


def test_aabb_intersect_through_origin():
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = ray_aabb_intersect(o, d, bound=1.0)
    np.testing.assert_allclose(near[0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(far[0, 0], 4.0, atol=1e-5)


def test_aabb_intersect_miss_clamps():
    o = jnp.array([[0.0, 5.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = ray_aabb_intersect(o, d, bound=1.0)
    assert float(far[0, 0]) >= float(near[0, 0])


def test_composite_weights_opaque_wall():
    # A single very dense sample absorbs everything after it.
    sigma = jnp.array([[0.0, 1000.0, 1000.0, 0.0]])
    deltas = jnp.full((1, 4), 0.1)
    w = _composite_weights(sigma, deltas)
    np.testing.assert_allclose(float(w[0, 1]), 1.0, atol=1e-4)
    assert float(w[0, 2]) < 1e-4
    np.testing.assert_allclose(float(w.sum()), 1.0, atol=1e-4)


def test_composite_weights_empty_space():
    w = _composite_weights(jnp.zeros((2, 8)), jnp.full((2, 8), 0.1))
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-7)


def test_sample_pdf_concentrates():
    z_mid = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, 0)
    weights = jnp.zeros((2, 9)).at[:, 4].set(1.0)
    out = sample_pdf(z_mid, weights, 16, jax.random.PRNGKey(0))
    assert out.shape == (2, 16)
    # Nearly all mass sits around bin 4 (z ~ 0.5).
    assert float(jnp.abs(out - 0.5).mean()) < 0.1


@pytest.fixture(scope='module')
def small_field():
    config = FieldConfig(encoding='freq',
                         hidden_dim=32,
                         hidden_dim_color=32,
                         hidden_dim_semantic=16,
                         geo_feat_dim=7,
                         semantic_classes=3,
                         bound=1.0)
    field = Field(config)
    params = field.init(jax.random.PRNGKey(0))
    return field, params


def test_render_output_contract(small_field):
    field, params = small_field
    n = 8
    o = jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, -2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    dn = jnp.ones((n, 1))
    out = render_rays(field, params, o, d, dn,
                      key=jax.random.PRNGKey(1),
                      options=RenderOptions(num_steps=32, perturb=True))
    assert out['image'].shape == (n, 3)
    assert out['depth'].shape == (n,)
    assert out['semantic'].shape == (n, 3)
    assert out['semantic_features'].shape == (n, 16)
    assert out['depth_variance'].shape == (n,)
    assert out['coordinates_map'].shape == (n, 3)
    assert out['weights_sum'].shape == (n,)
    for v in out.values():
        assert jnp.isfinite(v).all()
    assert (np.asarray(out['weights_sum']) <= 1.0 + 1e-4).all()


def test_render_with_upsampling(small_field):
    field, params = small_field
    n = 4
    o = jnp.zeros((n, 3)) + jnp.array([0.0, 0.0, -2.0])
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    dn = jnp.ones((n, 1))
    out = render_rays(field, params, o, d, dn,
                      key=jax.random.PRNGKey(1),
                      options=RenderOptions(num_steps=16, upsample_steps=16,
                                            perturb=True))
    assert out['image'].shape == (n, 3)
    assert jnp.isfinite(out['image']).all()


@pytest.mark.slow
def test_render_differentiable(small_field):
    field, params = small_field
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    dn = jnp.ones((1, 1))

    def loss(p):
        out = render_rays(field, p, o, d, dn,
                          options=RenderOptions(num_steps=16))
        return out['image'].sum() + out['depth'].sum()

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
