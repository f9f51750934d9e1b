"""Data-parallel training over the virtual 8-device CPU mesh.

Tiny shapes on purpose: the CI host is single-core and XLA's CPU
collective rendezvous aborts if 8 serialized replica computations exceed
its 40 s timeout. The full-size multi-chip path is exercised by
__graft_entry__.dryrun_multichip.
"""
import jax
import jax.numpy as jnp
import numpy as np

from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.parallel import batch_sharding, make_mesh, replicated
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import SimpleTrainer
import pytest

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


TINY_GRID = HashGridConfig(n_levels=4,
                           n_features=2,
                           log2_hashmap_size=12,
                           base_resolution=8,
                           per_level_scale=1.5)


def _tiny_field():
    return Field(
        FieldConfig(encoding='hg+freq',
                    hidden_dim=32,
                    hidden_dim_color=32,
                    hidden_dim_semantic=8,
                    geo_feat_dim=7,
                    semantic_classes=2,
                    bound=1.0,
                    grid=TINY_GRID))


def _tiny_batch(n):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return {
        'rays_o': np.zeros((n, 3), np.float32),
        'rays_d': d,
        'direction_norms': np.ones((n, 1), np.float32),
        'pixels': rng.random((n, 3)).astype(np.float32),
        'depth': rng.random(n).astype(np.float32),
        'semantic': rng.integers(-1, 2, n).astype(np.int32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_dp_train_step_runs_and_matches_single_device():
    mesh = make_mesh(8)
    field = _tiny_field()
    batch = _tiny_batch(64)

    def make(mesh):
        return SimpleTrainer('ngp',
                             field,
                             iters=1000,
                             loss_options=LossOptions(),
                             render_options=RenderOptions(num_steps=8),
                             workspace=None,
                             mesh=mesh,
                             seed=3)

    dp = make(mesh)
    single = make(None)
    for _ in range(2):
        dp.state, dp_losses = dp._train_step(dp.state,
                                             dp._device_batch(batch),
                                             dp._base_key)
        single.state, s_losses = single._train_step(
            single.state, single._device_batch(batch), single._base_key)
    # Same math, different partitioning: losses must agree closely.
    np.testing.assert_allclose(float(dp_losses['total']),
                               float(s_losses['total']),
                               rtol=1e-3)
    # Params stay replicated and finite.
    leaf = jax.tree.leaves(dp.state['params'])[0]
    assert jnp.isfinite(leaf).all()


def test_batch_sharding_layout():
    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    x = jax.device_put(np.zeros((64, 3), np.float32), sharding)
    assert x.sharding.is_equivalent_to(sharding, ndim=2)
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(8, 3)}


def test_dp_tp_step_matches_single_device():
    """DP x grid-TP: hash table sharded on its feature axis over 'model',
    rays over 'data' — loss and table gradients must match the
    single-device computation (gathers stay local per feature slice;
    XLA inserts the activation all-gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from autolabel_tpu.parallel import make_mesh_2d, tree_shardings
    from autolabel_tpu.render.renderer import render_rays
    from autolabel_tpu.train.losses import compute_losses

    mesh = make_mesh_2d(2, 2)
    field = _tiny_field()
    params = field.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(16).items()}
    options = RenderOptions(num_steps=8, perturb=False)  # deterministic

    def loss_fn(p, b):
        out = render_rays(field, p, b['rays_o'], b['rays_d'],
                          b['direction_norms'], options=options)
        loss, _ = compute_losses(out, b, LossOptions())
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    l_single, g_single = jax.jit(grad_fn)(params, batch)

    grid_shape = params['encoder']['grid'].shape
    pspecs = tree_shardings(mesh, params, grid_shape)
    bspecs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
    scalar = NamedSharding(mesh, P())
    jit_tp = jax.jit(grad_fn, in_shardings=(pspecs, bspecs),
                     out_shardings=(scalar, pspecs))
    p_tp = jax.device_put(params, pspecs)
    b_tp = jax.device_put(batch, bspecs)

    # The table really is split on the feature axis (F=2 over 2 devices).
    shard_shapes = {s.data.shape
                    for s in p_tp['encoder']['grid'].addressable_shards}
    assert shard_shapes == {(4, 4096, 1)}

    l_tp, g_tp = jit_tp(p_tp, b_tp)
    np.testing.assert_allclose(float(l_tp), float(l_single), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_tp['encoder']['grid']),
                               np.asarray(g_single['encoder']['grid']),
                               atol=1e-5)


def test_trainer_with_dp_tp_mesh():
    """SimpleTrainer on a ('data', 'model') mesh: the state's hash-table
    leaves (params/ema/Adam moments) shard on the feature axis, steps
    run, and the loss tracks the replicated-DP trainer's."""
    from autolabel_tpu.parallel import make_mesh_2d

    field = _tiny_field()
    batch = _tiny_batch(64)

    def make(mesh):
        return SimpleTrainer('ngp', field, iters=1000,
                             loss_options=LossOptions(),
                             render_options=RenderOptions(num_steps=8),
                             workspace=None, mesh=mesh, seed=3)

    tp = make(make_mesh_2d(4, 2))
    single = make(None)

    grid = tp.state['params']['encoder']['grid']
    assert {s.data.shape for s in grid.addressable_shards} == \
        {(4, 4096, 1)}

    for _ in range(2):
        tp.state, tp_losses = tp._train_step(
            tp.state, tp._device_batch(batch), tp._base_key)
        single.state, s_losses = single._train_step(
            single.state, single._device_batch(batch), single._base_key)
    np.testing.assert_allclose(float(tp_losses['total']),
                               float(s_losses['total']), rtol=1e-3)
    # Moments sharded too: the Adam mu tree mirrors the param shapes.
    mu_leaves = [leaf for leaf in jax.tree.leaves(tp.state['opt_state'])
                 if hasattr(leaf, 'shape') and leaf.shape == grid.shape]
    assert mu_leaves, 'expected grid-shaped optimizer moments'
    for leaf in mu_leaves:
        assert {s.data.shape for s in leaf.addressable_shards} == \
            {(4, 4096, 1)}


def test_dp_train_step_with_fused_heads():
    """The fused Pallas head stack (heads_impl='pallas') composes with
    the DP mesh: batch-sharded pallas_call partitions like any dense op
    and the losses match the single-device fused step."""
    import dataclasses
    mesh = make_mesh(8)
    field = Field(dataclasses.replace(_tiny_field().config,
                                      geo_feat_dim=15,
                                      heads_impl='pallas'))
    batch = _tiny_batch(64)

    def make(mesh):
        return SimpleTrainer('ngp', field, iters=1000,
                             loss_options=LossOptions(),
                             render_options=RenderOptions(num_steps=8),
                             workspace=None, mesh=mesh, seed=3)

    dp = make(mesh)
    single = make(None)
    assert field.fused_heads_available(dp.state['params'])  # not vacuous
    dp.state, dp_losses = dp._train_step(dp.state, dp._device_batch(batch),
                                         dp._base_key)
    single.state, s_losses = single._train_step(
        single.state, single._device_batch(batch), single._base_key)
    np.testing.assert_allclose(float(dp_losses['total']),
                               float(s_losses['total']), rtol=1e-3)
    assert jnp.isfinite(jax.tree.leaves(dp.state['params'])[0]).all()


def test_dp_tp_step_with_fused_heads():
    """DP x grid-TP with heads_impl='pallas': GSPMD resolves the
    feature-sharded encode into the (replicated-weight) pallas_call —
    loss and table grads still match single-device."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from autolabel_tpu.parallel import make_mesh_2d, tree_shardings
    from autolabel_tpu.render.renderer import render_rays
    from autolabel_tpu.train.losses import compute_losses

    mesh = make_mesh_2d(2, 2)
    field = Field(dataclasses.replace(_tiny_field().config,
                                      heads_impl='pallas'))
    params = field.init(jax.random.PRNGKey(0))
    assert field.fused_heads_available(params)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(16).items()}
    options = RenderOptions(num_steps=8, perturb=False)

    def loss_fn(p, b):
        out = render_rays(field, p, b['rays_o'], b['rays_d'],
                          b['direction_norms'], options=options)
        loss, _ = compute_losses(out, b, LossOptions())
        return loss

    grad_fn = jax.value_and_grad(loss_fn)
    l_single, g_single = jax.jit(grad_fn)(params, batch)
    pspecs = tree_shardings(mesh, params, params['encoder']['grid'].shape)
    bspecs = jax.tree.map(lambda _: batch_sharding(mesh), batch)
    jit_tp = jax.jit(grad_fn, in_shardings=(pspecs, bspecs),
                     out_shardings=(NamedSharding(mesh, P()), pspecs))
    l_tp, g_tp = jit_tp(jax.device_put(params, pspecs),
                        jax.device_put(batch, bspecs))
    np.testing.assert_allclose(float(l_tp), float(l_single), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_tp['encoder']['grid']),
                               np.asarray(g_single['encoder']['grid']),
                               rtol=2e-3, atol=1e-6)
