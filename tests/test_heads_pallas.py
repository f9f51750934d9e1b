"""Fused Pallas head stack (ops/heads_pallas.py) vs the XLA path.

Runs in interpret mode on CPU (the kernel compiles on TPU only); parity
covers the forward outputs AND the full gradient set — d(encode), the
extras block, and every head weight — since the backward is a custom
VJP with recompute + in-kernel dW accumulation across grid steps.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.ops.heads_pallas import (fused_heads, heads_reference,
                                            pack_head_weights, supported)

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow

GRID = HashGridConfig(n_levels=4, n_features=8, log2_hashmap_size=10,
                      base_resolution=8, per_level_scale=1.6)


def _field_and_inputs(n=300, semantic_classes=5, hidden_dim_semantic=64,
                      seed=0):
    field = Field(FieldConfig(encoding='hg+freq', hidden_dim=64,
                              hidden_dim_color=64,
                              hidden_dim_semantic=hidden_dim_semantic,
                              semantic_classes=semantic_classes,
                              grid=GRID))
    params = field.init(jax.random.PRNGKey(seed))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    A = jax.random.normal(k1, (n, GRID.n_levels * GRID.n_features),
                          jnp.float32) * 0.1
    freq = jax.random.uniform(k2, (n, 12), jnp.float32, -1.0, 1.0)
    sh = jax.random.normal(k3, (n, 16), jnp.float32) * 0.3
    B = jnp.zeros((n, 128), jnp.float32)
    B = B.at[:, :12].set(freq).at[:, 16:32].set(sh)
    return field, params, A, B


def test_supported_gate():
    field, params, _, _ = _field_and_inputs()
    assert supported(params, 12)
    assert not supported({'sigma_net': []}, 12)


def test_fused_heads_forward_parity():
    field, params, A, B = _field_and_inputs()
    packed = pack_head_weights(params, freq_dim=12)
    out1, feats, logits = fused_heads(packed, A, B)
    r1, rf, rl = heads_reference(params, 12, A, B)
    # bf16 matmuls both sides; identical contraction order up to
    # padding, so tolerances are tight-ish.
    np.testing.assert_allclose(out1[:, :4], r1[:, :4], rtol=2e-2,
                               atol=2e-3)
    np.testing.assert_allclose(feats[:, :rf.shape[1]], rf, rtol=2e-2,
                               atol=2e-3)
    np.testing.assert_allclose(logits[:, :rl.shape[1]], rl, rtol=2e-2,
                               atol=2e-3)
    # Padding lanes stay exactly zero (the layout invariant).
    assert float(jnp.abs(out1[:, 4:]).max()) == 0.0
    assert float(jnp.abs(feats[:, rf.shape[1]:]).max()) == 0.0
    assert float(jnp.abs(logits[:, rl.shape[1]:]).max()) == 0.0


def test_fused_heads_gradient_parity():
    field, params, A, B = _field_and_inputs(n=257)  # non-multiple of TILE

    def loss_fused(params, A, B):
        packed = pack_head_weights(params, freq_dim=12)
        out1, feats, logits = fused_heads(packed, A, B)
        return (jnp.sum(out1[:, 0] * 1e-3) + jnp.sum(out1[:, 1:4] ** 2)
                + jnp.sum(feats ** 2) * 0.1 + jnp.sum(logits ** 2) * 0.1)

    def loss_ref(params, A, B):
        out1, feats, logits = heads_reference(params, 12, A, B)
        return (jnp.sum(out1[:, 0] * 1e-3) + jnp.sum(out1[:, 1:4] ** 2)
                + jnp.sum(feats ** 2) * 0.1 + jnp.sum(logits ** 2) * 0.1)

    heads = {k: params[k] for k in ('sigma_net', 'color_net',
                                    'semantic_features', 'semantic_out')}
    gf = jax.grad(lambda h, A, B: loss_fused({**params, **h}, A, B),
                  argnums=(0, 1, 2))(heads, A, B)
    gr = jax.grad(lambda h, A, B: loss_ref({**params, **h}, A, B),
                  argnums=(0, 1, 2))(heads, A, B)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = max(float(jnp.abs(b).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2 * scale)


def test_fused_heads_wide_semantic():
    """The lseg-shaped config (512-d semantic features) packs and runs."""
    field, params, A, B = _field_and_inputs(n=130,
                                            hidden_dim_semantic=512)
    packed = pack_head_weights(params, freq_dim=12)
    out1, feats, logits = fused_heads(packed, A, B)
    r1, rf, rl = heads_reference(params, 12, A, B)
    np.testing.assert_allclose(feats[:, :rf.shape[1]], rf, rtol=2e-2,
                               atol=2e-3)
    np.testing.assert_allclose(out1[:, :4], r1[:, :4], rtol=2e-2,
                               atol=2e-3)


def test_render_rays_fused_parity():
    """render_rays with heads_impl='pallas' matches the XLA path on the
    full output dict, and gradients flow to every head + the grid."""
    import dataclasses

    from autolabel_tpu.render.renderer import RenderOptions, render_rays

    field_x, params, _, _ = _field_and_inputs()
    config_p = dataclasses.replace(field_x.config, heads_impl='pallas')
    field_p = Field(config_p)

    k = jax.random.PRNGKey(3)
    n = 64
    rays_o = jax.random.uniform(k, (n, 3), jnp.float32, -0.3, 0.3)
    rays_d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    norms = jnp.ones((n, 1), jnp.float32)
    options = RenderOptions(num_steps=16, perturb=False)

    out_x = render_rays(field_x, params, rays_o, rays_d, norms,
                        options=options)
    out_p = render_rays(field_p, params, rays_o, rays_d, norms,
                        options=options)
    for key_ in ('image', 'depth', 'semantic', 'semantic_features',
                 'weights_sum'):
        np.testing.assert_allclose(np.asarray(out_p[key_]),
                                   np.asarray(out_x[key_]),
                                   rtol=1e-4, atol=1e-4, err_msg=key_)

    def loss(p, field):
        out = render_rays(field, p, rays_o, rays_d, norms, options=options)
        return (jnp.mean(out['image'] ** 2) + jnp.mean(out['semantic'] ** 2)
                + jnp.mean(out['semantic_features'] ** 2))

    gx = jax.grad(loss)(params, field_x)
    gp = jax.grad(loss)(params, field_p)
    for (kx, a), (kp, b) in zip(
            sorted(jax.tree.leaves_with_path(gx), key=lambda t: str(t[0])),
            sorted(jax.tree.leaves_with_path(gp), key=lambda t: str(t[0]))):
        assert str(kx) == str(kp)
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2,
                                   atol=2e-2 * scale, err_msg=str(kx))


def test_trainer_with_fused_heads(sphere_scene):
    """A few SimpleTrainer steps under heads_impl='pallas': the custom
    VJP composes with the jitted, donated train step + optimizer, and
    the loss actually drops."""
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    dataset = SceneDataset('train', sphere_scene, factor=1.0,
                           batch_size=512)
    field = Field(FieldConfig(encoding='hg+freq', hidden_dim=64,
                              hidden_dim_color=64, hidden_dim_semantic=32,
                              semantic_classes=dataset.n_classes,
                              bound=2.0, grid=GRID, heads_impl='pallas'))
    trainer = SimpleTrainer('fused', field, lr=5e-3, iters=100,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=16,
                                                         perturb=True),
                            workspace=None, metrics=False)
    first = trainer.train_iterations(dataset, 5)
    first = float(jax.device_get(first)['rgb'])
    last = trainer.train_iterations(dataset, 150)
    last = float(jax.device_get(last)['rgb'])
    assert np.isfinite(last)
    # Unseeded batch sampler -> per-step loss is noisy; 150 steps of
    # training must still beat the 5-step warmup clearly.
    assert last < max(first * 0.9, 0.05), (first, last)


def test_fused_mlp3_proposal_parity():
    """proposal_sigma under heads_impl='pallas' (fused_mlp3) matches the
    XLA path in value and gradient."""
    import dataclasses

    field_x, params, _, _ = _field_and_inputs()
    config = dataclasses.replace(field_x.config, proposal=True)
    field_x = Field(config)
    params = field_x.init(jax.random.PRNGKey(0))
    field_p = Field(dataclasses.replace(config, heads_impl='pallas'))

    x = jax.random.uniform(jax.random.PRNGKey(5), (257, 3), jnp.float32,
                           -0.9, 0.9)
    sx = field_x.proposal_sigma(params, x)
    sp = field_p.proposal_sigma(params, x)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5,
                               atol=1e-6)

    def loss(p, field):
        return jnp.mean(field.proposal_sigma(p, x) ** 2)

    gx = jax.grad(loss)(params, field_x)['proposal']
    gp = jax.grad(loss)(params, field_p)['proposal']
    for a, b in zip(gx, gp):
        scale = max(float(jnp.abs(a).max()), 1e-5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4 * scale)


def test_kernels_lower_for_tpu_aot():
    """Mosaic-lowers every Pallas kernel for the TPU target from this
    CPU host (jax.export AOT). Interpret mode accepts primitives the
    hardware lowering rejects — e.g. `.at[].set` becomes a scatter,
    which Mosaic TC has no rule for (found on-chip in round 3); this
    test catches that class of regression without a TPU."""
    import dataclasses

    from jax import export

    import autolabel_tpu.ops.heads_pallas as hp

    field_x, params, A, B = _field_and_inputs(n=300)
    packed = pack_head_weights(params, freq_dim=12)
    orig = hp._interpret
    hp._interpret = lambda: False
    try:
        def loss(packed, A, B):
            o1, f, l = fused_heads(packed, A, B)
            return o1.sum() + f.sum() + l.sum()

        export.export(jax.jit(jax.grad(loss, argnums=(0, 1))),
                      platforms=['tpu'])(packed, A, B)

        config = dataclasses.replace(field_x.config, proposal=True)
        field = Field(config)
        p3 = field.init(jax.random.PRNGKey(0))['proposal']
        packed3 = hp.pack_mlp3(p3)
        X = jax.random.uniform(jax.random.PRNGKey(5), (257, 36),
                               jnp.float32, -0.9, 0.9)

        def loss3(packed3, X):
            return hp.fused_mlp3(packed3, X).sum()

        export.export(jax.jit(jax.grad(loss3, argnums=(0, 1))),
                      platforms=['tpu'])(packed3, X)
    finally:
        hp._interpret = orig
