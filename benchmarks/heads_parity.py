"""Hardware numerics parity: fused Pallas head stack vs the XLA path.

The interpret-mode tests (tests/test_heads_pallas.py) prove the math on
CPU at fp32; this script proves the COMPILED kernel on the real chip at
bf16 — render_rays outputs and the full gradient tree, flagship shapes.
Prints one JSON line of max relative errors; anything > ~5e-2 means the
kernel lowered wrong (bf16 noise sits well below that).

Usage: python benchmarks/heads_parity.py [--batch 1024]
"""
import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=1024)
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import TPU_GRID
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses

    config = FieldConfig(encoding='hg+freq', hidden_dim=128,
                         hidden_dim_color=128, hidden_dim_semantic=64,
                         semantic_classes=6, bound=2.0, grid=TPU_GRID,
                         grid_interp='simplex', proposal=True)
    field_x = Field(config)
    field_p = Field(dataclasses.replace(config, heads_impl='pallas'))
    params = field_x.init(jax.random.PRNGKey(0))
    assert field_p.fused_heads_available(params)

    rng = np.random.default_rng(0)
    n = flags.batch
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        'rays_o': jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)),
                              jnp.float32),
        'rays_d': jnp.asarray(d),
        'direction_norms': jnp.ones((n, 1), jnp.float32),
        'pixels': jnp.asarray(rng.random((n, 3)), jnp.float32),
        'depth': jnp.asarray(rng.random(n), jnp.float32),
        'semantic': jnp.asarray(rng.integers(-1, 6, n), jnp.int32),
    }
    options = RenderOptions(num_steps=32, proposal_steps=64, perturb=False)

    def loss_fn(p, field):
        out = render_rays(field, p, batch['rays_o'], batch['rays_d'],
                          batch['direction_norms'], options=options)
        loss, _ = compute_losses(out, batch, LossOptions())
        return loss, out

    (lx, ox), gx = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, field_x), has_aux=True))(params)
    (lp, op), gp = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, field_p), has_aux=True))(params)
    # fp32 on-chip ground truth (the XLA path with fp32 matmuls): both
    # compiled bf16 paths carry rounding noise, so judge the kernel by
    # its DISTANCE TO TRUTH relative to the XLA path's, not pairwise.
    # The dtype env alone is NOT enough: at DEFAULT matmul precision the
    # MXU rounds fp32 dot inputs to bf16 anyway (measured bit-identical
    # to the bf16 path on v5e) — HIGHEST forces the bf16x6 decomposition
    # that actually carries fp32 input precision.
    os.environ['AUTOLABEL_COMPUTE_DTYPE'] = 'float32'
    try:
        with jax.default_matmul_precision('highest'):
            (l0, o0), g0 = jax.jit(jax.value_and_grad(
                lambda p: loss_fn(p, field_x), has_aux=True))(params)
    finally:
        del os.environ['AUTOLABEL_COMPUTE_DTYPE']

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        return float(np.abs(a - b).max() / scale)

    quantities = {
        'loss': (lx, lp, l0),
        'image': (ox['image'], op['image'], o0['image']),
        'semantic': (ox['semantic'], op['semantic'], o0['semantic']),
        'features': (ox['semantic_features'], op['semantic_features'],
                     o0['semantic_features']),
        'grad_grid': (gx['encoder']['grid'], gp['encoder']['grid'],
                      g0['encoder']['grid']),
        'grad_sigma0': (gx['sigma_net'][0], gp['sigma_net'][0],
                        g0['sigma_net'][0]),
        'grad_color0': (gx['color_net'][0], gp['color_net'][0],
                        g0['color_net'][0]),
        'grad_semout': (gx['semantic_out'][1], gp['semantic_out'][1],
                        g0['semantic_out'][1]),
    }
    report, ok = {}, True
    for name, (x, p, t) in quantities.items():
        err_x, err_p = rel(t, x), rel(t, p)
        report[f'{name}_rel'] = rel(x, p)
        report[f'{name}_err_xla'] = err_x
        report[f'{name}_err_pallas'] = err_p
        # the kernel passes if it sits as close to fp32 truth as the
        # bf16 XLA path does (2x slack), or within absolute bf16 noise
        ok = ok and (err_p <= max(2.0 * err_x, 5e-2))
    report['batch'] = n
    report['ok'] = ok
    print(json.dumps(report))


if __name__ == '__main__':
    main()
