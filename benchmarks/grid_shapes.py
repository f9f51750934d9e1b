"""Time the flagship train step across hash-grid level/width layouts.

The v5e gather engine is row-latency-bound (~9 ns/row regardless of row
width, NOTES.md), and gather rows per step scale with n_levels x
stochastic_corners. At a FIXED parameter count (16.7M), fewer/wider
levels should cut encode time almost linearly — this script measures
that on hardware. Quality is a separate question (fewer resolutions =
coarser multires ladder); see the room-scene A/B in BASELINE.md.

Usage: python benchmarks/grid_shapes.py [--batch 4096]
Prints one JSON line per configuration (fetch-fenced timing, like
bench.py).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_STEPS = 32
PROPOSAL_STEPS = 64
WARMUP = 5
ITERS = 30


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--corners', type=int, nargs='*', default=[2, 0])
    parser.add_argument('--residual', action='store_true',
                        help='Rao-Blackwellized 2-row estimator for the '
                        'stochastic configs.')
    parser.add_argument('--grids', type=str, nargs='*', default=None,
                        help='Subset of layout names to time.')
    parser.add_argument('--sampled-backward', default='0',
                        help='Exact-forward / sampled-backward gathers '
                        '(1 or 2 scatter rows; overrides --corners).')
    parser.add_argument('--heads-impl', default='xla',
                        choices=['xla', 'pallas'])
    parser.add_argument('--interp', type=str, nargs='*',
                        default=['trilinear'],
                        choices=['trilinear', 'simplex'],
                        help='Hash-grid interpolants to time (simplex = '
                        '4 tetrahedral corners, half the gather/scatter '
                        'rows of trilinear).')
    flags = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig, parse_sampled_backward
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses
    from autolabel_tpu.train.optim import make_optimizer

    # All 16.7M params; resolutions span 16 -> 2048 where possible.
    grids = {
        'L4_F128_T15': HashGridConfig(4, 128, 15, 16, 5.04),
        'L3_F128_T15': HashGridConfig(3, 128, 15, 16, 11.31),
        'L2_F256_T15': HashGridConfig(2, 256, 15, 16, 128.0),
        'L2_F128_T16': HashGridConfig(2, 128, 16, 16, 128.0),
        'L1_F512_T15': HashGridConfig(1, 512, 15, 2048, 1.0),
    }

    rng = np.random.default_rng(0)
    batch_n = flags.batch
    d = rng.normal(size=(batch_n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        'rays_o': jnp.asarray(rng.uniform(-0.5, 0.5, (batch_n, 3)),
                              jnp.float32),
        'rays_d': jnp.asarray(d),
        'direction_norms': jnp.ones((batch_n, 1), jnp.float32),
        'pixels': jnp.asarray(rng.random((batch_n, 3)), jnp.float32),
        'depth': jnp.asarray(rng.uniform(0.5, 2.0, batch_n), jnp.float32),
        'semantic': jnp.asarray(rng.integers(-1, 6, batch_n), jnp.int32),
    }
    loss_options = LossOptions()

    if flags.grids:
        grids = {k: v for k, v in grids.items() if k in flags.grids}
    for (name, grid), interp in ((g, i) for g in grids.items()
                                 for i in flags.interp):
        field = Field(
            FieldConfig(encoding='hg+freq', hidden_dim=128,
                        hidden_dim_color=128, hidden_dim_semantic=64,
                        semantic_classes=6, bound=2.0, grid=grid,
                        proposal=True, grid_interp=interp,
                        heads_impl=flags.heads_impl))
        params = field.init(jax.random.PRNGKey(0))
        tx = make_optimizer(params, lr=5e-3, iters=10000)
        opt_state = tx.init(params)
        n_params = grid.n_levels * grid.table_size * grid.n_features

        for corners in flags.corners:
            options = RenderOptions(num_steps=NUM_STEPS,
                                    proposal_steps=PROPOSAL_STEPS,
                                    perturb=True,
                                    stochastic_corners=corners,
                                    stochastic_residual=(flags.residual and
                                                         corners == 2),
                                    sampled_backward=parse_sampled_backward(flags.sampled_backward))

            def loss_fn(p, batch, key):
                out = render_rays(field, p, batch['rays_o'],
                                  batch['rays_d'],
                                  batch['direction_norms'], key=key,
                                  options=options)
                loss, _ = compute_losses(out, batch, loss_options)
                return loss

            @jax.jit
            def step(p, o, batch, key):
                loss, grads = jax.value_and_grad(loss_fn)(p, batch, key)
                updates, o = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o, loss

            key = jax.random.PRNGKey(1)
            p, o = params, opt_state
            for i in range(WARMUP):
                key = jax.random.fold_in(key, i)
                p, o, loss = step(p, o, batch, key)
            _ = float(loss)  # fetch fence
            start = time.perf_counter()
            for i in range(ITERS):
                key = jax.random.fold_in(key, i + WARMUP)
                p, o, loss = step(p, o, batch, key)
            _ = float(loss)
            ms = (time.perf_counter() - start) / ITERS * 1000
            print(json.dumps({
                'grid': name,
                'interp': interp,
                'corners': corners,
                'residual': flags.residual and corners == 2,
                'sampled_backward': flags.sampled_backward,
                'ms_per_step': round(ms, 1),
                'rays_per_sec': round(batch_n / ms * 1000, 0),
                'grid_params_m': round(n_params / 1e6, 1),
            }), flush=True)


if __name__ == '__main__':
    main()
