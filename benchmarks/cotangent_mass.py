"""Measure the per-point encode-output cotangent mass distribution.

The flagship step's cost center is the hash-table gradient scatter
(BASELINE.md roofline); this probe answers WHERE that gradient actually
is. It taps every `Field._grid_encode` output with an additive-zero
epsilon so grad-wrt-epsilon recovers the exact cotangent arriving at the
encode output per sample point, then reports how concentrated the
per-point cotangent norms are (mass covered by the top 10/25/50/75% of
points) plus the importance-sampling effective sample size.

If the mass is concentrated — and on trained checkpoints it is: volume
rendering routes ~zero gradient to samples in empty or occluded space —
a magnitude-weighted backward point subsample (`--backward-points`)
cuts scatter rows, the measured step bottleneck, with negligible
estimator noise. This probe produced the measured basis for the 0.25
flagship default (BASELINE.md round 4).

Usage:
  python benchmarks/cotangent_mass.py SCENE_DIR MODEL_DIR_NAME \
      [--batch 4096] [--factor 2.0] [--features demo]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('model_dir',
                        help='Workspace name under SCENE/nerf/ whose '
                        'checkpoint and flags to probe.')
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--factor', type=float, default=2.0)
    flags_cli = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import SceneDataset
    import autolabel_tpu.models.field as field_mod
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses

    workspace = os.path.join(flags_cli.scene, 'nerf', flags_cli.model_dir)
    flags = model_utils.read_params(workspace)
    ds = SceneDataset('train', flags_cli.scene, factor=flags_cli.factor,
                      batch_size=flags_cli.batch,
                      features=getattr(flags, 'features', None))
    field = model_utils.create_model(ds.min_bounds, ds.max_bounds,
                                     ds.n_classes, flags)
    params, _ = model_utils.load_checkpoint(
        os.path.join(workspace, 'checkpoints'))

    batch = next(iter(ds))

    # Tap every _grid_encode output with an additive eps input so
    # grad-wrt-eps recovers the exact cotangent at the encode output.
    orig = field_mod.Field._grid_encode
    current = {'eps': None, 'calls': 0, 'shapes': []}

    def tapped(self, table, normalized, *args, **kw):
        out = orig(self, table, normalized, *args, **kw)
        current['shapes'].append(out.shape)
        i = current['calls']
        current['calls'] += 1
        if current['eps'] is not None:
            out = out + current['eps'][i]
        return out

    field_mod.Field._grid_encode = tapped
    options = RenderOptions(num_steps=32, proposal_steps=64, perturb=True)
    loss_options = LossOptions()
    key = jax.random.PRNGKey(0)

    def loss_fn(p, eps, batch, key):
        current['eps'] = eps
        current['calls'] = 0
        out = render_rays(field, p, batch['rays_o'], batch['rays_d'],
                          batch['direction_norms'], key=key,
                          options=options)
        loss, _ = compute_losses(out, batch, loss_options)
        return loss

    # Pass 1 (abstract): record grid-encode call shapes.
    jax.eval_shape(lambda p, b, k: loss_fn(p, None, b, k), params, batch,
                   key)
    shapes = list(current['shapes'])
    print('grid-encode call shapes:', shapes)

    eps = [jnp.zeros(s, jnp.float32) for s in shapes]
    g = jax.jit(jax.grad(loss_fn, argnums=1))(params, eps, batch, key)
    g = [np.asarray(x) for x in jax.device_get(g)]

    cfg = field.config.grid_config
    f_width = cfg.n_features
    for ci, gc in enumerate(g):
        n = gc.shape[0]
        n_levels = gc.shape[1] // f_width
        print(f'--- call {ci}: {gc.shape}, '
              f'{n_levels} levels x {f_width} features')
        per = gc.reshape(n, n_levels, f_width)
        s_all = np.linalg.norm(per, axis=-1)  # (n, L)
        s_tot = np.linalg.norm(gc, axis=-1)   # the selection criterion
        for name, s in [('combined', s_tot)] + [
                (f'level {l}', s_all[:, l]) for l in range(n_levels)]:
            o = np.sort(s)[::-1]
            c = np.cumsum(o) / max(o.sum(), 1e-30)
            zero = float((s == 0).mean())
            print(f'{name:9s} '
                  f'mass@top10%={c[int(0.10 * n) - 1]:.3f} '
                  f'top25%={c[int(0.25 * n) - 1]:.3f} '
                  f'top50%={c[int(0.50 * n) - 1]:.3f} '
                  f'top75%={c[int(0.75 * n) - 1]:.3f} zeros={zero:.3f}')
        # IPW estimator noise scales with E[s^2/p]/K - ||g||^2; report
        # the effective sample size of p ~ s relative to n.
        p = s_tot / max(s_tot.sum(), 1e-30)
        ess = 1.0 / max((p ** 2).sum(), 1e-30) / n
        print(f'importance ESS fraction (p~s): {ess:.3f}')


if __name__ == '__main__':
    main()
