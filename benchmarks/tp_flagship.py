"""Flagship-shaped grid-tensor-parallel training step.

Round 2 proved DP x grid-TP correctness at toy shapes only
(__graft_entry__._dryrun_dp_tp: 2^12-row table, 8 rays/device). This
runs the REAL flagship shapes — TPU_GRID 4 x 2^15 x 128 table sharded
on its feature axis over the 'model' mesh axis, batch-4096 rays with
64p+32m proposal sampling sharded over 'data' — through one full jitted
train step (render + losses + Adam), in two modes:

  --mesh D M     on a virtual CPU mesh (self-bootstraps the device
                 count in a subprocess like dryrun_multichip); proves
                 the flagship config compiles AND executes under the
                 2x2 sharding. CPU wall-clock is reported for context
                 only.
  --real         on the current (single) real device with a 1x1 mesh
                 carrying the SAME NamedSharding annotations; proves
                 the annotations survive the flagship config on TPU
                 hardware and times the step (fetch-fenced) against the
                 unsharded flagship number in BASELINE.md.

Prints one JSON line per mode.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4096
NUM_STEPS = 32
PROPOSAL_STEPS = 64


def _build(field_cls, config_cls, tpu_grid):
    return field_cls(
        config_cls(encoding='hg+freq', hidden_dim=128, hidden_dim_color=128,
                   hidden_dim_semantic=64, semantic_classes=6, bound=2.0,
                   grid=tpu_grid, proposal=True))


def run_step(mesh_data, mesh_model, iters, label):
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _example_batch
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import TPU_GRID
    from autolabel_tpu.parallel import (batch_sharding, make_mesh_2d,
                                        tree_shardings)
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses
    from autolabel_tpu.train.optim import make_optimizer

    mesh = make_mesh_2d(mesh_data, mesh_model)
    field = _build(Field, FieldConfig, TPU_GRID)
    params = field.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=5e-3, iters=10000)
    opt_state = tx.init(params)
    options = RenderOptions(num_steps=NUM_STEPS,
                            proposal_steps=PROPOSAL_STEPS, perturb=True,
                            stochastic_corners=2)
    loss_options = LossOptions()

    grid_shape = params['encoder']['grid'].shape
    pspecs = tree_shardings(mesh, params, grid_shape)
    ospecs = tree_shardings(mesh, opt_state, grid_shape)
    sharded = batch_sharding(mesh)
    scalar = NamedSharding(mesh, P())

    def loss_fn(p, batch, key):
        out = render_rays(field, p, batch['rays_o'], batch['rays_d'],
                          batch['direction_norms'], key=key, options=options)
        loss, _ = compute_losses(out, batch, loss_options)
        return loss

    def step(p, o, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    jit_step = jax.jit(step, in_shardings=(pspecs, ospecs, sharded, scalar),
                       out_shardings=(pspecs, ospecs, scalar))

    batch = jax.device_put(_example_batch(BATCH, 6), sharded)
    params = jax.device_put(params, pspecs)
    opt_state = jax.device_put(opt_state, ospecs)
    key = jax.device_put(jax.random.PRNGKey(1), scalar)

    compile_start = time.perf_counter()
    lowered = jit_step.lower(params, opt_state, batch, key)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - compile_start
    hlo = compiled.as_text()
    collectives = {
        op: hlo.count(op)
        for op in ('all-reduce', 'all-gather', 'reduce-scatter',
                   'collective-permute')
    }

    params, opt_state, loss = compiled(params, opt_state, batch, key)
    _ = float(loss)  # fetch fence after warmup
    start = time.perf_counter()
    for i in range(iters):
        key = jax.device_put(jax.random.fold_in(jax.random.PRNGKey(2), i),
                             scalar)
        params, opt_state, loss = compiled(params, opt_state, batch, key)
    _ = float(loss)
    ms = (time.perf_counter() - start) / max(iters, 1) * 1000
    assert np.isfinite(float(loss)), "non-finite loss"
    print(json.dumps({
        'label': label,
        'mesh': [mesh_data, mesh_model],
        'platform': jax.devices()[0].platform,
        'batch': BATCH,
        'grid': 'TPU_GRID 4x2^15x128',
        'ms_per_step': round(ms, 1),
        'compile_s': round(compile_s, 1),
        'collectives': collectives,
    }), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--mesh', type=int, nargs=2, default=None,
                        metavar=('DATA', 'MODEL'),
                        help='Virtual-CPU-mesh mode: data x model shape.')
    parser.add_argument('--real', action='store_true',
                        help='Real-device 1x1-mesh mode.')
    parser.add_argument('--iters', type=int, default=10)
    parser.add_argument('--_impl', action='store_true', help=argparse.SUPPRESS)
    flags = parser.parse_args()

    if flags.real:
        run_step(1, 1, flags.iters, 'real_1x1')
        return

    data, model = flags.mesh or (2, 2)
    n = data * model
    if flags._impl:
        run_step(data, model, flags.iters, f'virtual_{data}x{model}')
        return
    env = dict(os.environ)
    xla = ' '.join(f for f in env.get('XLA_FLAGS', '').split()
                   if 'xla_force_host_platform_device_count' not in f)
    env['XLA_FLAGS'] = (
        xla + f' --xla_force_host_platform_device_count={n}').strip()
    env['JAX_PLATFORMS'] = 'cpu'
    # The env var alone is NOT enough on axon-tunneled hosts (the
    # sitecustomize initializes jax first); force the platform via
    # jax.config before anything else runs, like dryrun_multichip.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.path.insert(0, {here!r})\n"
        f"sys.path.insert(0, {os.path.join(here, 'benchmarks')!r})\n"
        "from tp_flagship import run_step\n"
        f"run_step({data}, {model}, {flags.iters}, "
        f"'virtual_{data}x{model}')\n")
    proc = subprocess.run([sys.executable, '-c', code], env=env, cwd=here,
                          timeout=3600)
    sys.exit(proc.returncode)


if __name__ == '__main__':
    main()
