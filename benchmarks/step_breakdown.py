"""Decompose the flagship train-step cost on hardware.

Times (fetch-fenced, like bench.py): the full step, value_and_grad
without the optimizer, the forward loss alone, the bare hash-encode
fwd (the gather), and the Adam update alone — the component budget that
tells round 3 where the remaining milliseconds live.

Usage: python benchmarks/step_breakdown.py [--batch 4096] [--corners 2]
"""
import argparse
import dataclasses
import functools
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
    parser.add_argument('--corners', type=int, default=0)
    parser.add_argument('--interp', default='simplex',
                        choices=['trilinear', 'simplex'])
    parser.add_argument('--heads-impl', default='xla',
                        choices=['xla', 'pallas'])
    parser.add_argument('--sampled-backward', default='2')
    parser.add_argument('--backward-points', type=float, default=1.0)
    parser.add_argument('--bench-iters', type=int, default=None)
    parser.add_argument('--warmup', type=int, default=None)
    parser.add_argument('--cpu', action='store_true',
                        help='Force the CPU backend (sanity runs).')
    flags = parser.parse_args()

    global ITERS, WARMUP
    if flags.bench_iters is not None:
        ITERS = flags.bench_iters
    if flags.warmup is not None:
        WARMUP = flags.warmup
    if flags.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax
    import jax.numpy as jnp
    import optax

    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import (TPU_GRID, hashgrid_encode,
                                            parse_sampled_backward)
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses
    from autolabel_tpu.train.optim import make_optimizer

    sbwd = parse_sampled_backward(flags.sampled_backward)
    field = Field(
        FieldConfig(encoding='hg+freq', hidden_dim=128,
                    hidden_dim_color=128, hidden_dim_semantic=64,
                    semantic_classes=6, bound=2.0, grid=TPU_GRID,
                    grid_interp=flags.interp, proposal=True,
                    heads_impl=flags.heads_impl))
    params = field.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=5e-3, iters=10000)
    opt_state = tx.init(params)
    loss_options = LossOptions()
    options = RenderOptions(num_steps=NUM_STEPS,
                            proposal_steps=PROPOSAL_STEPS, perturb=True,
                            stochastic_corners=flags.corners,
                            sampled_backward=sbwd,
                            backward_points=flags.backward_points)

    rng = np.random.default_rng(0)
    n = flags.batch
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        'rays_o': jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        'rays_d': jnp.asarray(d),
        'direction_norms': jnp.ones((n, 1), jnp.float32),
        'pixels': jnp.asarray(rng.random((n, 3)), jnp.float32),
        'depth': jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32),
        'semantic': jnp.asarray(rng.integers(-1, 6, n), jnp.int32),
    }

    def loss_fn(p, b, key):
        out = render_rays(field, p, b['rays_o'], b['rays_d'],
                          b['direction_norms'], key=key, options=options)
        return compute_losses(out, b, loss_options)[0]

    # Component probes, isolated by XLA dead-code elimination: a loss
    # that never touches the semantic output drops the semantic head
    # (and its backward) from the compiled step entirely; a proposal-free
    # options dataclass drops the proposal MLP + sample_pdf + interlevel
    # chain while keeping the identical main-field workload.
    options_noprop = dataclasses.replace(options, proposal_steps=0)

    def loss_fn_noprop(p, b, key):
        out = render_rays(field, p, b['rays_o'], b['rays_d'],
                          b['direction_norms'], key=key,
                          options=options_noprop)
        return compute_losses(out, b, loss_options)[0]

    def loss_fn_rgbd(p, b, key):
        out = render_rays(field, p, b['rays_o'], b['rays_d'],
                          b['direction_norms'], key=key, options=options)
        rgb = jnp.mean((out['image'] - b['pixels']) ** 2)
        depth = jnp.mean(jnp.abs(out['depth'] - b['depth']))
        return rgb + 0.1 * depth + out.get('interlevel', 0.0)

    def timed(fn, *args):
        out = None
        for i in range(WARMUP):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # fence
        start = time.perf_counter()
        for i in range(ITERS):
            out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        return (time.perf_counter() - start) / ITERS * 1000

    key = jax.random.PRNGKey(1)

    @jax.jit
    def full_step(p, o, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    @jax.jit
    def grad_only(p, b, key):
        return jax.value_and_grad(loss_fn)(p, b, key)

    @jax.jit
    def grad_noprop(p, b, key):
        return jax.value_and_grad(loss_fn_noprop)(p, b, key)

    @jax.jit
    def grad_rgbd(p, b, key):
        return jax.value_and_grad(loss_fn_rgbd)(p, b, key)

    fwd_only = jax.jit(loss_fn)
    fwd_noprop = jax.jit(loss_fn_noprop)

    # Bare encode: the flagship's main-field gather workload
    # (batch x num_steps points, k corners).
    pts = jnp.asarray(
        rng.uniform(0, 1, (n * NUM_STEPS, 3)), jnp.float32)

    # Scalar outputs: the fence fetches one float, not the (N, 512)
    # encode output (a multi-hundred-MB device->host transfer would
    # dominate the timing on the tunneled runtime).
    @jax.jit
    def encode_fwd(table, pts, key):
        return hashgrid_encode(table, pts, TPU_GRID, key=key,
                               n_samples=max(1, flags.corners),
                               interp=flags.interp,
                               sampled_backward=sbwd
                               ).sum()

    @jax.jit
    def encode_grad(table, pts, key):
        def f(t):
            return hashgrid_encode(t, pts, TPU_GRID, key=key,
                                   n_samples=max(1, flags.corners),
                                   interp=flags.interp,
                                   sampled_backward=sbwd
                                   ).sum()
        return jax.grad(f)(table).sum()

    # Head stack in isolation: density + color + semantic over the main
    # field's per-step point count, grads w.r.t. params (renderer-free) —
    # separates MLP/encode cost from compositing/proposal machinery.
    dirs = jnp.tile(batch['rays_d'], (NUM_STEPS, 1))

    @jax.jit
    def heads_grad(p, pts, dirs, key):
        def f(p):
            sigma, geo = field.density(p, pts * 2.0 - 1.0, key=key,
                                       sampled_backward=sbwd)
            rgb = field.color(p, dirs, geo)
            logits, feats = field.semantic(p, geo)
            return (sigma.sum() + rgb.sum() + logits.sum()).astype(
                jnp.float32)
        return jax.grad(f)(p)

    grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def adam_only(g, o, p):
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o

    # --- Round-5 forward decomposition: the probes below break the
    # fwd bucket (now the step's largest) into its renderer stages,
    # each isolated as the real code path runs it (same shapes, same
    # module-level helpers) so measured - sum(parts) exposes what the
    # bucket-level probes hide.
    from autolabel_tpu.ops.encoders import frequency_encode, sh_encode
    from autolabel_tpu.render.renderer import (_composite_weights,
                                               _interlevel_loss,
                                               ray_aabb_intersect,
                                               sample_pdf)

    @jax.jit
    def proposal_place(p, b, key):
        """The full proposal chain: aabb -> uniform probes -> proposal
        MLP -> weights -> inverse-CDF placement -> sort (renderer
        lines 216-243)."""
        k_coarse, k_fine = jax.random.split(key)
        near, far = ray_aabb_intersect(b['rays_o'], b['rays_d'], 2.0)
        sp = PROPOSAL_STEPS
        dist_p = (far - near) / sp
        z_p = near + (far - near) * jnp.linspace(0.0, 1.0, sp)[None, :]
        z_p = z_p + (jax.random.uniform(k_coarse, z_p.shape) - 0.5) * dist_p
        xyz_p = b['rays_o'][:, None, :] + z_p[..., None] \
            * b['rays_d'][:, None, :]
        sigma_p = field.proposal_sigma(
            p, jnp.clip(xyz_p, -2.0, 2.0).reshape(-1, 3))
        sigma_p = sigma_p.reshape(n, sp)
        deltas_p = jnp.concatenate(
            [jnp.diff(z_p, axis=-1), jnp.broadcast_to(dist_p, (n, 1))],
            axis=-1)
        w_p = _composite_weights(sigma_p, deltas_p)
        z_mid = 0.5 * (z_p[..., 1:] + z_p[..., :-1])
        z = sample_pdf(z_mid, jax.lax.stop_gradient(w_p[..., :-1]),
                       NUM_STEPS, k_fine)
        return jnp.sort(z, axis=-1).sum()

    @jax.jit
    def proposal_mlp_only(p, b, key):
        near, far = ray_aabb_intersect(b['rays_o'], b['rays_d'], 2.0)
        z_p = near + (far - near) \
            * jnp.linspace(0.0, 1.0, PROPOSAL_STEPS)[None, :]
        xyz_p = b['rays_o'][:, None, :] + z_p[..., None] \
            * b['rays_d'][:, None, :]
        return field.proposal_sigma(
            p, jnp.clip(xyz_p, -2.0, 2.0).reshape(-1, 3)).sum()

    @jax.jit
    def sample_pdf_only(w, z_mid, key):
        z = sample_pdf(z_mid, w, NUM_STEPS, key)
        return jnp.sort(z, axis=-1).sum()

    @jax.jit
    def heads_fwd(p, pts, dirs, key):
        sigma, geo = field.density(p, pts * 2.0 - 1.0, key=key,
                                   sampled_backward=sbwd)
        rgb = field.color(p, dirs, geo)
        logits, feats = field.semantic(p, geo)
        return (sigma.sum() + rgb.sum() + logits.sum()).astype(jnp.float32)

    @jax.jit
    def sigma_head_fwd(p, pts, key):
        sigma, geo = field.density(p, pts * 2.0 - 1.0, key=key,
                                   sampled_backward=sbwd)
        return sigma.sum() + geo.sum()

    @jax.jit
    def freq_sh_fwd(pts, dirs):
        return (frequency_encode(pts, 2).sum()
                + sh_encode(dirs).sum().astype(jnp.float32))

    # Compositing + output assembly + interlevel + losses on random
    # tensors of the step's shapes (renderer lines 331-389 + losses).
    comp_in = {
        'sigma': jnp.asarray(rng.uniform(0, 4, (n, NUM_STEPS)),
                             jnp.float32),
        'z': jnp.sort(jnp.asarray(rng.uniform(0.5, 2.0, (n, NUM_STEPS)),
                                  jnp.float32), axis=-1),
        'rgb': jnp.asarray(rng.random((n, NUM_STEPS, 3)), jnp.float32),
        'logits': jnp.asarray(rng.random((n, NUM_STEPS, 6)), jnp.float32),
        'feats': jnp.asarray(rng.random((n, NUM_STEPS, 64)), jnp.float32),
        'z_p': jnp.sort(jnp.asarray(
            rng.uniform(0.5, 2.0, (n, PROPOSAL_STEPS)), jnp.float32),
            axis=-1),
        'w_p': jnp.asarray(rng.random((n, PROPOSAL_STEPS)), jnp.float32),
    }

    @jax.jit
    def composite_outputs(c, b):
        deltas = jnp.concatenate(
            [jnp.diff(c['z'], axis=-1), jnp.full((n, 1), 0.05)], axis=-1)
        weights = _composite_weights(c['sigma'], deltas)
        weights_sum = weights.sum(axis=-1)
        deltas_p = jnp.concatenate(
            [jnp.diff(c['z_p'], axis=-1), jnp.full((n, 1), 0.05)], axis=-1)
        interlevel = _interlevel_loss(c['z'], deltas, weights, c['z_p'],
                                      deltas_p, c['w_p'])
        w = weights[..., None]
        image = (w * c['rgb']).sum(axis=1) + (1.0 - weights_sum[:, None])
        t_exp = (weights * c['z']).sum(axis=-1)
        depth = t_exp / b['direction_norms'][:, 0]
        z_depth = c['z'] / b['direction_norms']
        depth_var = (weights * (z_depth - depth[:, None]) ** 2).sum(axis=-1)
        out = {'image': image, 'depth': depth, 'depth_variance': depth_var,
               'semantic': (w * c['logits']).sum(axis=1),
               'semantic_features': (w * c['feats']).sum(axis=1),
               'coordinates_map': image, 'weights_sum': weights_sum,
               'interlevel': interlevel}
        return compute_losses(out, b, loss_options)[0]

    # Donation: the real trainer's step donates its state
    # (train/trainer.py donate_argnums=0); measure what bench.py's
    # non-donating step leaves on the table.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def full_step_donated(p, o, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    def timed_donated(make_state):
        """Like timed(), but re-creates donated buffers outside the
        window and threads state through (donated buffers die)."""
        p, o = make_state()
        key2 = jax.random.PRNGKey(1)
        for i in range(WARMUP):
            p, o, loss = full_step_donated(p, o, batch, key2)
        _ = float(np.asarray(loss).ravel()[0])
        start = time.perf_counter()
        for i in range(ITERS):
            p, o, loss = full_step_donated(p, o, batch, key2)
        _ = float(np.asarray(loss).ravel()[0])
        return (time.perf_counter() - start) / ITERS * 1000

    results = {
        'full_step_ms': round(timed(full_step, params, opt_state, batch,
                                    key), 2),
        'grad_only_ms': round(timed(grad_only, params, batch, key), 2),
        'grad_noprop_ms': round(timed(grad_noprop, params, batch, key), 2),
        'grad_rgbd_ms': round(timed(grad_rgbd, params, batch, key), 2),
        'fwd_only_ms': round(timed(fwd_only, params, batch, key), 2),
        'fwd_noprop_ms': round(timed(fwd_noprop, params, batch, key), 2),
        'encode_fwd_ms': round(timed(encode_fwd,
                                     params['encoder']['grid'], pts,
                                     key), 2),
        'encode_fwd_bwd_ms': round(timed(encode_grad,
                                         params['encoder']['grid'], pts,
                                         key), 2),
        'heads_grad_ms': round(timed(heads_grad, params, pts, dirs, key),
                               2),
        'adam_only_ms': round(timed(adam_only, grads, opt_state, params),
                              2),
        'full_step_donated_ms': round(
            timed_donated(lambda: (jax.tree.map(jnp.copy, params),
                                   tx.init(params))), 2),
        'fwd_proposal_place_ms': round(timed(proposal_place, params,
                                             batch, key), 2),
        'fwd_proposal_mlp_ms': round(timed(proposal_mlp_only, params,
                                           batch, key), 2),
        'fwd_sample_pdf_ms': round(timed(sample_pdf_only,
                                         comp_in['w_p'][:, :-1],
                                         comp_in['z_p'][:, :-1], key), 2),
        'fwd_heads_ms': round(timed(heads_fwd, params, pts, dirs, key), 2),
        'fwd_sigma_head_ms': round(timed(sigma_head_fwd, params, pts,
                                         key), 2),
        'fwd_freq_sh_ms': round(timed(freq_sh_fwd, pts, dirs), 2),
        'fwd_composite_losses_ms': round(timed(composite_outputs, comp_in,
                                               batch), 2),
        'batch': n,
        'corners': flags.corners,
        'interp': flags.interp,
        'sampled_backward': flags.sampled_backward,
    }
    print(json.dumps(results))


if __name__ == '__main__':
    main()
