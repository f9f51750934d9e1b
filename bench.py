"""Benchmark: steady-state training throughput of the flagship config.

Measures rays/sec of the full jitted train step (render + all four losses +
Adam) on the reference workload shape: batch 4096 rays, hg+freq encoding
with the TPU-first grid preset (4 levels x 128 features x 2^15 — the same
16.7M parameters as the reference's 16 x 2 x 2^19, shaped for the v5e
gather engine), proposal sampling (64 cheap -> 32 main samples), simplex
(tetrahedral, 4-corner) hash-grid interpolation, and sampled-backward
hash gathers: the forward interpolates EXACTLY (zero forward noise) while
each (point, level) gradient scatters into 2 sampled corner rows — an
unbiased Rao-Blackwellized estimator of the table gradient that attacks
the step's measured cost center, the backward scatter (see
autolabel_tpu/ops/encoders.py and benchmarks/scatter_lab.py) — plus
magnitude-weighted POINT subsampling of that scatter (backward_points =
0.25): each step, 25% of the sample points are drawn by systematic
resampling proportional to their cotangent norm and scatter with
inverse-probability weights, which is unbiased and nearly noise-free
because volume-rendering gradients concentrate on surface samples (the
measured top-25% of points carry ~100% of the gradient mass; BASELINE.md
round 4). This cuts backward scatter rows 4x below the round-3 flagship.

The default schedule runs the sampled-backward step for ALL iterations
(exact_final_fraction = 0). Round 5 settled the exact-gather annealing
tail with a 3-seed A/B at 10k iterations on the room scene
(benchmarks/exact_tail_seeds.py; BASELINE.md "Round 5: exact-tail seed
study"): tail-OFF measured 24.20 dB mean vs tail-ON 24.13, i.e. the
tail's supposed quality benefit is not just inside the 0.07 dB seed
spread — it has the wrong sign. The trainer keeps the phase machinery
and the CLI keeps --exact-final-fraction for users who want it; the
reported value is the schedule-weighted EFFECTIVE rays/s (identical to
the sampled leg at fraction 0), with the exact-leg time still in the
JSON for transparency. Quality is at parity with the all-exact mode:
24.16-24.23 dB vs 24.28 dB at 10k iterations on the room scene
(BASELINE.md), versus the round-2 forward-stochastic flagship's
23.79 dB.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurement note: on tunneled TPU runtimes, block_until_ready does not
reliably await queued executions — a device->host FETCH is the only
trustworthy fence, and the first fetch of a process pays a large variable
handshake. The benchmark therefore fetches once to pay the handshake,
then times fetch-fenced windows.

vs_baseline: the reference repo publishes no numbers and this host has
no CUDA, so the denominator is a DERIVED bound in the reference's
favor — see BASELINE.md "Round 4: the vs_baseline denominator,
derived": the reference's non-cuda-ray step (256 samples/ray, 16x8
corner scatters into 2^19 tables) lower-bounds at ~25-50 ms/step on an
RTX-3090-class GPU even under unreachable utilization assumptions,
i.e. <= 80-160k rays/s; practical torch-ngp-style training runs
40-100k. REFERENCE_RAYS_PER_SEC = 100_000 is the TOP of both ranges,
so vs_baseline understates the advantage. The measured anchor of the
actual reference stack (its own CLI, identical scene/schedule, torch
CPU) is 67.6x end-to-end at +0.6 dB (BASELINE.md round 2).
"""
import functools
import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 100_000.0

BATCH = 4096
# TPU-first sampling: 64 cheap proposal samples place 32 main-field
# samples — matches 128 uniform samples in quality at ~4x fewer
# hash-grid queries (the dominant cost on TPU).
NUM_STEPS = 32
PROPOSAL_STEPS = 64
GRID_INTERP = 'simplex'
SAMPLED_BACKWARD = 2
BACKWARD_POINTS = 0.25
EXACT_FINAL_FRACTION = 0.0
WARMUP_ITERS = 5
BENCH_ITERS = 40


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import TPU_GRID
    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    from autolabel_tpu.train.losses import LossOptions, compute_losses
    from autolabel_tpu.train.optim import make_optimizer

    field = Field(
        FieldConfig(encoding='hg+freq',
                    hidden_dim=128,
                    hidden_dim_color=128,
                    hidden_dim_semantic=64,
                    semantic_classes=6,
                    bound=2.0,
                    grid=TPU_GRID,
                    grid_interp=GRID_INTERP,
                    proposal=True))
    params = field.init(jax.random.PRNGKey(0))
    tx = make_optimizer(params, lr=5e-3, iters=10000)
    opt_state = tx.init(params)
    loss_options = LossOptions()

    rng = np.random.default_rng(0)
    d = rng.normal(size=(BATCH, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    batch = {
        'rays_o': jnp.asarray(rng.uniform(-0.5, 0.5, (BATCH, 3)),
                              jnp.float32),
        'rays_d': jnp.asarray(d),
        'direction_norms': jnp.ones((BATCH, 1), jnp.float32),
        'pixels': jnp.asarray(rng.random((BATCH, 3)), jnp.float32),
        'depth': jnp.asarray(rng.uniform(0.5, 2.0, BATCH), jnp.float32),
        'semantic': jnp.asarray(rng.integers(-1, 6, BATCH), jnp.int32),
    }

    def make_step(sampled_backward, backward_points=1.0):
        options = RenderOptions(num_steps=NUM_STEPS,
                                proposal_steps=PROPOSAL_STEPS,
                                perturb=True,
                                stochastic_corners=0,
                                sampled_backward=sampled_backward,
                                backward_points=backward_points)

        def loss_fn(p, batch, key):
            out = render_rays(field, p, batch['rays_o'], batch['rays_d'],
                              batch['direction_norms'], key=key,
                              options=options)
            loss, _ = compute_losses(out, batch, loss_options)
            return loss

        # donate_argnums matches the real trainer's step
        # (train/trainer.py jits with donate_argnums=0): the bench
        # measures the step users actually run, and donation is worth
        # a measured ~0.6 ms at the flagship shape (step_breakdown
        # full_step vs full_step_donated).
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch, key)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        return step

    def measure(step, p, o):
        # The step donates its state buffers; measure on copies so both
        # legs (sampled + exact) start from the same initial state.
        p = jax.tree.map(jnp.copy, p)
        o = jax.tree.map(jnp.copy, o)
        key = jax.random.PRNGKey(1)
        for i in range(WARMUP_ITERS):
            key = jax.random.fold_in(key, i)
            p, o, loss = step(p, o, batch, key)
        _ = float(loss)  # fetch = the only reliable execution fence
        start = time.perf_counter()
        for i in range(BENCH_ITERS):
            key = jax.random.fold_in(key, i + WARMUP_ITERS)
            p, o, loss = step(p, o, batch, key)
        _ = float(loss)  # fence
        return (time.perf_counter() - start) / BENCH_ITERS

    sec_sampled = measure(make_step(SAMPLED_BACKWARD, BACKWARD_POINTS),
                          params, opt_state)
    sec_exact = measure(make_step(0), params, opt_state)
    effective_sec = ((1.0 - EXACT_FINAL_FRACTION) * sec_sampled +
                     EXACT_FINAL_FRACTION * sec_exact)
    rays_per_sec = BATCH / effective_sec

    print(json.dumps({
        'metric': 'train_rays_per_sec_effective',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 3),
        'sampled_backward_ms_per_step': round(sec_sampled * 1000, 1),
        'exact_ms_per_step': round(sec_exact * 1000, 1),
        'exact_final_fraction': EXACT_FINAL_FRACTION,
        'backward_points': BACKWARD_POINTS,
    }))


if __name__ == '__main__':
    main()
