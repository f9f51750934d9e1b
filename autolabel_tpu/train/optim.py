"""Optimizer and learning-rate schedule.

Parity with scripts/train.py:50-75 and autolabel/backend.py:33-46:
Adam(betas=(0.9, 0.99), eps=1e-15), weight decay 1e-6 coupled into the
gradient for the network params only (not the hash encoding), StepLR with
gamma 0.5 stepping once per 1000-iteration epoch sized so the lr lands at
1e-4 by the end of training. bf16-on-TPU removes the reference's AMP
GradScaler entirely.
"""
import math

import jax
import jax.numpy as jnp
import optax

from autolabel_tpu.models.field import Field


def lr_schedule(lr, iters=None):
    """StepLR-equivalent staircase schedule keyed on the global step."""
    if iters is None:
        return lr  # interactive mode: ConstantLR (backend.py:55-56)
    gamma = 0.5
    steps = math.log(1e-4 / lr, gamma)
    step_size = max(iters // steps // 1000, 1)
    return optax.exponential_decay(lr,
                                   transition_steps=int(step_size) * 1000,
                                   decay_rate=gamma,
                                   staircase=True)


def make_optimizer(params, lr=5e-3, iters=None, weight_decay=1e-6):
    """Adam with per-group weight decay, matching the reference groups:
    'encoding' (hash table, no decay) vs 'net' (MLP weights, 1e-6).

    Wrapped in apply_if_finite: the reference's AMP GradScaler skips any
    step whose gradients hit inf/nan (trainer.py:45-48); bf16-on-TPU has
    no scaler, so non-finite updates are rejected here instead — without
    this, heavily duplicated ray batches (interactive annotation with a
    tiny labeled pool, simulate_user) can spiral the density head into
    inf within a few dozen steps.
    """
    labels = Field.param_labels(params)
    chain = [
        optax.masked(optax.add_decayed_weights(weight_decay),
                     {k: jax.tree.map(lambda l: l == 'net', v)
                      for k, v in labels.items()}),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
        optax.scale_by_learning_rate(lr_schedule(lr, iters)),
    ]
    if 'pose' in params:
        # Camera-refinement deltas (train/pose_refine.py) need a far
        # gentler schedule than the field: Adam normalizes step sizes,
        # so at the field lr the poses random-walk away faster than the
        # photometric gradient can steer them, and before the field has
        # formed there is no steering signal at all. Freeze the poses
        # for the first 10% of training, then step them at 1/10 lr.
        # (A true 10% even for short runs: the BARF coarse-to-fine
        # level windows open over the first half of training, and a
        # fixed floor would keep poses frozen through the entire
        # coarse-only phase the schedule exists to provide.)
        warmup = max((iters or 10000) // 10, 1)
        pose_mask = {k: jax.tree.map(lambda l: l == 'pose', v)
                     for k, v in labels.items()}
        chain.append(optax.masked(
            optax.scale_by_schedule(
                lambda count: jnp.where(count < warmup, 0.0, 0.1)),
            pose_mask))
    tx = optax.chain(*chain)
    return optax.apply_if_finite(tx, max_consecutive_errors=100)
