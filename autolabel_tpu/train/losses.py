"""Loss composition over rendered ray batches.

Parity with the reference's train_step (autolabel/trainer.py:54-94):
  - MSE rgb (weight 1.0 default)
  - masked L1 depth where gt depth > DEPTH_EPSILON (weight 0.1)
  - L1 feature distillation on the first gt-dim feature channels (0.5)
  - masked cross-entropy over labeled rays (semantic >= 0) (1.0)

Masked means are computed as sum/clamped-count so the step stays a single
static-shape jitted function (the reference boolean-indexes, which would
retrigger XLA compilation per batch).
"""
import dataclasses

import jax.numpy as jnp
import optax

DEPTH_EPSILON = 0.01


@dataclasses.dataclass(frozen=True)
class LossOptions:
    rgb_weight: float = 1.0
    depth_weight: float = 0.1
    semantic_weight: float = 1.0
    feature_weight: float = 0.5
    feature_loss: bool = False
    # Weight of the proposal-sampler interlevel loss (active only when the
    # renderer returns one, i.e. proposal sampling is on).
    interlevel_weight: float = 1.0


def _masked_mean(values, mask):
    count = jnp.maximum(mask.sum(), 1.0)
    return (values * mask).sum() / count


def compute_losses(outputs, batch, options: LossOptions):
    """Returns (total_loss, dict of unweighted per-term losses)."""
    losses = {}

    losses['rgb'] = jnp.mean((outputs['image'] - batch['pixels']) ** 2)

    gt_depth = batch['depth']
    has_depth = (gt_depth > DEPTH_EPSILON).astype(jnp.float32)
    losses['depth'] = _masked_mean(
        jnp.abs(outputs['depth'] - gt_depth), has_depth)

    total = (options.rgb_weight * losses['rgb'] +
             options.depth_weight * losses['depth'])

    if options.feature_loss:
        # Distill on the SHARED leading channels: the reference slices
        # the teacher features down to the head's width when the head is
        # narrower (trainer.py:82-86); the converse slice keeps a wide
        # head trainable against a narrow teacher.
        gt_features = batch['features']
        pred = outputs['semantic_features']
        dim = min(pred.shape[-1], gt_features.shape[-1])
        losses['feature'] = jnp.mean(
            jnp.abs(pred[:, :dim] - gt_features[:, :dim]))
        total = total + options.feature_weight * losses['feature']

    if 'interlevel' in outputs:
        losses['interlevel'] = outputs['interlevel']
        total = total + options.interlevel_weight * losses['interlevel']

    gt_semantic = batch['semantic']
    has_semantic = (gt_semantic >= 0).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        outputs['semantic'], jnp.maximum(gt_semantic, 0))
    losses['semantic'] = _masked_mean(ce, has_semantic)
    total = total + options.semantic_weight * losses['semantic']

    return total, losses
