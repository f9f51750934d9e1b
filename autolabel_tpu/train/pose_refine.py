"""Camera-pose optimization through the volumetric renderer.

Two modes:

1. `register_camera` — the validated feature: optimize ONE camera's
   SE(3) delta against a FROZEN trained field (photometric + optional
   depth). The objective has a clean basin around the true pose
   (measured: the loss along the true-correction direction descends
   smoothly to the truth). Use for localizing a new frame against a
   trained scene (the online/ROS path) or re-aligning an SfM pose.

2. Joint refinement during training (SimpleTrainer pose_refine=...,
   BARF-style): per-frame deltas live in the parameter pytree, the
   batch carries camera-frame ray directions + frame indices, and the
   step rebuilds world rays from `pose_init ∘ exp(delta)` — the same
   jitted Adam update trains field and cameras. EXPERIMENTAL, and on
   few-frame synthetic captures a measured dead end: the hash grid
   co-adapts to the wrong poses within a few hundred steps (even
   coarse-only — a low-frequency field warp absorbs low-frequency pose
   error), after which the photometric loss is MINIMIZED at the wrong
   poses and the deltas drift (NOTES.md round-3). The machinery
   (coarse-to-fine level windows, pose lr schedule, gauge anchor) is
   kept for larger real captures where the literature reports joint
   refinement working.

Frame 0 is the gauge anchor (its delta is masked), pinning the refined
world to the initial one.

The reference has no equivalent; it trains on whatever COLMAP produced
(reference scripts/mapping.py, train.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from autolabel_tpu.mapping.ba import rodrigues


def init_pose_params(n_frames):
    """Zero SE(3) deltas: {'rot': (N, 3) so(3), 't': (N, 3)}."""
    return {'rot': jnp.zeros((n_frames, 3), jnp.float32),
            't': jnp.zeros((n_frames, 3), jnp.float32)}


def refined_rays(pose_params, pose_init, frame_idx, rays_d_cam):
    """World rays under the refined poses.

    pose_init: (R0 (N, 3, 3) cam->world, t0 (N, 3) camera centers).
    frame_idx: (B,) int32; rays_d_cam: (B, 3) camera-frame directions.
    Returns (rays_o (B, 3), rays_d (B, 3)).
    """
    R0, t0 = pose_init
    mask = jnp.ones((R0.shape[0], 1)).at[0].set(0.0)  # gauge anchor
    rot = pose_params['rot'] * mask
    t = pose_params['t'] * mask
    R = jnp.asarray(R0) @ rodrigues(rot)  # (N, 3, 3) cam->world refined
    rays_d = jnp.einsum('bij,bj->bi', R[frame_idx], rays_d_cam)
    rays_o = (jnp.asarray(t0) + t)[frame_idx]
    return rays_o, rays_d


def register_camera(field, params, pixels, dirs_cam, norms, R0, t0,
                    options=None, iters=200, lr=3e-3, depth=None,
                    depth_weight=0.1):
    """Register ONE camera against a TRAINED (frozen) field.

    Photometric (+ optional depth) pose optimization: Adam on a single
    SE(3) delta through the volumetric renderer, field params frozen.
    Unlike joint refinement during training — where the hash grid
    co-adapts to the wrong poses faster than they can move (measured;
    NOTES.md) — the frozen-field objective has a clean basin around the
    true pose. Use cases: localizing a new frame against a trained
    scene (the online/ROS path), or re-aligning an SfM pose after
    training.

    pixels: (B, 3) observed rgb; dirs_cam: (B, 3) camera-frame ray
    directions; norms: (B, 1); R0 (3, 3) cam->world / t0 (3,) initial
    pose; depth: optional (B,) metric z-depth (0 = invalid).

    Accuracy floor: the photometric optimum sits where the FIELD's own
    errors put it — measured ~1-2 deg / ~2 cm against a quickly-trained
    80x60 field (5 deg / 10 cm initial error recovers 4x; NOTES.md);
    sharper fields localize proportionally better.

    Returns (R (3, 3), t (3,), final_loss).
    """
    import optax

    from autolabel_tpu.render.renderer import RenderOptions, render_rays
    if options is None:
        options = RenderOptions(num_steps=64, proposal_steps=32,
                                perturb=False)
    pixels = jnp.asarray(pixels, jnp.float32)
    dirs_cam = jnp.asarray(dirs_cam, jnp.float32)
    norms = jnp.asarray(norms, jnp.float32).reshape(-1, 1)
    R0 = jnp.asarray(R0, jnp.float32)
    t0 = jnp.asarray(t0, jnp.float32)
    depth_arr = None if depth is None else jnp.asarray(depth, jnp.float32)

    def loss_fn(delta):
        R = R0 @ rodrigues(delta['rot'])
        rays_d = dirs_cam @ R.T
        rays_o = jnp.broadcast_to(t0 + delta['t'], rays_d.shape)
        out = render_rays(field, params, rays_o, rays_d, norms,
                          options=options)
        loss = jnp.mean((out['image'] - pixels) ** 2)
        if depth_arr is not None:
            valid = (depth_arr > 0).astype(jnp.float32)
            loss = loss + depth_weight * jnp.sum(
                valid * jnp.abs(out['depth'] - depth_arr)) \
                / jnp.maximum(valid.sum(), 1.0)
        return loss

    tx = optax.adam(optax.cosine_decay_schedule(lr, iters, alpha=0.01))
    delta = {'rot': jnp.zeros(3), 't': jnp.zeros(3)}
    opt_state = tx.init(delta)

    @jax.jit
    def step(delta, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(delta)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(delta, updates), opt_state, loss

    loss = jnp.inf
    for _ in range(iters):
        delta, opt_state, loss = step(delta, opt_state)
    R = np.asarray(R0 @ rodrigues(delta['rot']))
    t = np.asarray(t0 + delta['t'])
    return R, t, float(loss)


def refined_poses(pose_params, pose_init):
    """Materialize the refined (R (N,3,3) cam->world, centers (N,3)) as
    numpy — for tests and for re-exporting poses after training."""
    R0, t0 = pose_init
    mask = np.ones((len(t0), 1), np.float32)
    mask[0] = 0.0
    R = np.asarray(R0) @ np.asarray(
        rodrigues(jnp.asarray(pose_params['rot']) * mask))
    t = np.asarray(t0) + np.asarray(pose_params['t']) * mask
    return R, t
