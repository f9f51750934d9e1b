"""Offline (pre)training entry point.

CLI parity: reference scripts/train.py (same flags, same workspace
layout). The torch DataLoader + AMP + GradScaler machinery is replaced by
a single jitted train step with a prefetching host loader; bf16 on TPU
needs no loss scaling.
"""
import argparse  # noqa: F401  (flag surface defined in model_utils)
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import LenDataset, SceneDataset
from autolabel_tpu.ops import encoders
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.loader import PrefetchIterator
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import SimpleTrainer


def read_args():
    parser = model_utils.model_flag_parser()
    parser.add_argument('scene')
    parser.add_argument('--factor-train', type=float, default=2.0)
    parser.add_argument('--factor-test', type=float, default=2.0)
    parser.add_argument('--batch-size', '-b', type=int, default=4096)
    parser.add_argument('--iters', type=int, default=10000)
    parser.add_argument('--workers', '-w', type=int, default=1)
    parser.add_argument('--eval', action='store_true')
    parser.add_argument(
        '--workspace',
        type=str,
        default=None,
        help="Save results in this directory instead of the scene directory.")
    parser.add_argument('--num-steps', type=int, default=128,
                        help="Volume-rendering samples per ray in training.")
    parser.add_argument('--upsample-steps', type=int, default=0,
                        help="Extra importance-sampled points per ray.")
    parser.add_argument('--mesh-devices', type=int, default=None,
                        help="Data-parallel over this many devices.")
    parser.add_argument('--mesh-model', type=int, default=1,
                        help="Shard the hash table's feature axis over "
                        "this many of the mesh devices (grid tensor "
                        "parallelism; mesh-devices must be divisible).")
    parser.add_argument('--save-optimizer', action='store_true',
                        help="Persist Adam moments in the final checkpoint "
                        "(doubles checkpoint transfer size).")
    parser.add_argument('--occupancy-grid', action='store_true',
                        help="Maintain an occupancy grid masking density "
                        "in empty/unobserved cells during rendering.")
    parser.add_argument('--occupancy-near-far', action='store_true',
                        help="With --occupancy-grid, also shrink each "
                        "ray's [near, far] to the occupied span (big win "
                        "on mostly-empty scenes; can clip geometry "
                        "thinner than the probe spacing, hence opt-in).")
    parser.add_argument('--stochastic-residual', action='store_true',
                        help="Rao-Blackwellized stochastic gathers "
                        "(with --stochastic-corners 2): the max-weight "
                        "corner enters deterministically, one draw "
                        "covers the remainder — same cost, lower "
                        "estimator variance (biggest win with "
                        "--grid-interp simplex).")
    parser.add_argument('--stochastic-corners', type=int, default=2,
                        help="Hash-grid corners sampled per point in "
                        "training (unbiased estimate of the trilinear "
                        "interpolation at 8/k the gather rows); 0 = exact "
                        "8-corner trilinear.")
    parser.add_argument('--no-stochastic-corners', action='store_true',
                        help="Alias for --stochastic-corners 0.")
    parser.add_argument('--sampled-backward', default='2',
                        help="Exact-forward / sampled-backward hash "
                        "gathers: the forward interpolates exactly and "
                        "each point/level's gradient scatters into only "
                        "N sampled corner rows (1 = importance draw, "
                        "2 = Rao-Blackwellized residual pair) — "
                        "unbiased gradients with zero forward noise. "
                        "Takes precedence over --stochastic-corners; "
                        "2 (the default) is quality-parity with fully "
                        "exact training at ~2.7x the step rate "
                        "(BASELINE.md). 0 disables (exact backward). "
                        "A comma list gives per-level row counts, "
                        "coarsest first (e.g. 4,4,2,2); a count equal "
                        "to the interpolation's corner count (4 "
                        "simplex / 8 trilinear) scatters exactly on "
                        "that level.")
    parser.add_argument('--backward-points', type=float, default=0.25,
                        help="With --sampled-backward, additionally "
                        "subsample the POINTS that scatter gradients "
                        "into the hash table: this fraction of the "
                        "batch's sample points is drawn per step "
                        "proportional to cotangent magnitude (inverse-"
                        "probability weighted, unbiased). Volume-"
                        "rendering gradients concentrate on surface "
                        "samples (measured: the top 25%% of points "
                        "carry ~all the gradient mass), so the default "
                        "0.25 cuts the step's dominant scatter cost "
                        "4x at quality parity (24.19 vs 24.21-24.25 dB "
                        "room 10k — BASELINE.md round 4). 1.0 disables.")
    parser.add_argument('--stochastic-exact-levels', type=int, default=0,
                        help="With stochastic corners, interpolate this "
                        "many of the finest grid levels exactly.")
    parser.add_argument('--sampled-warmup-fraction', type=float,
                        default=0.0,
                        help="With --sampled-backward 2, run this "
                        "leading fraction of the schedule with "
                        "sampled-backward 1 (half the scatter rows; "
                        "gradient noise matters least early).")
    parser.add_argument('--exact-final-fraction', type=float, default=0.0,
                        help="Train the final fraction of the schedule "
                        "with exact trilinear gathers (anneals away the "
                        "stochastic-corner estimator noise). Default 0: "
                        "a 3-seed A/B at the flagship estimator measured "
                        "no tail benefit (the tail scored 0.06 dB WORSE "
                        "on mean PSNR; BASELINE.md round 5).")
    parser.add_argument('--no-metrics', action='store_true',
                        help="Skip the per-epoch metrics.jsonl scalars "
                        "(avoids the one device fetch per epoch, which "
                        "tunneled-TPU relays punish).")
    parser.add_argument('--tensorboard', action='store_true',
                        help="Also write TensorBoard event files to "
                        "<workspace>/run/ngp (the reference's "
                        "tensorboardX path) — scalars per epoch, no "
                        "tensorboardX dependency (train/tb_events.py).")
    parser.add_argument('--profile', type=str, default=None,
                        help="Write a jax.profiler trace of the first "
                        "training epoch to this directory.")
    parser.add_argument('--pose-refine', action='store_true',
                        help="Removed: joint pose refinement makes "
                        "poses WORSE on every capture it was measured "
                        "on (the field co-adapts to pose error faster "
                        "than poses move; NOTES.md). Use "
                        "scripts/register.py to localize frames "
                        "against a trained scene — that surface is "
                        "validated. This flag now errors.")
    # Hidden research surface: the joint BARF-style path stays testable
    # but is not a user-reachable flag that silently degrades results.
    parser.add_argument('--pose-refine-experimental', action='store_true',
                        help=argparse.SUPPRESS)
    flags = parser.parse_args()
    if flags.pose_refine:
        parser.error(
            "--pose-refine was removed: joint refinement reliably makes "
            "poses worse (measured; NOTES.md). Localize frames with "
            "scripts/register.py (validated: 5 deg / 10 cm recovers to "
            "~0.9 deg / 1.6 cm against a trained field), or pass the "
            "hidden --pose-refine-experimental if you are studying the "
            "joint path itself.")
    flags.pose_refine = flags.pose_refine_experimental
    return flags


def _timing_logger():
    import time
    start = [time.time()]

    def mark(label):
        if os.environ.get('AUTOLABEL_TIMING'):
            now = time.time()
            print(f"[timing] {label}: {now - start[0]:.1f}s",
                  file=sys.stderr, flush=True)
            start[0] = now

    return mark


def main():
    flags = read_args()
    mark = _timing_logger()

    dataset = SceneDataset('train',
                           flags.scene,
                           factor=flags.factor_train,
                           batch_size=flags.batch_size,
                           features=flags.features)

    mark('dataset')
    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, flags)

    loss_options = LossOptions(rgb_weight=flags.rgb_weight,
                               depth_weight=flags.depth_weight,
                               semantic_weight=flags.semantic_weight,
                               feature_weight=flags.feature_weight,
                               feature_loss=flags.features is not None)
    # Sampled-backward gathers exist for the wide-row (TPU_GRID) layout
    # only; the narrow reference-preset grid trains with exact gathers.
    sampled_backward = encoders.parse_sampled_backward(
        flags.sampled_backward)
    grid_cfg = field.config.grid
    if grid_cfg is None or grid_cfg.n_features % 8 != 0:
        sampled_backward = 0
    render_options = RenderOptions(
        num_steps=flags.num_steps,
        upsample_steps=flags.upsample_steps,
        perturb=True,
        proposal_steps=flags.proposal_steps if flags.proposal else 0,
        stochastic_corners=(0 if flags.no_stochastic_corners else
                            flags.stochastic_corners),
        stochastic_exact_levels=flags.stochastic_exact_levels,
        stochastic_residual=flags.stochastic_residual,
        sampled_backward=sampled_backward,
        backward_points=flags.backward_points,
        occupancy_near_far=flags.occupancy_near_far)

    mesh = None
    if flags.mesh_devices:
        if flags.mesh_model > 1:
            from autolabel_tpu.parallel import make_mesh_2d
            assert flags.mesh_devices % flags.mesh_model == 0
            mesh = make_mesh_2d(flags.mesh_devices // flags.mesh_model,
                                flags.mesh_model)
        else:
            from autolabel_tpu.parallel import make_mesh
            mesh = make_mesh(flags.mesh_devices)

    occupancy = None
    if flags.occupancy_grid:
        from autolabel_tpu.render.occupancy import (OccupancyGrid,
                                                    OccupancyGridConfig)
        occupancy = OccupancyGrid(OccupancyGridConfig(),
                                  field.config.bound)
        occupancy.mark_untrained_grid(dataset.poses, dataset.intrinsics,
                                      dataset.camera.size)

    if not flags.no_metrics:
        import jax
        if jax.default_backend() == 'axon':
            # Measured twice (rounds 4 and 5): the per-epoch metrics
            # fetch pays the tunnel's first-fetch handshake (40-400 s)
            # and then degrades EVERY subsequent dispatch to ~600 ms —
            # a 10k-iter run that trains in ~2 min fetch-free crawls
            # for 90+ min with metrics on.
            print('WARNING: per-epoch metrics fetches cripple tunneled-'
                  'TPU (axon) training throughput; pass --no-metrics '
                  'for long runs on this runtime.',
                  file=sys.stderr, flush=True)

    model_dir = model_utils.model_dir(flags.scene, flags)
    model_utils.write_params(model_dir, flags)
    pose_refine = None
    if flags.pose_refine:
        dataset.emit_frame_rays = True
        pose_refine = (dataset.rotations, dataset.origins)
    trainer = SimpleTrainer('ngp',
                            field,
                            lr=flags.lr,
                            iters=flags.iters,
                            loss_options=loss_options,
                            render_options=render_options,
                            workspace=model_dir,
                            ema_decay=0.95,
                            use_checkpoint='latest',
                            mesh=mesh,
                            occupancy=occupancy,
                            exact_final_fraction=flags.exact_final_fraction,
                            sampled_warmup_fraction=(
                                flags.sampled_warmup_fraction),
                            metrics=not flags.no_metrics,
                            tensorboard=flags.tensorboard,
                            pose_refine=pose_refine)
    mark('trainer init')

    iters_per_epoch = min(1000, flags.iters)
    epochs = int(np.ceil(flags.iters / iters_per_epoch))
    loader = PrefetchIterator(LenDataset(dataset, iters_per_epoch),
                              transform=trainer._device_batch)
    if flags.profile:
        import jax
        jax.profiler.start_trace(flags.profile)
        trainer.train(loader, 1, iters_per_epoch)
        jax.profiler.stop_trace()
        if epochs > 1:
            trainer.train(loader, epochs - 1, iters_per_epoch)
    else:
        trainer.train(loader, epochs, iters_per_epoch)
    mark('train')
    trainer.save_checkpoint(include_optimizer=flags.save_optimizer)
    mark('save checkpoint')

    if pose_refine is not None:
        from autolabel_tpu.train.pose_refine import refined_poses
        R, t = refined_poses(
            {k: np.asarray(v)
             for k, v in trainer.state['params']['pose'].items()},
            (np.asarray(dataset.rotations), np.asarray(dataset.origins)))
        stems = [os.path.basename(p).split('.')[0]
                 for p in dataset.scene.rgb_paths()]
        np.savez(os.path.join(model_dir, 'poses_refined.npz'),
                 R=R, t=t,
                 frames=np.array([stems[i] for i in dataset.indices]))
        print(f"refined poses (ngp frame) -> "
              f"{os.path.join(model_dir, 'poses_refined.npz')}")

    if flags.eval:
        testset = SceneDataset('test',
                               flags.scene,
                               factor=flags.factor_test,
                               batch_size=flags.batch_size * 2)
        losses = []
        for i in range(len(testset.poses)):
            _, loss = trainer.eval_step(testset._get_test(i))
            losses.append(loss)
        mse = float(np.mean(losses))
        print(f"eval: mse={mse:.5f} psnr={-10 * np.log10(mse):.2f}dB")


if __name__ == "__main__":
    main()
