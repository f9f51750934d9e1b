"""Quality A/B of hash-grid layouts on a real scene directory.

Trains the flagship configuration (proposal sampling, stochastic-corner
gathers with exact annealing tail) for --iters on --scene with the given
grid layout, then evaluates PSNR / depth error / semantic accuracy on
the test split with exact gathers. One JSON line per run.

Usage:
  python benchmarks/grid_quality_ab.py .scenes/room --grid L4_F128_T15 \
      --iters 3000 [--corners 2] [--batch 4096]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GRIDS = {
    'L4_F128_T15': (4, 128, 15, 16, 5.04),      # current TPU_GRID
    'L3_F128_T15': (3, 128, 15, 16, 11.31),
    'L3_F128_T16': (3, 128, 16, 16, 11.31),
    'L2_F128_T16': (2, 128, 16, 16, 128.0),
    'L2_F256_T15': (2, 256, 15, 16, 128.0),
    'L1_F512_T15': (1, 512, 15, 2048, 1.0),
    'REF_L16_F2_T19': (16, 2, 19, 16, 2.0),     # reference tcnn shape
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--grid', default='L4_F128_T15', choices=GRIDS)
    parser.add_argument('--iters', type=int, default=3000)
    parser.add_argument('--batch', type=int, default=4096)
    parser.add_argument('--corners', type=int, default=2)
    parser.add_argument('--num-steps', type=int, default=32)
    parser.add_argument('--proposal-steps', type=int, default=64)
    parser.add_argument('--factor', type=float, default=1.0)
    parser.add_argument('--occupancy', action='store_true',
                        help='Maintain the occupancy grid during '
                        'training (BASELINE config 2 machinery).')
    parser.add_argument('--exact-levels', type=int, default=0,
                        help='Finest grid levels interpolated exactly '
                        'during the stochastic phase.')
    parser.add_argument('--exact-final-fraction', type=float, default=0.0)
    parser.add_argument('--residual', action='store_true',
                        help='Rao-Blackwellized 2-row estimator (max-'
                        'weight corner deterministic + residual draw).')
    parser.add_argument('--sampled-warmup-fraction', type=float,
                        default=0.0)
    parser.add_argument('--sampled-backward', default='0',
                        help='Exact-forward / sampled-backward gathers '
                        '(1 or 2 scatter rows; overrides --corners).')
    parser.add_argument('--backward-points', type=float, default=1.0,
                        help='Magnitude-weighted point subsample of the '
                        'sampled-backward scatter (fraction in (0, 1]).')
    parser.add_argument('--interp', default='trilinear',
                        choices=['trilinear', 'simplex'],
                        help='Hash-grid interpolant (model-level; eval '
                        'uses the same interpolant, exactly).')
    parser.add_argument('--seed', type=int, default=0,
                        help='Trainer init/step PRNG seed (data sampling '
                        'is independently unseeded per process).')
    flags = parser.parse_args()

    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import LenDataset, SceneDataset
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig, parse_sampled_backward
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.loader import PrefetchIterator
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    dataset = SceneDataset('train', flags.scene, factor=flags.factor,
                           batch_size=flags.batch)
    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    n_classes = dataset.n_classes or 2
    grid = HashGridConfig(*GRIDS[flags.grid])
    field = Field(
        FieldConfig(encoding='hg+freq', hidden_dim=128,
                    hidden_dim_color=128, hidden_dim_semantic=64,
                    semantic_classes=n_classes, bound=bound, grid=grid,
                    proposal=True, grid_interp=flags.interp))
    occupancy = None
    if flags.occupancy:
        from autolabel_tpu.render.occupancy import (OccupancyGrid,
                                                    OccupancyGridConfig)
        occupancy = OccupancyGrid(OccupancyGridConfig(), bound)
        occupancy.mark_untrained_grid(dataset.poses, dataset.intrinsics,
                                      dataset.camera.size)

    trainer = SimpleTrainer(
        'ngp', field, lr=5e-3, iters=flags.iters, occupancy=occupancy,
        loss_options=LossOptions(),
        render_options=RenderOptions(
            num_steps=flags.num_steps,
            proposal_steps=flags.proposal_steps,
            perturb=True,
            stochastic_corners=flags.corners,
            stochastic_exact_levels=flags.exact_levels,
            stochastic_residual=flags.residual,
            sampled_backward=parse_sampled_backward(flags.sampled_backward),
            backward_points=flags.backward_points),
        workspace=None, ema_decay=0.95,
        exact_final_fraction=flags.exact_final_fraction,
        sampled_warmup_fraction=flags.sampled_warmup_fraction,
        metrics=False, seed=flags.seed)

    iters_per_epoch = min(1000, flags.iters)
    epochs = int(np.ceil(flags.iters / iters_per_epoch))
    loader = PrefetchIterator(LenDataset(dataset, iters_per_epoch),
                              transform=trainer._device_batch)
    start = time.perf_counter()
    for epoch in range(epochs):
        trainer.train(loader, 1, iters_per_epoch)
        # Liveness print (round-5 tunnel lesson: a run that prints
        # nothing until the end is indistinguishable from a wedged one).
        # Deliberately fetch-free — dispatch wall-clock only; the
        # SYNC_EVERY bound keeps it loosely coupled to real execution.
        print(f'[grid_quality_ab] epoch {epoch + 1}/{epochs} dispatched '
              f't={time.perf_counter() - start:.0f}s',
              file=sys.stderr, flush=True)
    # Fetch-fence the queued steps before reading the clock.
    _ = np.asarray(trainer.state['params']['sigma_net'][0][0]).ravel()[0]
    wall = time.perf_counter() - start

    testset = SceneDataset('test', flags.scene, factor=flags.factor,
                           batch_size=flags.batch * 2)
    mses, depth_errs, sem_accs = [], [], []
    for i in range(len(testset.poses)):
        batch = testset._get_test(i)
        out, mse = trainer.eval_step(batch)
        mses.append(float(mse))
        gt_depth = np.asarray(batch['depth']).reshape(-1)
        depth = np.asarray(out['depth']).reshape(-1)
        mask = gt_depth > 0
        if mask.any():
            depth_errs.append(float(np.abs(depth[mask] -
                                           gt_depth[mask]).mean()))
        gt_sem = np.asarray(batch['semantic']).reshape(-1)
        sem = np.argmax(np.asarray(out['semantic']).reshape(
            -1, n_classes), axis=-1)
        labeled = gt_sem >= 0
        if labeled.any():
            sem_accs.append(float((sem[labeled] == gt_sem[labeled]).mean()))

    mse = float(np.mean(mses))
    print(json.dumps({
        'scene': os.path.basename(os.path.normpath(flags.scene)),
        'grid': flags.grid,
        'interp': flags.interp,
        'corners': flags.corners,
        'residual': flags.residual,
        'sampled_backward': flags.sampled_backward,
        'backward_points': flags.backward_points,
        'occupancy': flags.occupancy,
        'exact_levels': flags.exact_levels,
        'exact_final_fraction': flags.exact_final_fraction,
        'iters': flags.iters,
        'seed': flags.seed,
        'psnr_db': round(-10 * np.log10(mse), 2),
        'depth_mae': round(float(np.mean(depth_errs)), 4),
        'sem_acc': round(float(np.mean(sem_accs)), 4) if sem_accs else None,
        'train_wall_s': round(wall, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
