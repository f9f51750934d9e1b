"""Measure baked-preview rendering fps at 720p on the current device.

Builds the flagship field (TPU grid preset), bakes it into the
fixed-size splat cloud, and times BakedRenderer at 1280x720 with a
moving camera (fetch-fenced, like bench.py). Also times the
steady-state INCREMENTAL refresh (IncrementalBaker.update_next_block)
at the exact configuration the GUI backend runs (resolution 128,
2^18 splats, 16 slabs — backend.py), so the interactive story is
benchmarked as wired: per-frame render cost + per-slab refresh cost.
Prints one JSON line.

Usage: python benchmarks/preview_fps.py [--resolution 128]
       [--max-points 18] [--frames 30] [--size 1280 720]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def look_at(position, target):
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.array([0.0, 0.0, 1.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    T_WC = np.eye(4)
    T_WC[:3, 0], T_WC[:3, 1], T_WC[:3, 2] = right, down, forward
    T_WC[:3, 3] = position
    return np.linalg.inv(T_WC)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--max-points', type=int, default=18,
                        help='log2 of the splat budget')
    parser.add_argument('--frames', type=int, default=30)
    parser.add_argument('--size', type=int, nargs=2, default=(1280, 720))
    parser.add_argument('--no-sh', action='store_true',
                        help='Disable degree-1 SH view-dependent color.')
    flags = parser.parse_args()

    import jax

    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import TPU_GRID
    from autolabel_tpu.render.baked import (BakedRenderer,
                                            GovernedPreviewRenderer,
                                            IncrementalBaker, bake)

    field = Field(
        FieldConfig(encoding='hg+freq', hidden_dim=128,
                    hidden_dim_color=128, hidden_dim_semantic=64,
                    semantic_classes=6, bound=2.0, grid=TPU_GRID,
                    proposal=True))
    params = field.init(jax.random.PRNGKey(0))

    bake_start = time.perf_counter()
    baked = bake(field, params, resolution=flags.resolution,
                 max_points=2 ** flags.max_points, alpha_threshold=0.0,
                 view_dependent=not flags.no_sh)
    # Fill the budget regardless of the random field's density so the
    # timing reflects the full splat count.
    bake_s = time.perf_counter() - bake_start

    renderer = BakedRenderer(baked)
    width, height = flags.size
    focal = 0.9 * width
    intrinsics = np.array([[focal, 0, width / 2],
                           [0, focal, height / 2],
                           [0, 0, 1.0]])

    poses = []
    for i in range(flags.frames):
        angle = 2 * np.pi * i / flags.frames
        position = np.array([2.5 * np.cos(angle), 2.5 * np.sin(angle), 1.0])
        poses.append(look_at(position, np.zeros(3)))

    # Compile + handshake.
    out = renderer.render(intrinsics, poses[0], (width, height))
    _ = float(np.asarray(out['depth']).sum())

    start = time.perf_counter()
    for pose in poses:
        out = renderer.render(intrinsics, pose, (width, height))
    _ = float(np.asarray(out['depth']).sum())  # fence
    elapsed = time.perf_counter() - start

    fps = flags.frames / elapsed

    # Governed renderer (the backend's wiring): warm every budget level,
    # then measure SUSTAINED fps with the governor choosing the level.
    governed = GovernedPreviewRenderer(baked, target_fps=30.0)
    governed.warmup(intrinsics, (width, height))
    gov_frames = 3 * flags.frames
    gov_start = time.perf_counter()
    for i in range(gov_frames):
        out = governed.render(intrinsics, poses[i % len(poses)],
                              (width, height))
    gov_elapsed = time.perf_counter() - gov_start
    gov_fps = gov_frames / gov_elapsed

    # Steady-state incremental refresh at the backend's exact config.
    baker = IncrementalBaker(field, resolution=flags.resolution,
                             max_points=2 ** flags.max_points,
                             view_dependent=not flags.no_sh)
    baker.update_next_block(params)  # compile
    n_blocks = 4
    block_start = time.perf_counter()
    for _ in range(n_blocks):
        baker.update_next_block(params)
    block_s = (time.perf_counter() - block_start) / n_blocks

    print(json.dumps({
        'metric': 'preview_fps_720p',
        'value': round(gov_fps, 2),
        'unit': 'frames/s',
        'resolution': list(flags.size),
        'splats': int(baked.n_valid),
        'bake_s': round(bake_s, 1),
        'sh': not flags.no_sh,
        'fixed_budget_fps': round(fps, 2),
        'fixed_ms_per_frame': round(elapsed / flags.frames * 1000, 2),
        'governor_level': governed.level,
        'governor_frames': gov_frames,
        'block_refresh_s': round(block_s, 2),
        'full_refresh_s': round(block_s * baker.n_blocks, 1),
    }))


if __name__ == '__main__':
    main()
