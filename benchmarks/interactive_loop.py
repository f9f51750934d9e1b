"""Measure the INTERACTIVE product loop end to end on the current device.

Every other benchmark here is offline; this one times the thing the
user actually feels — the paint -> update_image -> train -> get_image
preview round trip, at the reference GUI's cadence (a preview request
every 5 s, 50 ms pipe polling: /root/reference/scripts/gui.py:20,175-182)
— for BOTH preview paths:

  volumetric: trainer.test_step full staged render per request
              (the reference's only mode, autolabel/backend.py:123-152);
  baked:      governed splat-cache render + incremental slab refreshes
              interleaved with training (--baked-preview wiring).

Reports train steps/s sustained WHILE serving previews, the preview
round-trip latency distribution, and the paint-propagation latency.
Prints one JSON line per mode. Single process: safe on the one-process
TPU tunnel.

Usage: python benchmarks/interactive_loop.py [--seconds 30]
       [--modes volumetric baked] [--size 640 480] [--batch-size 4096]
"""
import argparse
import json
import multiprocessing
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))


class _Flags:
    lr = 1e-4
    geometric_features = 15
    encoding = 'hg+freq'
    features = None
    rgb_weight = 1.0
    semantic_weight = 1.0
    feature_weight = 0.5
    depth_weight = 0.1
    feature_dim = 64
    grid_preset = 'tpu'
    batch_size = 4096
    baked_preview = False
    rebake_every = 2000
    # Flagship training schedule (what BASELINE.md's rays/s headline
    # uses): 64 proposal + 32 main samples instead of 128 dense — 4x
    # fewer field points per step. GUI users opt in with --proposal.
    proposal = True
    proposal_steps = 64


def drive(scene, flags, seconds, preview_period, n_frames, factor=4.0):
    import cv2

    from autolabel_tpu.backend import TrainingLoop

    parent, child = multiprocessing.Pipe()
    # factor=4.0 is the PRODUCT configuration: the GUI backend builds its
    # dataset at quarter resolution (reference autolabel/backend.py:22-26),
    # so previews render 1/16th the rays/bytes of the capture. --full-res
    # measures the off-design full-resolution path.
    loop = TrainingLoop(scene, flags, child, dataset_factor=factor)
    loop.trainer.init(loop.train_dataset)

    # Warmup: compile the train step and the preview path.
    for _ in range(3):
        loop.trainer.take_step()
    parent.send(('get_image', 0))
    loop._check_messages()
    assert parent.poll(600)
    parent.recv()

    # Baseline steps/s with no preview traffic.
    base_n = 50
    t0 = time.perf_counter()
    for _ in range(base_n):
        loop.trainer.take_step()
    base_steps_s = base_n / (time.perf_counter() - t0)

    # Measured phase at reference cadence.
    rtts = []
    steps = 0
    start = time.perf_counter()
    next_preview = start
    while True:
        now = time.perf_counter()
        if now - start >= seconds:
            break
        if now >= next_preview:
            sent = time.perf_counter()
            parent.send(('get_image', len(rtts) % n_frames))
            loop._check_messages()
            assert parent.poll(600)
            parent.recv()
            rtts.append(time.perf_counter() - sent)
            next_preview += preview_period
        loop.trainer.take_step()
        loop._maybe_update_bake()
        steps += 1
    elapsed = time.perf_counter() - start

    # Paint propagation: repaint one label PNG, notify, time until the
    # sampler sees it (the reference's disk-is-the-protocol path).
    name = loop.train_dataset.image_names[1]
    semantic_path = os.path.join(scene, 'semantic', f'{name}.png')
    labels = np.full(np.asarray(loop.train_dataset.semantics[1]).shape, 1,
                     np.uint8)
    cv2.imwrite(semantic_path, labels)
    sent = time.perf_counter()
    parent.send(('update_image', 1))
    loop._check_messages()
    paint_s = time.perf_counter() - sent

    rtts_ms = np.asarray(rtts) * 1000
    preview_s = float(rtts_ms.sum()) / 1000
    stepping_s = max(elapsed - preview_s, 1e-9)
    return {
        'steps_per_s': round(steps / elapsed, 1),
        'steps_per_s_between_previews': round(steps / stepping_s, 1),
        'baseline_steps_per_s': round(base_steps_s, 1),
        'previews_served': len(rtts),
        'preview_wh': list(loop.train_dataset.camera.size),
        'preview_rtt_ms_mean': round(float(rtts_ms.mean()), 1),
        'preview_rtt_ms_p90': round(float(np.percentile(rtts_ms, 90)), 1),
        'preview_rtt_ms_max': round(float(rtts_ms.max()), 1),
        'paint_propagate_ms': round(paint_s * 1000, 1),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--seconds', type=float, default=30.0)
    parser.add_argument('--preview-period', type=float, default=5.0,
                        help='reference GUI preview cadence (gui.py:20)')
    parser.add_argument('--modes', nargs='+',
                        default=['volumetric', 'baked'],
                        choices=['volumetric', 'baked'])
    parser.add_argument('--size', type=int, nargs=2, default=(640, 480))
    parser.add_argument('--frames', type=int, default=12)
    parser.add_argument('--batch-size', type=int, default=4096)
    parser.add_argument('--full-res', action='store_true',
                        help='preview at capture resolution instead of '
                        'the product factor-4 dataset (backend.py)')
    parser.add_argument('--scene', default=None,
                        help='existing scene dir (default: synthetic)')
    flags_in = parser.parse_args()

    scene = flags_in.scene
    if scene is None:
        from synthetic import make_synthetic_scene
        scene = '/tmp/interactive_loop_scene'
        if not os.path.exists(os.path.join(scene, 'rgb')):
            make_synthetic_scene(scene, n_frames=flags_in.frames,
                                 width=flags_in.size[0],
                                 height=flags_in.size[1])

    for mode in flags_in.modes:
        flags = _Flags()
        flags.batch_size = flags_in.batch_size
        flags.baked_preview = mode == 'baked'
        result = drive(scene, flags, flags_in.seconds,
                       flags_in.preview_period, flags_in.frames,
                       factor=1.0 if flags_in.full_res else 4.0)
        print(json.dumps({
            'metric': f'interactive_loop_{mode}',
            'value': result['steps_per_s'],
            'unit': 'steps/s with previews',
            'preview_size': list(flags_in.size),
            **result,
        }), flush=True)


if __name__ == '__main__':
    main()
