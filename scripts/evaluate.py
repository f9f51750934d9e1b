"""Closed-set benchmark driver: per-scene x per-model IoU against labelme
gt_masks.

Behavior contract from the reference CLI (/root/reference/scripts/
evaluate.py): same flags, json entries (params + scene + iou) and a rich
table of scenes x model hashes with a trailing Total row. Rebuilt around
a results registry + workspace iterator instead of the reference's
index-matrix loop.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.evaluation import Evaluator
from autolabel_tpu.inference import InferenceModel

CLASS_NAMES = ['Background', 'Class 1']


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scenes', nargs='+')
    parser.add_argument('--batch-size', default=8182, type=int)
    parser.add_argument('--vis', action='store_true')
    parser.add_argument('--workspace', type=str, default=None)
    parser.add_argument('--write-images', type=str, default=None)
    parser.add_argument('--out',
                        default=None,
                        type=str,
                        help="Where to write results as json, if anywhere.")
    return parser.parse_args()


def nerf_dir_for(scene, workspace):
    """Model workspaces live under <scene>/nerf or <workspace>/<scene>."""
    if workspace is None:
        return os.path.join(scene, 'nerf')
    return os.path.join(workspace, os.path.basename(os.path.normpath(scene)))


def iter_model_workspaces(scene, workspace):
    """Yield (model_hash, model_path) for every trained model of a scene."""
    nerf_dir = nerf_dir_for(scene, workspace)
    if not os.path.isdir(nerf_dir):
        return
    for model_hash in sorted(os.listdir(nerf_dir)):
        checkpoint_dir = os.path.join(nerf_dir, model_hash, 'checkpoints')
        if os.path.isdir(checkpoint_dir) and os.listdir(checkpoint_dir):
            yield model_hash, os.path.join(nerf_dir, model_hash)


class EvaluationRun:
    """Collects mIoU per (scene, model hash) and renders the report."""

    def __init__(self):
        self.miou = {}  # (scene_name, model_hash) -> float
        self.scene_names = []
        self.model_hashes = []
        self.json_entries = []

    def record(self, scene_name, model_hash, params, per_class_iou):
        if not per_class_iou:
            return
        value = float(np.mean(list(per_class_iou.values())))
        self.miou[(scene_name, model_hash)] = value
        if scene_name not in self.scene_names:
            self.scene_names.append(scene_name)
        if model_hash not in self.model_hashes:
            self.model_hashes.append(model_hash)
        entry = dict(vars(params))
        entry['scene'] = scene_name
        entry['iou'] = value
        self.json_entries.append(entry)

    def row(self, scene_name):
        return [self.miou.get((scene_name, h), -1.0)
                for h in self.model_hashes]

    def print_table(self):
        from rich.console import Console
        from rich.table import Table
        table = Table()
        table.add_column('Scene')
        for model_hash in self.model_hashes:
            table.add_column(model_hash)
        rows = []
        for scene_name in self.scene_names:
            row = self.row(scene_name)
            rows.append(row)
            table.add_row(scene_name, *[f'{v:.03f}' for v in row])
        if rows:
            totals = np.asarray(rows).mean(axis=0)
            table.add_row('Total', *[f'{v:.03f}' for v in totals],
                          end_section=True)
        Console().print(table)


def evaluate_workspace(scene, model_hash, model_path, flags):
    """Load one trained model and compute per-class IoU on its scene."""
    params = model_utils.read_params(model_path)
    dataset = SceneDataset('test',
                           scene,
                           factor=4.0,
                           batch_size=flags.batch_size,
                           lazy=True)
    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, params)
    model = InferenceModel.from_checkpoint(field, model_path,
                                           max_ray_batch=flags.batch_size)
    figure_dir = None
    if flags.write_images is not None:
        scene_name = os.path.basename(os.path.normpath(scene))
        figure_dir = os.path.join(flags.write_images, scene_name)
    evaluator = Evaluator(model, CLASS_NAMES, name=model_hash,
                          save_figures=figure_dir)
    return params, evaluator.eval(dataset, flags.vis)


def main(flags):
    run = EvaluationRun()
    for scene in sorted(flags.scenes,
                        key=lambda p: os.path.basename(os.path.normpath(p))):
        scene_name = os.path.basename(os.path.normpath(scene))
        print(f'Evaluating scene {scene_name}')
        for model_hash, model_path in iter_model_workspaces(
                scene, flags.workspace):
            try:
                params, per_class_iou = evaluate_workspace(
                    scene, model_hash, model_path, flags)
            except Exception as e:
                # Workspaces can hold foreign checkpoints (e.g. the
                # reference's torch pickles) — skip, don't abort the run.
                print(f'Skipping {model_hash}: cannot load ({e!r})')
                continue
            run.record(scene_name, model_hash, params, per_class_iou)

    if flags.out is not None:
        with open(flags.out, 'wt') as f:
            json.dump(run.json_entries, f, indent=2)
    run.print_table()


if __name__ == '__main__':
    main(read_args())
