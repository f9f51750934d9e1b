"""Closed-set benchmark driver: per-scene x per-model IoU matrix against
labelme gt_masks, rich table output.

CLI parity: reference scripts/evaluate.py.
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


def get_nerf_dir(scene, flags):
    scene_name = os.path.basename(os.path.normpath(scene))
    if flags.workspace is None:
        return os.path.join(scene, 'nerf')
    return os.path.join(flags.workspace, scene_name)


def gather_models(flags):
    models = set()
    for scene in flags.scenes:
        nerf_dir = get_nerf_dir(scene, flags)
        if not os.path.exists(nerf_dir):
            continue
        for model in os.listdir(nerf_dir):
            if os.path.exists(os.path.join(nerf_dir, model, 'checkpoints')):
                models.add(model)
    return list(models)


def write_results(out, results):
    with open(out, 'wt') as f:
        f.write(json.dumps(results, indent=2))


def main(flags):
    models = gather_models(flags)
    classes = ["Background", "Class 1"]
    scene_names = [os.path.basename(os.path.normpath(p))
                   for p in flags.scenes]
    scenes = sorted(zip(flags.scenes, scene_names), key=lambda x: x[1])
    ious = np.ones((len(scenes), len(models))) * -1.0
    results = []
    for scene_index, (scene, scene_name) in enumerate(scenes):
        print(f"Evaluating scene {scene_name}")
        nerf_dir = get_nerf_dir(scene, flags)
        for model_hash in models:
            model_path = os.path.join(nerf_dir, model_hash)
            if not os.path.exists(model_path):
                continue
            checkpoint_dir = os.path.join(model_path, 'checkpoints')
            if (not os.path.exists(checkpoint_dir)
                    or len(os.listdir(checkpoint_dir)) == 0):
                continue
            params = model_utils.read_params(model_path)
            dataset = SceneDataset('test',
                                   scene,
                                   factor=4.0,
                                   batch_size=flags.batch_size,
                                   lazy=True)
            n_classes = (dataset.n_classes
                         if dataset.n_classes is not None else 2)
            field = model_utils.create_model(dataset.min_bounds,
                                             dataset.max_bounds, n_classes,
                                             params)
            model = InferenceModel.from_checkpoint(
                field, model_path, max_ray_batch=flags.batch_size)

            save_figure_dir = None
            if flags.write_images is not None:
                save_figure_dir = os.path.join(flags.write_images, scene_name)
            evaluator = Evaluator(model,
                                  classes,
                                  name=model_hash,
                                  save_figures=save_figure_dir)
            result = evaluator.eval(dataset, flags.vis)
            if len(result) == 0:
                continue
            miou = float(np.mean(list(result.values())))
            model_index = models.index(model_hash)
            assert ious[scene_index, model_index] < 0.0
            ious[scene_index, model_index] = miou
            entry = dict(vars(params))
            entry['scene'] = scene_name
            entry['iou'] = miou
            results.append(entry)

    if flags.out is not None:
        write_results(flags.out, results)

    from rich.console import Console
    from rich.table import Table
    table = Table()
    table.add_column('Scene')
    for model in models:
        table.add_column(model)
    for scene_name, scene_ious in zip([n for _, n in scenes], ious):
        table.add_row(scene_name, *[f"{v:.03f}" for v in scene_ious])
    table.add_row('Total', *[f"{v:.03f}" for v in ious.mean(axis=0)],
                  end_section=True)
    Console().print(table)


if __name__ == "__main__":
    main(read_args())
