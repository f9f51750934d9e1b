"""Open-vocabulary (vision-language) segmentation benchmark driver.

Renders CLIP-space feature maps (or queries the field at gt mesh vertices
with --pc) and scores cosine-similarity argmax predictions against ground
truth, printing per-class mIoU/mAcc tables.

CLI parity: reference scripts/language/evaluate.py (including the
hardcoded 606-class model constructor, line 133 — the checkpointed
semantic head shape for ScanNet experiments).
"""
import argparse
import json
import os
import sys

import numpy as np
import pandas

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.evaluation import OpenVocabEvaluator2D, OpenVocabEvaluator3D
from autolabel_tpu.inference import InferenceModel

SCANNET_N_CLASSES = 606


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scenes', nargs='+')
    parser.add_argument('--batch-size', default=8182, type=int)
    parser.add_argument('--vis', default=None, type=str)
    parser.add_argument('--workspace', type=str, default=None)
    parser.add_argument('--out',
                        default=None,
                        type=str,
                        help="Where to write results as json, if anywhere.")
    parser.add_argument('--label-map', type=str, required=True)
    parser.add_argument('--feature-checkpoint', '-f', type=str,
                        default=None)
    parser.add_argument('--allow-fallback', action='store_true',
                        help="Permit deterministic stand-in features/text "
                        "embeddings when real teacher weights are "
                        "unavailable (testing only).")
    parser.add_argument(
        '--stride',
        type=int,
        default=1,
        help="Only evaluate every Nth frame to save time or for debugging.")
    parser.add_argument(
        '--pc',
        action='store_true',
        help="Evaluate point cloud segmentation accuracy instead of 2D "
        "segmentation maps.")
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--only-scene-classes', action='store_true')
    parser.add_argument('--random',
                        action='store_true',
                        help="Randomize the order of the scenes.")
    parser.add_argument('--time', action='store_true')
    return parser.parse_args()


def get_nerf_dir(scene, flags):
    scene_name = os.path.basename(os.path.normpath(scene))
    if flags.workspace is None:
        return os.path.join(scene, 'nerf')
    return os.path.join(flags.workspace, scene_name)


def gather_models(flags, scene_dirs):
    models = set()
    for scene in scene_dirs:
        nerf_dir = get_nerf_dir(scene, flags)
        if not os.path.exists(nerf_dir):
            continue
        for model in os.listdir(nerf_dir):
            if os.path.exists(os.path.join(nerf_dir, model, 'checkpoints')):
                models.add(model)
    return list(models)


def read_label_map(path):
    return pandas.read_csv(path)


def write_results(out, results):
    with open(out, 'wt') as f:
        f.write(json.dumps(results, indent=2))


def main(flags):
    if len(flags.scenes) == 1 and not os.path.exists(
            os.path.join(flags.scenes[0], 'rgb')):
        # A directory full of scenes rather than a list of scenes.
        scene_dir = flags.scenes[0]
        scene_dirs = [
            os.path.join(scene_dir, scene)
            for scene in os.listdir(scene_dir)
            if os.path.exists(os.path.join(scene_dir, scene, 'rgb'))
        ]
    else:
        scene_dirs = flags.scenes

    original_labels = read_label_map(flags.label_map)

    scene_names = [os.path.basename(os.path.normpath(p))
                   for p in scene_dirs]
    scenes = list(zip(scene_dirs, scene_names))
    if flags.random:
        import random
        random.shuffle(scenes)
    else:
        scenes = sorted(scenes, key=lambda x: x[1])
    ious, accs = [], []
    evaluator = None

    for scene, scene_name in scenes:
        models = gather_models(flags, [scene])
        if len(models) == 0:
            print(f"Skipping scene {scene_name} because no models were "
                  "found.")
            continue
        model_hash = models[0]
        print(f"Using model {model_hash}")
        print(f"Evaluating scene {scene_name}")

        nerf_dir = get_nerf_dir(scene, flags)
        model_path = os.path.join(nerf_dir, model_hash)
        params = model_utils.read_params(model_path)
        dataset = SceneDataset('test',
                               scene,
                               factor=4.0,
                               batch_size=flags.batch_size,
                               lazy=True)
        if flags.only_scene_classes:
            classes_in_scene = dataset.scene.metadata.get('classes', None)
            if classes_in_scene is None:
                label_map = original_labels
            else:
                label_map = original_labels[
                    original_labels['id'].isin(classes_in_scene)]
        else:
            label_map = original_labels

        field = model_utils.create_model(dataset.min_bounds,
                                         dataset.max_bounds,
                                         SCANNET_N_CLASSES, params)
        checkpoint_dir = os.path.join(model_path, 'checkpoints')
        if (not os.path.exists(checkpoint_dir)
                or len(os.listdir(checkpoint_dir)) == 0):
            continue
        model = InferenceModel.from_checkpoint(
            field, model_path, max_ray_batch=flags.batch_size)

        vis_path = (os.path.join(flags.vis, scene_name)
                    if flags.vis is not None else None)
        if evaluator is None:
            cls = OpenVocabEvaluator3D if flags.pc else OpenVocabEvaluator2D
            evaluator = cls(features=params.features,
                            name=scene_name,
                            checkpoint=flags.feature_checkpoint,
                            stride=flags.stride,
                            debug=flags.debug,
                            save_figures=vis_path,
                            time=flags.time,
                            allow_fallback=flags.allow_fallback)
        assert evaluator.features == params.features
        evaluator.reset(model, label_map, vis_path)
        iou, acc = evaluator.eval(dataset)

        ious.append(iou)
        accs.append(acc)
        print_results([iou], [acc])
    print_results(ious, accs)
    if flags.out is not None:
        write_results(flags.out, {'iou': ious, 'acc': accs})


def print_results(ious, accs):
    from rich.console import Console
    from rich.table import Table
    table = Table()
    table.add_column('Class')
    table.add_column('mIoU')
    table.add_column('mAcc')

    def percentage_to_string(value):
        return "N/A" if value is None else f"{value * 100:.1f}"

    reduced_iou, reduced_acc = {}, {}
    for iou in ious:
        for key, value in iou.items():
            reduced_iou.setdefault(key, [])
            if value is not None:
                reduced_iou[key].append(value)
    for acc in accs:
        for key, value in acc.items():
            reduced_acc.setdefault(key, [])
            if value is not None:
                reduced_acc[key].append(value)
    for key, values in reduced_iou.items():
        if key == 'total':
            continue
        miou = np.mean(values) if values else None
        macc = (np.mean(reduced_acc[key])
                if reduced_acc.get(key) else None)
        table.add_row(key, percentage_to_string(miou),
                      percentage_to_string(macc))

    totals = [r['total'] for r in ious if 'total' in r]
    totals_acc = [r['total'] for r in accs if 'total' in r]
    table.add_row('Total',
                  percentage_to_string(np.mean(totals) if totals else None),
                  percentage_to_string(
                      np.mean(totals_acc) if totals_acc else None))
    Console().print(table)


if __name__ == "__main__":
    main(read_args())
