"""Export dense semantic segmentation maps from trained scenes.

usage: python scripts/export.py <scene1> <scene2> ... --workspace <ws>

Output frames are saved at <scene>/output/semantic/.
CLI parity: reference scripts/export.py; skimage.measure.label is replaced
by scipy.ndimage.label (skimage unavailable here).
"""
import os
import sys

import cv2
import numpy as np
from scipy import ndimage
from tqdm import tqdm

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.inference import InferenceModel
from autolabel_tpu.utils import Scene

MAX_WIDTH = 640


def read_args():
    parser = model_utils.model_flag_parser()
    parser.add_argument('scenes', nargs='+')
    parser.add_argument('--workspace', type=str)
    parser.add_argument('--objects',
                        type=int,
                        default=None,
                        help="""
            If specified, find the specified number of largest connected
            components per class in the produced semantic maps as a
            post-processing step, removing noise from the maps.""")
    parser.add_argument('--num-steps', type=int, default=512)
    return parser.parse_args()


def lookup_frame_size(scene):
    width, height = Scene(scene).peak_image_size()
    if width > MAX_WIDTH:
        scale = MAX_WIDTH / width
        width *= scale
        height *= scale
    return (int(np.round(width)), int(np.round(height)))


def find_largest_components(p_semantic, class_id, object_count):
    mask = (p_semantic == class_id).astype(np.int32)
    labels, n = ndimage.label(mask)
    if n == 0:
        return []
    counts = np.bincount(labels.ravel())[1:]
    order = np.argsort(counts)[::-1]
    return [labels == (order[i] + 1) for i in range(min(object_count, n))]


def post_process(flags, p_semantic):
    out = np.zeros_like(p_semantic)
    for class_id in np.unique(p_semantic):
        if class_id == 0:
            continue  # background
        for component in find_largest_components(p_semantic, class_id,
                                                 flags.objects):
            out[component] = class_id
    return out


def export_labels(flags, scene):
    scene = scene.rstrip(os.path.sep)
    scene_name = os.path.basename(scene)
    if flags.workspace is not None:
        model_dir = os.path.join(flags.workspace, scene_name)
    else:
        model_dir = os.path.join(scene, 'nerf')
    models = os.listdir(model_dir) if os.path.exists(model_dir) else []
    if len(models) > 1:
        print(f"Warning: scene {scene} has more than 1 model directory. "
              f"Using {models[0]}.")
    elif len(models) == 0:
        print(f"Warning: scene {scene} has no trained models. Skipping.")
        return
    model_dir = os.path.join(model_dir, models[0])
    model_params = model_utils.read_params(model_dir)

    dataset = SceneDataset('train',
                           scene,
                           size=lookup_frame_size(scene),
                           batch_size=16384,
                           features=model_params.features,
                           load_semantic=False)

    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, model_params)
    model = InferenceModel.from_checkpoint(field, model_dir,
                                           num_steps=flags.num_steps,
                                           max_ray_batch=16384)

    output_path = os.path.join(scene, 'output', 'semantic')
    os.makedirs(output_path, exist_ok=True)

    for frame_index, rgb_path in zip(tqdm(dataset.indices),
                                     dataset.scene.rgb_paths()):
        batch = dataset._get_test(frame_index)
        frame = model.render(batch)['semantic'].argmax(axis=-1)
        if flags.objects is not None:
            frame = post_process(flags, frame)
        frame_name = os.path.splitext(os.path.basename(rgb_path))[0]
        cv2.imwrite(os.path.join(output_path, f"{frame_name}.png"),
                    frame.astype(np.uint8))


def main():
    flags = read_args()
    for scene in flags.scenes:
        export_labels(flags, scene)


if __name__ == "__main__":
    main()
