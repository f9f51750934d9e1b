"""Render a trained scene to a 2x2-tiled video (rgb | depth / semantic |
feature-PCA).

CLI parity: reference scripts/render.py (whose missing SceneDataset/pandas
imports are fixed here — SURVEY.md "quirks"). Video writing uses cv2
(ffmpeg/skvideo not available in this environment).
"""
import os
import pickle
import sys
import time

import cv2
import h5py
import numpy as np
from tqdm import tqdm

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu import model_utils, visualization
from autolabel_tpu.constants import COLORS
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.features.feature_utils import get_feature_extractor
from autolabel_tpu.inference import InferenceModel


def read_args():
    parser = model_utils.model_flag_parser()
    parser.add_argument('scene')
    parser.add_argument('--fps', type=int, default=5)
    parser.add_argument('--stride', type=int, default=1)
    parser.add_argument('--model-dir', type=str, required=True)
    parser.add_argument(
        '--max-depth',
        type=float,
        default=7.5,
        help="The maximum depth used in colormapping the depth frames.")
    parser.add_argument('--checkpoint', type=str)
    parser.add_argument('--allow-fallback', action='store_true',
                        help="Permit stand-in text embeddings when "
                        "teacher weights are unavailable (testing).")
    parser.add_argument('--out',
                        type=str,
                        required=True,
                        help="Where to save the video.")
    parser.add_argument('--classes',
                        default=None,
                        type=str,
                        nargs='+',
                        help="Which classes to segment the scene into.")
    parser.add_argument('--label-map',
                        default=None,
                        type=str,
                        help="Path to list of labels.")
    parser.add_argument('--num-steps', type=int, default=None,
                        help="Volumetric samples per ray. Default 512 "
                        "(reference parity — minutes per frame on TPU; "
                        "the script prints a wall-clock estimate after "
                        "the first frame), or 32 main samples when "
                        "--proposal is set (the proposal net places "
                        "them; ~16x fewer field queries at matched "
                        "quality for proposal-trained checkpoints).")
    parser.add_argument('--size', type=int, nargs=2, default=(480, 360),
                        help="Render resolution (width height).")
    parser.add_argument('--baked', action='store_true',
                        help="Render from a baked surface-splat cache "
                        "(render/baked.py) instead of the volumetric "
                        "path: one bake sweep up front, then every frame "
                        "is a single projection + z-buffer scatter — "
                        "seconds instead of minutes for a full video. "
                        "Preview-grade: canonical-view color, no "
                        "feature-PCA tile (BASELINE.md fidelity budget).")
    parser.add_argument('--bake-resolution', type=int, default=192,
                        help="Bake grid resolution per axis (--baked).")
    parser.add_argument('--max-splats', type=int, default=2 ** 19,
                        help="Splat budget of the baked cache (--baked).")
    return parser.parse_args()


class FeatureTransformer:
    """PCA visualization + text features from the features.hdf attrs
    contract (reference render.py:44-66)."""

    def __init__(self, scene_path, feature_name, classes, checkpoint=None,
                 allow_fallback=False):
        with h5py.File(os.path.join(scene_path, 'features.hdf'), 'r') as f:
            features = f[f'features/{feature_name}']
            self.pca = pickle.loads(features.attrs['pca'].tobytes())
            self.feature_min = features.attrs['min']
            self.feature_range = features.attrs['range']
        self.text_features = None
        if classes is not None:
            extractor = get_feature_extractor(
                feature_name, checkpoint, allow_fallback=allow_fallback)
            self.text_features = extractor.encode_text(classes)

    def __call__(self, p_features):
        H, W, C = p_features.shape
        features = self.pca.transform(p_features.reshape(H * W, C))
        features = np.clip(
            (features - self.feature_min) / self.feature_range, 0.0, 1.0)
        return (features.reshape(H, W, 3) * 255.0).astype(np.uint8)


def compute_semantics(outputs, classes, feature_transform):
    if classes is not None:
        features = outputs['semantic_features']
        features = features / np.maximum(
            np.linalg.norm(features, axis=-1, keepdims=True), 1e-9)
        text = feature_transform.text_features[:, :features.shape[-1]]
        H, W, D = features.shape
        similarities = features.reshape(H * W, D) @ text.T
        return similarities.argmax(-1).reshape(H, W)
    return outputs['semantic'].argmax(axis=-1)


def render(model, batch, feature_transform, size=(960, 720), maxdepth=10.0,
           classes=None):
    outputs = model.render(batch)
    p_semantic = compute_semantics(outputs, classes, feature_transform)
    frame = np.zeros((size[1], size[0], 3), dtype=np.uint8)
    sw, sh = size[0] // 2, size[1] // 2

    def fit(image):
        return cv2.resize(image, (sw, sh), interpolation=cv2.INTER_NEAREST)

    frame[:sh, :sw] = fit(
        (np.clip(outputs['image'], 0, 1) * 255.0).astype(np.uint8))
    frame[:sh, sw:] = fit(
        visualization.visualize_depth(outputs['depth'], maxdepth=maxdepth))
    frame[sh:, :sw] = fit(
        (COLORS[p_semantic % COLORS.shape[0]] * 255).astype(np.uint8))
    if feature_transform is not None:
        frame[sh:, sw:] = fit(feature_transform(outputs['semantic_features']))
    return frame


def render_baked(renderer, dataset, frame_index, size=(960, 720),
                 maxdepth=10.0):
    """2x2 tile from the splat cache: rgb | depth / semantic | (blank —
    the cache stores no distillation features; use the volumetric path
    for the feature-PCA / open-vocab tiles)."""
    camera = dataset.camera
    T_CW = np.linalg.inv(dataset.poses[frame_index])
    outputs = renderer.render(camera.camera_matrix, T_CW, camera.size)
    image = np.asarray(outputs['image'])
    depth = np.asarray(outputs['depth'])
    semantic = np.asarray(outputs['semantic'])

    frame = np.zeros((size[1], size[0], 3), dtype=np.uint8)
    sw, sh = size[0] // 2, size[1] // 2

    def fit(img):
        return cv2.resize(img, (sw, sh), interpolation=cv2.INTER_NEAREST)

    frame[:sh, :sw] = fit((np.clip(image, 0, 1) * 255.0).astype(np.uint8))
    frame[:sh, sw:] = fit(visualization.visualize_depth(depth,
                                                        maxdepth=maxdepth))
    frame[sh:, :sw] = fit(
        (COLORS[semantic % COLORS.shape[0]] * 255).astype(np.uint8))
    return frame


def main():
    flags = read_args()
    model_params = model_utils.read_params(flags.model_dir)

    dataset = SceneDataset('test',
                           flags.scene,
                           size=tuple(flags.size),
                           batch_size=16384,
                           features=model_params.features,
                           load_semantic=False,
                           lazy=True)

    classes = flags.classes
    if flags.label_map is not None:
        import pandas
        label_map = pandas.read_csv(flags.label_map)
        classes_in_scene = dataset.scene.metadata.get('classes', None)
        if classes_in_scene is not None:
            label_map = label_map[label_map['id'].isin(classes_in_scene)]
        classes = label_map['prompt'].values

    feature_transform = None
    if model_params.features is not None:
        feature_transform = FeatureTransformer(
            flags.scene, model_params.features, classes, flags.checkpoint,
            allow_fallback=flags.allow_fallback)

    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, model_params)

    use_proposal = flags.proposal
    if use_proposal and not getattr(model_params, 'proposal', False):
        print("--proposal needs a proposal-trained checkpoint (train with "
              "--proposal); falling back to the dense volumetric path.")
        use_proposal = False
    num_steps = flags.num_steps
    if num_steps is None:
        num_steps = 32 if use_proposal else 512
    model = InferenceModel.from_checkpoint(
        field, flags.model_dir, num_steps=num_steps,
        proposal_steps=flags.proposal_steps if use_proposal else 0,
        max_ray_batch=16384)

    baked_renderer = None
    if flags.baked:
        from autolabel_tpu.render.baked import BakedRenderer, bake
        if classes is not None:
            print("--baked renders closed-set semantics only; "
                  "--classes/--label-map need the volumetric path.")
        baked_renderer = BakedRenderer(
            bake(field, model.params, resolution=flags.bake_resolution,
                 max_points=flags.max_splats))

    writer = cv2.VideoWriter(flags.out, cv2.VideoWriter_fourcc(*'mp4v'),
                             flags.fps, (960, 720))
    indices = dataset.indices[::flags.stride]
    first_frame_start = None
    for i, frame_index in enumerate(tqdm(indices)):
        if baked_renderer is not None:
            frame = render_baked(baked_renderer, dataset, frame_index,
                                 maxdepth=flags.max_depth)
        else:
            if i == 0:
                first_frame_start = time.perf_counter()
            batch = dataset._get_test(frame_index)
            frame = render(model, batch, feature_transform,
                           maxdepth=flags.max_depth, classes=classes)
            if i == 0:
                # First frame includes compile; still a fair upper bound.
                per_frame = time.perf_counter() - first_frame_start
                total = per_frame * len(indices)
                print(f"\n~{per_frame:.0f} s/frame -> estimated "
                      f"{total / 60.0:.0f} min for {len(indices)} frames "
                      f"at {num_steps} samples/ray.")
                if total > 600:
                    hints = []
                    if not use_proposal and getattr(
                            model_params, 'proposal', False):
                        hints.append("--proposal (32 proposal-placed "
                                     "samples, ~16x fewer field queries)")
                    hints.append("--baked (one bake sweep, then "
                                 "projection-only frames)")
                    print("This exceeds 10 min; consider "
                          + " or ".join(hints) + ".")
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


if __name__ == "__main__":
    main()
