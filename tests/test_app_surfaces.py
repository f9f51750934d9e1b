"""Coverage for previously-untested application surfaces (VERDICT round-1
item 8): simulate_user end-to-end, the open-vocab evaluate CLI round-trip,
and import smoke tests for the hloc mapping pipeline and ROS nodes."""
import importlib
import os
import shutil
import sys
import types

import cv2
import numpy as np
import pandas
import pytest

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'scripts'))


def test_simulate_user_end_to_end(tmp_path):
    """The scripted annotator trains, clicks wrong pixels, logs a curve.
    Needs dense gt semantic maps (one per frame, label_every=1)."""
    from tests.synthetic import make_synthetic_scene
    scene = str(tmp_path / 'scene')
    make_synthetic_scene(scene, n_frames=8, width=48, height=36,
                         label_every=1)
    sys.argv = [
        'simulate_user.py', scene, '--batch-size', '512', '--num-steps',
        '16', '--warmup', '30', '--max-annotations', '6',
        '--iters-per-round', '5', '--workspace', str(tmp_path / 'ws'),
    ]
    import importlib
    simulate_user = importlib.import_module('simulate_user')
    np.random.seed(0)
    simulate_user.main()

    import glob
    csvs = glob.glob(str(tmp_path / 'ws' / '*' / '*' /
                         'user_simulation.csv'))
    assert len(csvs) == 1
    # np.savetxt rows of (step, annotated pixels, miou) — reference
    # simulate_user.py:106-107 format.
    table = np.loadtxt(csvs[0]).reshape(-1, 3)
    assert table.shape[0] >= 1
    assert 0.0 <= table[-1, 2] <= 1.0


def test_language_evaluate_cli_roundtrip(tmp_path, sphere_scene):
    """scripts/language/evaluate.py: model discovery from nerf/<hash>,
    params.pkl rebuild, checkpoint load, 2D open-vocab eval, json out."""
    import cv2

    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    scene = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene)
    # Dense gt label maps (raw ids: 1 background, 2 sphere).
    gt_dir = os.path.join(scene, 'gt_semantic')
    os.makedirs(gt_dir)
    sem_dir = os.path.join(scene, 'semantic')
    for name in os.listdir(sem_dir):
        shutil.copy(os.path.join(sem_dir, name), os.path.join(gt_dir, name))

    # Train a tiny model whose workspace matches the CLI's expectations:
    # lseg features (512-d head for CLIP-space cosine sim), the ScanNet
    # class-count constructor quirk replicated from the reference
    # (language/evaluate.py:133).
    from scripts.language.evaluate import SCANNET_N_CLASSES
    flags = model_utils.model_flag_parser().parse_args(
        ['--features', 'lseg', '--feature-dim', '512'])
    dataset = SceneDataset('train', scene, factor=1.0, batch_size=512)
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     SCANNET_N_CLASSES, flags)
    model_dir = model_utils.model_dir(scene, flags)
    model_utils.write_params(model_dir, flags)
    trainer = SimpleTrainer('ngp', field, iters=100,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=16,
                                                         perturb=True),
                            workspace=model_dir, metrics=False)
    trainer.train_iterations(dataset, 30)
    trainer.save_checkpoint()

    label_map = tmp_path / 'label_map.csv'
    pandas.DataFrame({
        'id': [1, 2],
        'prompt': ['background', 'sphere'],
    }).to_csv(label_map, index=False)

    from scripts.language import evaluate as language_evaluate
    out_json = str(tmp_path / 'results.json')
    cli_flags = language_evaluate.read_args.__wrapped__() if hasattr(
        language_evaluate.read_args, '__wrapped__') else None
    sys.argv = [
        'evaluate.py', scene, '--label-map', str(label_map), '--out',
        out_json, '--batch-size', '512', '--stride', '6',
        '--allow-fallback',
    ]
    language_evaluate.main(language_evaluate.read_args())

    import json
    with open(out_json) as f:
        results = json.load(f)
    assert results  # per-class iou/acc numbers were written


def test_mapping_module_imports():
    """mapping.py must import (and fail helpfully) without hloc/pycolmap."""
    import importlib
    mapping = importlib.import_module('mapping')
    assert hasattr(mapping, 'Pipeline')
    assert hasattr(mapping, 'read_args')


def test_ros_node_imports_with_mocked_rospy():
    """scripts/ros/node.py structural import with rospy/cv_bridge mocked."""
    mods = {}
    for name in ('rospy', 'tf', 'cv_bridge', 'sensor_msgs',
                 'sensor_msgs.msg', 'std_msgs', 'std_msgs.msg', 'nav_msgs',
                 'nav_msgs.msg', 'std_srvs', 'std_srvs.srv',
                 'geometry_msgs', 'geometry_msgs.msg', 'message_filters'):
        mod = types.ModuleType(name)
        mod.__getattr__ = lambda attr, _n=name: type(attr, (), {
            '__init__': lambda self, *a, **k: None})
        mods[name] = mod
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        import importlib
        if 'ros.node' in sys.modules:
            del sys.modules['ros.node']
        node = importlib.import_module('ros.node')
        assert hasattr(node, 'AutolabelNode')
        assert hasattr(node, 'TrainingLoop')
        assert hasattr(node, 'Bridge')
        from autolabel_tpu.utils.ros_utils import MessageBuffer
        buffer = MessageBuffer(sync_threshold=0.05, max_size=4)
        assert buffer is not None
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_ransac_scale_rejects_outliers():
    mapping = importlib.import_module('mapping')
    rng = np.random.default_rng(0)
    scales = np.concatenate([
        rng.normal(2.0, 0.005, 500),          # inlier scale ratio ~2.0
        rng.uniform(0.1, 10.0, 100),          # gross outliers
    ])
    est = mapping.ransac_scale(scales, iterations=2000, seed=1)
    assert abs(est - 2.0) < 0.02


def test_oriented_bounding_frame_recovers_box():
    mapping = importlib.import_module('mapping')
    rng = np.random.default_rng(1)
    half = np.array([2.0, 1.0, 0.5])
    pts = rng.uniform(-1, 1, (5000, 3)) * half
    # Rotate by a known rotation + translate.
    angle = 0.7
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0],
                  [0, 0, 1.0]])
    world = pts @ R.T + np.array([5.0, -2.0, 1.0])
    T, aabb = mapping.oriented_bounding_frame(world)
    aligned = world @ T[:3, :3].T + T[:3, 3]
    # Centered: aabb symmetric, extents recover the box half-sizes
    # (axes sorted by variance: largest first).
    np.testing.assert_allclose(aabb[0], -aabb[1], atol=1e-6)
    np.testing.assert_allclose(np.sort(aabb[1])[::-1], half, rtol=0.05)
    assert np.all(aligned >= aabb[0] - 1e-6)
    assert np.all(aligned <= aabb[1] + 1e-6)


def test_pose_saver_writes_obb_aligned_scene(sphere_scene, tmp_path):
    """PoseSaver: depth clouds -> OBB frame -> rewritten pose/*.txt +
    bbox.txt (the mapping pipeline's final stage, reference
    mapping.py:274-353) — validated on the synthetic sphere scene."""
    import shutil
    mapping = importlib.import_module('mapping')
    from autolabel_tpu.utils import Scene

    scene_dir = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene_dir)
    scene = Scene(scene_dir)
    poses = {}
    for path in sorted(os.listdir(os.path.join(scene_dir, 'pose'))):
        key = path.split('.')[0]
        poses[key] = np.loadtxt(os.path.join(scene_dir, 'pose', path))

    mapping.PoseSaver(scene, poses).run()

    bbox = np.loadtxt(os.path.join(scene_dir, 'bbox.txt'))
    assert bbox.shape == (7,)  # min xyz, max xyz, voxel size
    extents = bbox[3:6] - bbox[:3]
    assert (extents > 0).all()
    # The sphere (r=0.5) plus background plane must fit in the box.
    assert extents.max() < 20.0 and extents.max() > 0.5
    # Rewritten poses stay rigid transforms.
    for key in poses:
        T = np.loadtxt(os.path.join(scene_dir, 'pose', f'{key}.txt'))
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)


def test_scale_estimation_and_pose_saver_from_colmap_fixture(
        sphere_scene, tmp_path):
    """The full post-SfM pipeline (reference mapping.py:182-353) from
    reconstruction artifacts to pose/*.txt + bbox.txt: a COLMAP text
    model built from the synthetic scene's known geometry (at a wrong
    global scale) drives ScaleEstimation -> metric poses -> PoseSaver,
    without pycolmap (utils/colmap_text.py duck-types the slice of the
    pycolmap.Reconstruction API mapping.py touches)."""
    import shutil
    mapping = importlib.import_module('mapping')
    from autolabel_tpu.utils import Scene, transform_points
    from autolabel_tpu.utils import colmap_text as ct

    scene_dir = str(tmp_path / 'scene')
    shutil.copytree(sphere_scene, scene_dir)
    scene = Scene(scene_dir)
    K = scene.camera.camera_matrix
    w, h = scene.camera.size
    scale_gt = 3.7  # SfM world = metric world / scale_gt

    rng = np.random.default_rng(5)
    images, points3D = [], {}
    metric_poses = {}
    pid = 0
    for image_id, depth_path in enumerate(scene.depth_paths(), start=1):
        key = os.path.basename(depth_path).split('.')[0]
        depth = cv2.imread(depth_path, -1).astype(np.float64) / 1000.0
        T_CW = np.loadtxt(os.path.join(scene_dir, 'pose', f'{key}.txt'))
        metric_poses[key] = T_CW
        T_WC = np.linalg.inv(T_CW)
        ys, xs = np.nonzero(depth > 0.2)
        pick = rng.choice(len(ys), size=min(40, len(ys)), replace=False)
        pts2d = []
        for px, py in zip(xs[pick], ys[pick]):
            z = depth[py, px]
            p_C = np.array([(px + 0.5 - K[0, 2]) * z / K[0, 0],
                            (py + 0.5 - K[1, 2]) * z / K[1, 1], z])
            p_W = transform_points(T_WC, p_C)
            pid += 1
            points3D[pid] = ct.ColmapPoint3D(
                id=pid, xyz=p_W / scale_gt,
                rgb=np.array([128, 128, 128]), error=0.5)
            pts2d.append(ct.ColmapPoint2D(
                xy=np.array([px + 0.5, py + 0.5]), point3D_id=pid))
        # A few unmatched keypoints exercise the point3D_id == -1 filter.
        pts2d.append(ct.ColmapPoint2D(xy=np.array([1.0, 1.0]),
                                      point3D_id=-1))
        images.append(ct.ColmapImage(
            image_id, ct.rotmat_to_qvec(T_CW[:3, :3]),
            T_CW[:3, 3] / scale_gt, 1, f'{key}.png', pts2d))

    camera = ct.ColmapCamera(1, 'OPENCV', w, h,
                             np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                                       0.0, 0.0, 0.0, 0.0]))
    model_dir = str(tmp_path / 'colmap')
    ct.write_text_model(model_dir, camera, images, points3D)

    # The parser round-trips what the writer produced.
    model = ct.ColmapTextModel(model_dir)
    assert len(model.images) == len(metric_poses)
    img0 = model.images[1]
    np.testing.assert_allclose(
        img0.rotmat(), metric_poses[img0.name.split('.')[0]][:3, :3],
        atol=1e-6)
    assert len(img0.get_valid_points2D()) == len(img0.points2D) - 1

    # ScaleEstimation recovers the metric scale from sensor depth.
    scaled = mapping.ScaleEstimation(scene, model_dir).run()
    for key, T in scaled.items():
        np.testing.assert_allclose(T[:3, 3], metric_poses[key][:3, 3],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(T[:3, :3], metric_poses[key][:3, :3],
                                   atol=1e-6)

    # PoseSaver writes the final scene artifacts from those poses.
    mapping.PoseSaver(scene, scaled).run()
    bbox = np.loadtxt(os.path.join(scene_dir, 'bbox.txt'))
    assert bbox.shape == (7,)
    assert (bbox[3:6] > bbox[:3]).all()
    reloaded = Scene(scene_dir)
    assert len(reloaded.poses) == len(metric_poses)
