"""Coverage for previously-untested application surfaces (VERDICT round-1
item 8): simulate_user end-to-end, the open-vocab evaluate CLI round-trip,
and import smoke tests for the hloc mapping pipeline and ROS nodes."""
import os
import shutil
import sys
import types

import numpy as np
import pandas
import pytest

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
