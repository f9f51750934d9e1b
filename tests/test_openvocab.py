"""Open-vocabulary evaluators end to end: gt_semantic maps + label_map for
2D, synthetic mesh.ply + mesh_labels.npy for 3D, hash text encoder as the
CLIP stand-in."""
import os
import shutil

import cv2
import numpy as np
import pandas
import pytest

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.evaluation import (OpenVocabEvaluator2D,
                                      OpenVocabEvaluator3D)
from autolabel_tpu.inference import InferenceModel
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.utils.ply import write_ply_pointcloud

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


LABEL_MAP = pandas.DataFrame({'id': [1, 2],
                              'prompt': ['background', 'sphere']})


@pytest.fixture(scope='module')
def openvocab_scene(sphere_scene, tmp_path_factory):
    """Scene copy with gt_semantic/, mesh.ply and mesh_labels.npy."""
    scene = str(tmp_path_factory.mktemp('ov') / 'sphere')
    shutil.copytree(sphere_scene, scene)
    gt_dir = os.path.join(scene, 'gt_semantic')
    os.makedirs(gt_dir, exist_ok=True)
    # Dense gt label maps with raw label ids (1 bg, 2 sphere) from the
    # semantic annotations (same ids in this scene).
    sem_dir = os.path.join(scene, 'semantic')
    names = sorted(os.listdir(os.path.join(scene, 'rgb')),
                   key=lambda n: int(n.split('.')[0]))
    for name in names:
        sem_path = os.path.join(sem_dir, name)
        if os.path.exists(sem_path):
            labels = cv2.imread(sem_path, -1)
        else:
            labels = np.ones((36, 48), np.uint8)
        cv2.imwrite(os.path.join(gt_dir, name), labels)

    # Sphere-surface mesh vertices; the 3D evaluator permutes
    # (x, y, z) -> (y, z, x), which maps the origin-centered sphere to
    # itself.
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 0.5
    write_ply_pointcloud(os.path.join(scene, 'mesh.ply'), pts)
    np.save(os.path.join(scene, 'mesh_labels.npy'),
            np.full(500, 2, np.uint16))
    return scene


@pytest.fixture(scope='module')
def trained_model(openvocab_scene):
    """Briefly trained field with a 16-d feature head."""
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    dataset = SceneDataset('train', openvocab_scene, factor=1.0,
                           batch_size=512)
    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    field = Field(
        FieldConfig(encoding='hg+freq',
                    hidden_dim=32,
                    hidden_dim_color=32,
                    hidden_dim_semantic=16,
                    semantic_classes=dataset.n_classes,
                    bound=bound,
                    grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                        per_level_scale=1.6)))
    trainer = SimpleTrainer('ngp', field, iters=1000,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=24,
                                                         perturb=True),
                            workspace=None)
    trainer.train_iterations(dataset, 60)
    model = InferenceModel(field, trainer.state['params'], num_steps=24)
    return model


def test_openvocab_2d(openvocab_scene, trained_model):
    dataset = SceneDataset('test', openvocab_scene, factor=1.0,
                           batch_size=512)
    evaluator = OpenVocabEvaluator2D(features='lseg', stride=6, allow_fallback=True)
    evaluator.reset(trained_model, LABEL_MAP)
    iou, acc = evaluator.eval(dataset)
    assert 'total' in iou and 'total' in acc
    for key in ('background', 'sphere'):
        assert key in iou
        if iou[key] is not None:
            assert 0.0 <= iou[key] <= 1.0
    assert 0.0 <= iou['total'] <= 1.0


def test_openvocab_3d(openvocab_scene, trained_model):
    dataset = SceneDataset('test', openvocab_scene, factor=1.0,
                           batch_size=512)
    evaluator = OpenVocabEvaluator3D(features='lseg', allow_fallback=True)
    evaluator.reset(trained_model, LABEL_MAP)
    iou, acc = evaluator.eval(dataset)
    assert 'total' in iou
    assert 0.0 <= iou['total'] <= 1.0
    # The sphere prompt is the only evaluated label present on the mesh.
    assert 'sphere' in iou


def test_jittered_semantic_features_fused(trained_model):
    """The fused on-device jitter average: at sigma=0 the jitter is a
    no-op, so the result must equal the L2-normalized exact feature
    query; ragged point counts exercise the power-of-two chunk padding."""
    points = np.random.default_rng(3).uniform(
        -0.5, 0.5, size=(37, 3)).astype(np.float32)
    fused = trained_model.jittered_semantic_features(points, n_samples=10,
                                                     sigma=0.0)
    density = trained_model.density(points)
    _, exact = trained_model.semantic(density['geo_feat'])
    exact = exact.astype(np.float32)
    exact /= np.maximum(np.linalg.norm(exact, axis=-1, keepdims=True), 1e-9)
    assert fused.shape == exact.shape
    np.testing.assert_allclose(fused, exact, atol=5e-5)
    assert np.allclose(np.linalg.norm(fused, axis=-1), 1.0, atol=1e-4)
    # Nonzero jitter still yields unit-norm features of the same shape.
    noisy = trained_model.jittered_semantic_features(points, n_samples=4,
                                                     sigma=0.02)
    assert noisy.shape == exact.shape
    assert np.allclose(np.linalg.norm(noisy, axis=-1), 1.0, atol=1e-4)


def test_openvocab_evaluated_subset(openvocab_scene, trained_model):
    dataset = SceneDataset('test', openvocab_scene, factor=1.0,
                           batch_size=512)
    label_map = pandas.DataFrame({'id': [1, 2],
                                  'prompt': ['background', 'sphere'],
                                  'evaluated': [0, 1]})
    evaluator = OpenVocabEvaluator2D(features='lseg', stride=6, allow_fallback=True)
    evaluator.reset(trained_model, label_map)
    assert list(evaluator.evaluated_labels) == [2]


def test_prompt_synonym_ensembling():
    """`|`-separated phrasings in a prompt cell are CLIP-ensembled: each
    phrasing embedded separately, unit-mean matched, first phrasing used
    as the display name."""
    evaluator = OpenVocabEvaluator2D(features='lseg', stride=6,
                                     allow_fallback=True)
    multi = pandas.DataFrame({'id': [1, 2],
                              'prompt': ['background',
                                         'sphere | round ball']})
    evaluator.reset(None, multi)
    assert evaluator.label_mapping[2] == 'sphere'
    assert list(evaluator.label_map['prompt']) == ['background', 'sphere']
    emb = np.asarray(evaluator.extractor.encode_text(['sphere',
                                                      'round ball']))
    mean = emb.mean(axis=0)
    expected = mean / (np.linalg.norm(mean) + 1e-6)
    np.testing.assert_allclose(evaluator.text_features[1], expected,
                               rtol=1e-5, atol=1e-6)
    # Single-phrasing rows match plain encoding (already unit-norm).
    single = pandas.DataFrame({'id': [1, 2],
                               'prompt': ['background', 'sphere']})
    evaluator.reset(None, single)
    np.testing.assert_allclose(
        np.asarray(evaluator.text_features),
        np.asarray(evaluator.extractor.encode_text(['background',
                                                    'sphere'])),
        rtol=1e-4, atol=1e-5)
