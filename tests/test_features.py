"""Feature-field pipeline: teacher extraction -> features.hdf contract ->
distillation training (BASELINE config 3 shape, offline fallback teacher)."""
import os
import pickle
import sys

import h5py
import numpy as np
import pytest

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow


SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')
sys.path.insert(0, SCRIPTS)


@pytest.fixture(scope='module')
def features_hdf(sphere_scene, tmp_path_factory):
    """Run the compute_feature_maps CLI (fallback dino teacher, 16-d)."""
    import compute_feature_maps
    old_argv = sys.argv
    sys.argv = ['compute_feature_maps.py', sphere_scene, '--allow-fallback', '--features',
                'dino', '--dim', '16']
    try:
        compute_feature_maps.main()
    finally:
        sys.argv = old_argv
    return os.path.join(sphere_scene, 'features.hdf')


def test_features_hdf_contract(features_hdf):
    with h5py.File(features_hdf, 'r') as f:
        ds = f['features/dino']
        N, H, W, C = ds.shape
        assert N == 12 and C == 16
        assert ds.dtype == np.float16
        # PCA attrs contract (reference compute_feature_maps.py:106-118).
        pca = pickle.loads(ds.attrs['pca'].tobytes())
        assert pca.n_components == 3
        assert ds.attrs['min'].shape == (3,)
        assert ds.attrs['range'].shape == (3,)
        assert np.isfinite(ds[:]).all()


def test_autoencode_roundtrip(sphere_scene, features_hdf):
    import compute_feature_maps
    old_argv = sys.argv
    sys.argv = ['compute_feature_maps.py', sphere_scene, '--allow-fallback', '--features',
                'dino', '--dim', '8', '--autoencode']
    try:
        compute_feature_maps.main()
    finally:
        sys.argv = old_argv
    with h5py.File(features_hdf, 'r') as f:
        assert f['features/dino'].shape[-1] == 8
    # Restore the 16-d maps for the training test below.
    sys.argv = ['compute_feature_maps.py', sphere_scene, '--allow-fallback', '--features',
                'dino', '--dim', '16']
    try:
        compute_feature_maps.main()
    finally:
        sys.argv = old_argv


def test_feature_distillation_training(sphere_scene, features_hdf):
    import jax
    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    dataset = SceneDataset('train', sphere_scene, factor=1.0,
                           batch_size=512, features='dino')
    assert dataset.feature_dim == 16
    batch = next(iter(dataset))
    assert batch['features'].shape == (512, 16)

    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    field = Field(
        FieldConfig(encoding='hg+freq',
                    hidden_dim=32,
                    hidden_dim_color=32,
                    hidden_dim_semantic=16,  # feature head = teacher dim
                    semantic_classes=dataset.n_classes,
                    bound=bound,
                    grid=HashGridConfig(n_levels=4,
                                        log2_hashmap_size=12,
                                        per_level_scale=1.6)))
    trainer = SimpleTrainer(
        'ngp',
        field,
        iters=1000,
        loss_options=LossOptions(feature_loss=True),
        render_options=RenderOptions(num_steps=32, perturb=True),
        workspace=None)
    losses = trainer.train_iterations(dataset, 40)
    losses = {k: float(v) for k, v in jax.device_get(losses).items()}
    assert 'feature' in losses
    assert np.isfinite(losses['feature'])
    assert losses['feature'] > 0


def test_fcn50_local_checkpoint_runs_real_model(tmp_path, monkeypatch):
    """AUTOLABEL_FCN50_WEIGHTS runs the real torchvision FCN offline.

    Uses a random-init state dict saved locally — exercises the exact
    code path a user with the real fcn_resnet50_coco checkpoint gets
    (reference loads pretrained at features/fcn50.py:12-14)."""
    torch = pytest.importorskip('torch')
    torchvision = pytest.importorskip('torchvision')
    from torchvision.models.segmentation import fcn_resnet50

    ckpt = tmp_path / 'fcn50.pth'
    model = fcn_resnet50(weights=None, weights_backbone=None)
    torch.save(model.state_dict(), ckpt)
    monkeypatch.setenv('AUTOLABEL_FCN50_WEIGHTS', str(ckpt))

    from autolabel_tpu.features.fcn50 import FCN50
    fe = FCN50(allow_fallback=False)  # must NOT fall back
    assert fe._extractor is not None
    x = np.random.default_rng(0).random((1, 3, 64, 64)).astype(np.float32)
    out = fe(x)
    assert out.shape == (1, 8, 8, 512)
    assert np.isfinite(out.astype(np.float32)).all()
