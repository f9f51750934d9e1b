"""End-to-end: train the synthetic sphere scene and verify the field
actually learns — radiance, depth and semantics all improve. This is the
test the reference never had (SURVEY.md §4). Uses a reduced hash grid so it
runs in seconds on the single-core CI host; the full-size path is covered
by bench.py on TPU."""
import jax
import numpy as np
import pytest

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import InteractiveTrainer, SimpleTrainer

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


SMALL_GRID = HashGridConfig(n_levels=8,
                            n_features=2,
                            log2_hashmap_size=15,
                            base_resolution=16,
                            per_level_scale=1.6)


class _Flags:
    encoding = 'hg+freq'
    geometric_features = 15
    feature_dim = 16
    features = None


def _small_field(dataset):
    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    config = FieldConfig(encoding='hg+freq',
                         hidden_dim=64,
                         hidden_dim_color=64,
                         hidden_dim_semantic=16,
                         semantic_classes=dataset.n_classes,
                         bound=bound,
                         grid=SMALL_GRID)
    return Field(config)


@pytest.fixture(scope='module')
def sphere_dataset(sphere_scene):
    return SceneDataset('train', sphere_scene, factor=1.0, batch_size=512)


def test_create_model_reference_config(sphere_dataset):
    field = model_utils.create_model(sphere_dataset.min_bounds,
                                     sphere_dataset.max_bounds,
                                     sphere_dataset.n_classes, _Flags())
    c = field.config
    assert c.hidden_dim == 128 and c.num_layers == 2
    assert c.grid_config.table_size == 2 ** 19
    # bound rule: extents (2) minus center (0) -> 2.0
    assert c.bound == 2.0


def test_training_improves_all_losses(sphere_dataset, tmp_path):
    dataset = sphere_dataset
    field = _small_field(dataset)
    trainer = SimpleTrainer('ngp',
                            field,
                            lr=5e-3,
                            iters=1000,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=48,
                                                         perturb=True),
                            workspace=str(tmp_path / 'ws'),
                            mesh=None)

    iterator = iter(dataset)

    def run(n):
        losses = {}
        for _ in range(n):
            batch = next(iterator)
            trainer.state, losses = trainer._train_step(
                trainer.state, trainer._device_batch(batch),
                trainer._base_key)
            trainer.global_step += 1
        return {k: float(v) for k, v in jax.device_get(losses).items()}

    first = run(10)
    last = run(250)

    # Absolute targets (single-batch losses fluctuate too much for
    # relative checks): the sphere scene fits fast, so after ~250 steps
    # rgb MSE, depth L1 (meters) and semantic CE are all far below their
    # untrained values (~0.1 / ~0.5 m / ln 2).
    assert last['rgb'] < 0.03, (first, last)
    assert last['depth'] < 0.12, (first, last)
    assert last['semantic'] < 0.2, (first, last)
    psnr = -10.0 * np.log10(last['rgb'])
    assert psnr > 15.0, psnr

    # Checkpoint roundtrip under the workspace contract.
    trainer.state = trainer._ema_step(trainer.state, trainer.ema_decay)
    trainer.epoch = 1
    trainer.save_checkpoint()
    params, ema = model_utils.load_checkpoint(trainer.checkpoint_dir)
    assert len(jax.tree.leaves(params)) == len(
        jax.tree.leaves(trainer.state['params']))

    # A resumed trainer picks the checkpoint up.
    resumed = SimpleTrainer('ngp',
                            field,
                            iters=1000,
                            workspace=str(tmp_path / 'ws'),
                            mesh=None)
    assert resumed.global_step == trainer.global_step


def test_proposal_sampling_training(sphere_dataset):
    """Proposal-network sampling converges on the sphere scene and the
    interlevel loss actually drops (the proposal learns the geometry)."""
    import jax
    dataset = sphere_dataset
    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    config = FieldConfig(encoding='hg+freq',
                         hidden_dim=64,
                         hidden_dim_color=64,
                         hidden_dim_semantic=16,
                         semantic_classes=dataset.n_classes,
                         bound=bound,
                         grid=SMALL_GRID,
                         proposal=True)
    field = Field(config)
    trainer = SimpleTrainer('ngp',
                            field,
                            lr=5e-3,
                            iters=1000,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=16,
                                                         proposal_steps=32,
                                                         perturb=True),
                            workspace=None)
    first = trainer.train_iterations(dataset, 20)
    first = {k: float(v) for k, v in jax.device_get(first).items()}
    assert 'interlevel' in first
    last = trainer.train_iterations(dataset, 200)
    last = {k: float(v) for k, v in jax.device_get(last).items()}
    assert last['rgb'] < 0.05, (first, last)
    assert last['depth'] < 0.2, (first, last)
    assert np.isfinite(last['interlevel'])
    # Staged render path works with proposal sampling too.
    rgb, depth, sem, feat = trainer.test_step(
        SceneDataset('test', dataset.scene.path, factor=1.0,
                     batch_size=512)._get_test(0))
    assert np.isfinite(rgb).all()


def test_interactive_trainer_steps(sphere_dataset):
    dataset = sphere_dataset
    field = _small_field(dataset)
    trainer = InteractiveTrainer('ngp',
                                 field,
                                 lr=5e-3,
                                 loss_options=LossOptions(),
                                 render_options=RenderOptions(num_steps=32,
                                                              perturb=True),
                                 workspace=None)
    trainer.init(dataset)
    for _ in range(5):
        losses = trainer.take_step()
    assert np.isfinite(float(losses['total']))
    assert trainer.step == 5


def test_annotation_burst_stays_finite(sphere_scene):
    """Regression: a tiny labeled pool turns on class-balanced sampling
    with heavily DUPLICATED rays per batch; without the trunc_exp input
    clamp + apply_if_finite update rejection (the reference gets both
    implicitly from fp16 AMP + GradScaler, trainer.py:45-48) the density
    head spirals to inf within ~40 steps. The simulate_user/interactive
    annotation path depends on this staying finite."""
    import jax

    dataset = SceneDataset('train', sphere_scene, factor=1.0,
                           batch_size=512, load_semantic=False)
    field = Field(
        FieldConfig(encoding='hg+freq', hidden_dim=32,
                    hidden_dim_color=32, hidden_dim_semantic=16,
                    semantic_classes=dataset.n_classes,
                    bound=model_utils.compute_bound(dataset.min_bounds,
                                                    dataset.max_bounds),
                    grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                        per_level_scale=1.6)))
    trainer = SimpleTrainer('ngp', field, lr=5e-3, iters=1000,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=16,
                                                         perturb=True),
                            workspace=None, metrics=False)
    trainer.train_iterations(dataset, 50)
    # Annotate a handful of pixels -> balanced sampling duplicates them.
    rng = np.random.default_rng(0)
    idx = rng.integers(0, dataset.resolution, 20)
    dataset.semantics[0][idx] = 2
    dataset.update_sampler()
    losses = trainer.train_iterations(dataset, 120)
    losses = {k: float(v) for k, v in jax.device_get(losses).items()}
    assert np.isfinite(losses['total']), losses
    for leaf in jax.tree.leaves(trainer.state['params']):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gather_annealing_phases(sphere_dataset):
    """The trainer builds its gather-annealing phase table from
    sampled_warmup_fraction / exact_final_fraction: warmup runs
    sampled-backward-1, the main phase the configured options, the tail
    fully exact gathers — selected on the host by global_step."""
    field = _small_field(sphere_dataset)
    wide = FieldConfig(encoding='hg+freq', hidden_dim=32,
                       hidden_dim_color=32, hidden_dim_semantic=16,
                       semantic_classes=sphere_dataset.n_classes,
                       bound=field.config.bound,
                       grid=HashGridConfig(n_levels=4, n_features=8,
                                           log2_hashmap_size=12,
                                           base_resolution=8,
                                           per_level_scale=1.5))
    trainer = SimpleTrainer(
        'ngp', Field(wide), lr=5e-3, iters=1000,
        loss_options=LossOptions(),
        render_options=RenderOptions(num_steps=8, perturb=True,
                                     stochastic_corners=0,
                                     sampled_backward=2),
        workspace=None, metrics=False,
        exact_final_fraction=0.1,
        sampled_warmup_fraction=0.3)
    assert [start for start, _ in trainer._phases] == [0, 300, 900]
    # Without warmup: main phase + exact tail only.
    trainer2 = SimpleTrainer(
        'ngp', Field(wide), lr=5e-3, iters=1000,
        loss_options=LossOptions(),
        render_options=RenderOptions(num_steps=8, perturb=True,
                                     stochastic_corners=0,
                                     sampled_backward=2),
        workspace=None, metrics=False, exact_final_fraction=0.1)
    assert [start for start, _ in trainer2._phases] == [0, 900]
    # All three phases actually execute (each compiles its own step).
    trainer._phases = [(s, f) for s, f in trainer._phases]
    trainer.global_step = 298
    trainer.train_iterations(sphere_dataset, 4)
    trainer.global_step = 898
    trainer.train_iterations(sphere_dataset, 4)
    import jax
    for leaf in jax.tree.leaves(trainer.state['params']):
        assert np.isfinite(np.asarray(leaf)).all()
