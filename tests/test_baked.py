"""Baked splat preview: bake a trained field, render a frame gather-free,
check it against the ground truth and the volumetric render."""
import numpy as np
import pytest

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.render.baked import BakedRenderer, bake
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import SimpleTrainer

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = [pytest.mark.slow, pytest.mark.e2e]



@pytest.fixture(scope='module')
def trained(sphere_scene):
    dataset = SceneDataset('train', sphere_scene, factor=1.0,
                           batch_size=512)
    # The sampler's rng is unseeded by default; a bad draw at 300 iters
    # leaves a field fuzzy enough to flip the 0.1 m inc-vs-full median
    # depth threshold. Pin it: the test compares two bakes of the SAME
    # params, so any deterministic field works.
    dataset.rng = np.random.default_rng(0)
    bound = model_utils.compute_bound(dataset.min_bounds,
                                      dataset.max_bounds)
    field = Field(
        FieldConfig(encoding='hg+freq', hidden_dim=32, hidden_dim_color=32,
                    hidden_dim_semantic=16,
                    semantic_classes=dataset.n_classes, bound=bound,
                    grid=HashGridConfig(n_levels=6, log2_hashmap_size=14,
                                        per_level_scale=1.6)))
    trainer = SimpleTrainer('ngp', field, iters=1000,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=32,
                                                         perturb=True),
                            workspace=None)
    trainer.train_iterations(dataset, 300)
    return field, trainer.state['params'], dataset


def test_bake_and_render(trained):
    field, params, dataset = trained
    baked = bake(field, params, resolution=96, max_points=2 ** 15)
    assert 0 < baked.n_valid <= 2 ** 15

    renderer = BakedRenderer(baked)
    scene = dataset.scene
    # Field-space pose: inverse of the converted camera-to-world.
    import os
    from autolabel_tpu.core.rays import convert_pose
    T_CW_file = np.loadtxt(os.path.join(scene.path, 'pose', '0.txt'))
    T_CW = np.linalg.inv(convert_pose(T_CW_file))
    K = scene.camera.camera_matrix
    w, h = scene.camera.size
    out = renderer.render(K, T_CW, (w, h))
    image = np.asarray(out['image'])
    depth = np.asarray(out['depth'])
    semantic = np.asarray(out['semantic'])
    assert image.shape == (h, w, 3) and depth.shape == (h, w)

    batch = dataset._get_test(0)
    gt_rgb = np.asarray(batch['pixels']).reshape(h, w, 3)
    gt_depth = np.asarray(batch['depth']).reshape(h, w)
    gt_sem = np.asarray(batch['semantic']).reshape(h, w)

    hit = depth > 0
    assert hit.mean() > 0.05  # the sphere projects into view
    both = hit & (gt_depth > 0)
    assert both.sum() > 50
    # Against gt: coarse agreement (the 300-iter fixture field itself
    # is only roughly converged).
    assert np.median(np.abs(depth[both] - gt_depth[both])) < 0.3
    # Against the field's own volumetric render (what the bake
    # approximates). The 300-iter fixture field has a fuzzy density
    # shell, so the alpha-thresholded bake surface can sit a few cells
    # off the volumetric expected depth — keep this check coarse.
    from autolabel_tpu.inference import InferenceModel
    vol = InferenceModel(field, params, num_steps=48).render(batch)
    vol_depth = np.asarray(vol['depth']).reshape(h, w)
    vol_both = hit & (vol_depth > 0.1)
    assert vol_both.sum() > 50
    assert np.median(np.abs(depth[vol_both] - vol_depth[vol_both])) < 0.35
    # Sphere pixels classify as sphere (class 1) more often than not.
    sphere_hits = both & (gt_sem == 1)
    if sphere_hits.sum() > 20:
        assert (semantic[sphere_hits] == 1).mean() > 0.6
    # RGB over hits is in range and roughly red-dominant on the sphere.
    assert image.min() >= 0.0 and image.max() <= 1.0
    if sphere_hits.sum() > 20:
        assert image[sphere_hits, 0].mean() > image[sphere_hits, 2].mean()


def test_view_dependent_sh_color(trained):
    """Degree-1 SH baking: coefficients exist, the rendered image stays
    in range, and per-splat SH evaluation reproduces the field's color
    at the probe directions up to the degree-1 truncation error."""
    import jax.numpy as jnp

    from autolabel_tpu.render.baked import _SH_DIRS, _make_shade_fn

    field, params, dataset = trained
    baked = bake(field, params, resolution=64, max_points=2 ** 13)
    assert baked.sh is not None and baked.sh.shape == (2 ** 13, 3, 3)

    flat = bake(field, params, resolution=64, max_points=2 ** 13,
                view_dependent=False)
    assert flat.sh is None

    # SH reconstruction at the 6 probe dirs vs the field's true color:
    # dc + lin @ d is the least-squares deg-1 fit on those probes, so
    # the reconstruction error is bounded by the view-dependence the
    # fit cannot express — small for this mostly-Lambertian fixture.
    valid = np.asarray(baked.valid)
    pts = jnp.asarray(np.asarray(baked.points)[valid][:256])
    dc, lin, _ = _make_shade_fn(field, True)(params, pts)
    _, geo = field.density(params, pts)
    errs = []
    for d in _SH_DIRS:
        true = field.color(params, jnp.broadcast_to(jnp.asarray(d),
                                                    pts.shape), geo)
        recon = dc + np.einsum('a,nab->nb', d, np.asarray(lin))
        errs.append(float(jnp.abs(recon - true).mean()))
    assert np.mean(errs) < 0.15

    # Both variants render in range.
    K = dataset.scene.camera.camera_matrix
    w, h = dataset.scene.camera.size
    import os

    from autolabel_tpu.core.rays import convert_pose
    T_CW_file = np.loadtxt(os.path.join(dataset.scene.path, 'pose', '0.txt'))
    T_CW = np.linalg.inv(convert_pose(T_CW_file))
    for b in (baked, flat):
        img = np.asarray(BakedRenderer(b).render(K, T_CW, (w, h))['image'])
        assert img.min() >= 0.0 and img.max() <= 1.0


def test_baked_render_is_static_shape(trained):
    """Two different camera poses reuse the same compiled render."""
    field, params, dataset = trained
    baked = bake(field, params, resolution=64, max_points=2 ** 13)
    renderer = BakedRenderer(baked)
    import os
    from autolabel_tpu.core.rays import convert_pose
    K = dataset.scene.camera.camera_matrix
    w, h = dataset.scene.camera.size
    for idx in (0, 3):
        T_CW_file = np.loadtxt(os.path.join(dataset.scene.path, 'pose',
                                            f'{idx}.txt'))
        out = renderer.render(K, np.linalg.inv(convert_pose(T_CW_file)),
                              (w, h))
        assert np.asarray(out['image']).shape == (h, w, 3)


def test_incremental_baker_matches_full_bake(trained):
    """Slab-rotating incremental bake covers the same surface as a full
    bake: after update_all the rendered depth agrees, each slab's splats
    stay inside its x-range, and update_next_block rotates."""
    import os

    from autolabel_tpu.core.rays import convert_pose
    from autolabel_tpu.render.baked import IncrementalBaker

    field, params, dataset = trained
    baker = IncrementalBaker(field, resolution=96, max_points=2 ** 15,
                             n_blocks=8)
    baker.update_all(params)
    scene = baker.scene()
    assert scene.n_valid > 0

    # Each block's valid splats lie inside that slab's x-range.
    pts = np.asarray(scene.points)
    valid = np.asarray(scene.valid)
    bound = field.config.bound
    slab_w = 2 * bound / baker.n_blocks
    ppb = baker.points_per_block
    for b in range(baker.n_blocks):
        rows = slice(b * ppb, (b + 1) * ppb)
        m = valid[rows]
        if m.any():
            x = pts[rows][m, 0]
            assert (x >= -bound + b * slab_w - 1e-5).all()
            assert (x <= -bound + (b + 1) * slab_w + 1e-5).all()

    # Rendered depth agrees with the monolithic bake.
    full = bake(field, params, resolution=96, max_points=2 ** 15)
    K = dataset.scene.camera.camera_matrix
    w, h = dataset.scene.camera.size
    T_CW_file = np.loadtxt(os.path.join(dataset.scene.path, 'pose', '0.txt'))
    T_CW = np.linalg.inv(convert_pose(T_CW_file))
    d_inc = np.asarray(BakedRenderer(scene).render(K, T_CW, (w, h))['depth'])
    d_full = np.asarray(BakedRenderer(full).render(K, T_CW, (w, h))['depth'])
    both = (d_inc > 0) & (d_full > 0)
    assert both.sum() > 50
    assert np.median(np.abs(d_inc[both] - d_full[both])) < 0.1

    # Rotation: n_blocks updates come back to block 0.
    order = [baker.update_next_block(params) for _ in range(baker.n_blocks)]
    assert order == list(range(baker.n_blocks))
    assert baker._next_block == 0


def _governed_with_fake_clock(baked, costs):
    """GovernedPreviewRenderer whose frame times come from a fake clock
    advancing `costs[level]` per rendered frame."""
    from autolabel_tpu.render.baked import GovernedPreviewRenderer

    state = {'t': 0.0}

    def clock():
        return state['t']

    renderer = GovernedPreviewRenderer(baked, target_fps=30.0,
                                       sync_every=2, time_fn=clock)
    orig_render = renderer._renderer

    class _Timed:
        def __init__(self, inner):
            self.inner = inner

        def render(self, K, T, size):
            out = self.inner.render(K, T, size)
            state['t'] += costs[renderer.level]
            return out

    renderer._renderer = lambda: _Timed(orig_render())
    return renderer, costs


_CAM_K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
_CAM_T = np.eye(4)
_CAM_T[2, 3] = 2.0


def test_governed_preview_steps_down_when_profitable(trained):
    """Splat-bound frames: missing the 30 fps budget at the full level
    steps down to a level that holds it; when frame times later beat
    target * headroom the governor climbs back to full fidelity."""
    from autolabel_tpu.render.baked import bake

    field, params, dataset = trained
    baked = bake(field, params, resolution=96, max_points=2 ** 14)
    costs = {0: 0.05, 1: 0.028, 2: 0.02}  # halving splats genuinely pays
    renderer, costs = _governed_with_fake_clock(baked, costs)

    assert renderer.level == 0
    for _ in range(12):
        out = renderer.render(_CAM_K, _CAM_T, (64, 48))
    # 50 ms misses the 33 ms budget; 28 ms at level 1 holds it and the
    # profit check confirms the down-step earned its fidelity cost.
    assert renderer.level == 1
    # Weather improves: frame times beat 33 ms * 0.45 -> back to full.
    costs.update({0: 0.01, 1: 0.0056, 2: 0.004})
    for _ in range(24):
        out = renderer.render(_CAM_K, _CAM_T, (64, 48))
        if renderer.level == 0:
            break
    assert renderer.level == 0
    assert out['image'].shape == (48, 64, 3)
    assert 'splat_level' in out


def test_governed_preview_reverts_unprofitable_downstep(trained):
    """Latency-bound frames (tunnel RTT): dropping splats buys nothing,
    so the governor reverts to full fidelity and locks the down-move
    out instead of pinning the preview at minimum quality (measured r4:
    per-frame-synced control floored the budget while the full budget
    pipelined at 39 fps)."""
    from autolabel_tpu.render.baked import bake

    field, params, dataset = trained
    baked = bake(field, params, resolution=96, max_points=2 ** 14)
    costs = {0: 0.05, 1: 0.05, 2: 0.05}  # the floor is elsewhere
    renderer, costs = _governed_with_fake_clock(baked, costs)

    levels_seen = set()
    occupancy = []
    for i in range(60):
        renderer.render(_CAM_K, _CAM_T, (64, 48))
        levels_seen.add(renderer.level)
        occupancy.append(renderer.level)
        if i >= 39 and renderer.level == 0:
            break
    # Probed down at least once, measured no gain, and spends the vast
    # majority of frames at full fidelity instead of pinning low.
    assert 1 in levels_seen
    assert renderer.level == 0
    assert np.mean(np.asarray(occupancy) == 0) > 0.6


def test_incremental_baker_cold_start_uses_global_scale(trained):
    """A FRESH baker driven only by update_next_block (the
    benchmarks/preview_fps.py path) must not threshold its first slabs
    against partial statistics: the first call sweeps every slab's
    densities so _alpha_scale is global from the start, and the
    per-block decay keeps the scale within ~0.9x over a full rotation
    instead of 0.9**n_blocks."""
    from autolabel_tpu.render.baked import IncrementalBaker

    field, params, _ = trained
    baker = IncrementalBaker(field, resolution=96, max_points=2 ** 15,
                             n_blocks=8)
    baker.update_next_block(params)
    cold_scale = baker._alpha_scale
    assert cold_scale > 0.0

    # The cold-start scale equals the global max slab percentile, not
    # just slab 0's.
    global_scale = max(
        float(np.percentile(baker._slab_alpha(params, b)[1], 99.9))
        for b in range(baker.n_blocks))
    assert cold_scale == pytest.approx(global_scale, rel=1e-6)

    # Over the rest of the rotation the scale never sags below 0.9x the
    # global percentile (the old 0.9-per-block decay reached ~0.43x by
    # block 8).
    for _ in range(baker.n_blocks - 1):
        baker.update_next_block(params)
        assert baker._alpha_scale >= 0.9 * global_scale - 1e-9


def _two_plane_scene(cell=0.1):
    """Hand-built BakedScene: a sparse near plane (class 1) at z=2 in
    front of a dense far plane (class 2) at z=6, camera at the origin
    looking +z. Near splat centers sit `cell` apart, so with f=120 they
    project 6 px apart with a 3 px footprint radius — pixel rays between
    centers would pierce to the far plane without footprint
    propagation (the round-3/4 fidelity runs' 0.76 m depth MAE)."""
    import itertools

    import jax.numpy as jnp

    from autolabel_tpu.render.baked import BakedScene

    near = np.array([[x, y, 2.0] for x, y in itertools.product(
        np.arange(-0.8, 0.81, cell), repeat=2)], np.float32)
    far_step = 6.0 / 120.0  # ~1 px at z=6: dense, no gaps of its own
    far = np.array([[x, y, 6.0] for x, y in itertools.product(
        np.arange(-6.0, 6.01, far_step), repeat=2)], np.float32)
    points = np.concatenate([near, far])
    rgb = np.concatenate([np.tile([1.0, 0.0, 0.0], (len(near), 1)),
                          np.tile([0.0, 0.0, 1.0], (len(far), 1))]
                         ).astype(np.float32)
    semantic = np.concatenate([np.ones(len(near)), np.full(len(far), 2)]
                              ).astype(np.int32)
    return BakedScene(points=jnp.asarray(points), rgb=jnp.asarray(rgb),
                      semantic=jnp.asarray(semantic),
                      valid=jnp.ones(len(points), bool), cell_size=cell)


def test_footprint_propagation_stops_piercing():
    """Pixels between near-plane splat centers must show the NEAR
    surface (footprint-covered), not the far plane their exact ray
    hits — and the near plane must not dilate far past its physical
    footprint into regions only the far plane occupies."""
    intrinsics = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]],
                          np.float32)
    renderer = BakedRenderer(_two_plane_scene())
    out = renderer.render(intrinsics, np.eye(4, dtype=np.float32),
                          (64, 64))
    sem = np.asarray(out['semantic'])
    depth = np.asarray(out['depth'])

    # Interior of the near plane's projection: x,y in [-0.6, 0.6] at
    # z=2 -> px in [32-36, 32+36]. Every pixel there must read the near
    # plane: class 1 at depth ~2 (one cell of tolerance).
    inner = np.s_[32 - 30:32 + 30, 32 - 30:32 + 30]
    assert (sem[inner] == 1).all(), (sem[inner] == 1).mean()
    assert np.abs(depth[inner] - 2.0).max() < 0.2

    # Far outside the near plane's edge (+ footprint radius 3 px +
    # rounding): only the far plane. The near plane's edge projects to
    # 32 +/- 0.8*120/2 = 32 +/- 48 -> off this 64x64 frame entirely;
    # check the far-only region of a wider frame instead.
    out_wide = renderer.render(
        np.array([[40.0, 0, 64], [0, 40.0, 64], [0, 0, 1]], np.float32),
        np.eye(4, dtype=np.float32), (128, 128))
    sem_w = np.asarray(out_wide['semantic'])
    # Near-plane edge at 0.8 * 40 / 2 = 16 px from center; footprint
    # radius 40*0.1/4 = 1 px. Beyond ring 64 +/- 20 everything visible
    # is the far plane.
    far_band = sem_w[64 + 24:64 + 30, 64 - 30:64 + 30]
    assert (far_band == 2).all(), (far_band == 2).mean()
