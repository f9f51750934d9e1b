"""Camera-pose optimization (train/pose_refine.py).

`register_camera` (pose vs a frozen trained field) is the validated
feature and is tested for actual pose recovery. The joint training mode
is exercised as a smoke test only — on few-frame synthetic captures it
is a measured dead end (field co-adaptation; see the module docstring
and NOTES.md), kept experimental for large real captures."""
import os
import sys

import jax
import numpy as np
import pytest

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow


sys.path.insert(0, os.path.dirname(__file__))

cv2 = pytest.importorskip('cv2')


def _rot_err_deg(Ra, Rb):
    cosang = (np.trace(Ra @ Rb.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cosang, -1, 1)))


def _train_room_field(scene, iters=600, pose_refine=None, dataset=None):
    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import LenDataset, SceneDataset
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.loader import PrefetchIterator
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    ds = dataset or SceneDataset('train', scene, factor=1, batch_size=512)
    # Seed the batch sampler: the quick 600-iter field's quality (and
    # so register_camera's recovery floor) is otherwise run-to-run
    # nondeterministic, which made the recovery assertion flaky.
    ds.rng = np.random.default_rng(11)
    bound = model_utils.compute_bound(ds.min_bounds, ds.max_bounds)
    grid = HashGridConfig(n_levels=4, n_features=8, log2_hashmap_size=15,
                          base_resolution=16, per_level_scale=1.6)
    field = Field(FieldConfig(encoding='hg+freq', hidden_dim=64,
                              hidden_dim_color=64, hidden_dim_semantic=32,
                              semantic_classes=ds.n_classes or 5,
                              bound=bound, grid=grid, proposal=True,
                              grid_interp='simplex'))
    trainer = SimpleTrainer(
        'pose', field, lr=5e-3, iters=iters,
        loss_options=LossOptions(),
        render_options=RenderOptions(num_steps=48, proposal_steps=24,
                                     perturb=True, stochastic_corners=0,
                                     sampled_backward=2),
        workspace=None, ema_decay=0.95, exact_final_fraction=0.1,
        metrics=False, pose_refine=pose_refine)
    loader = PrefetchIterator(LenDataset(ds, iters),
                              transform=trainer._device_batch)
    trainer.train(loader, 1, iters)
    return ds, field, trainer


def test_register_camera_recovers_pose(tmp_path):
    """Perturb one camera of a TRAINED scene and register it back:
    photometric+depth pose optimization against the frozen field must
    recover most of the injected error."""
    from room import make_room_scene
    from autolabel_tpu.core.rays import compute_directions
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.pose_refine import register_camera

    scene = str(tmp_path / 'scene')
    make_room_scene(scene, n_frames=10, width=80, height=60,
                    label_every=2)
    # 2000 iters: a 600-iter field's photometric optimum sits ~4 deg
    # from truth (its blur floor), which made the recovery assertion
    # hover AT the threshold and flip with run-to-run numerics
    # (measured r4: 600 iters -> 5.0->3.8..6.0 deg; 2000 iters ->
    # 5.0->0.91 deg / 0.099->0.016 m). The sharper field asserts the
    # property this test is about with real margin.
    ds, field, trainer = _train_room_field(scene, iters=2000)

    # 5 deg / ~10 cm off: well outside the registration accuracy floor
    # (~1-2 deg at this field blur — the photometric optimum of a
    # quick low-res field sits that far from truth; measured,
    # NOTES.md), so recovery is unambiguous.
    f = 3
    R_gt = np.array(ds.rotations[f])
    t_gt = np.array(ds.origins[f])
    rng = np.random.default_rng(7)
    axis = rng.normal(size=3)
    axis *= np.radians(5.0) / np.linalg.norm(axis)
    R_bad = R_gt @ cv2.Rodrigues(axis)[0]
    t_bad = t_gt + rng.normal(scale=0.07, size=3)
    rot_err0 = _rot_err_deg(R_bad, R_gt)
    t_err0 = float(np.linalg.norm(t_bad - t_gt))

    idx = rng.choice(ds.resolution, size=2048, replace=False)
    dirs_cam, norms = compute_directions(np.eye(3), idx, ds.w,
                                         ds.camera.fx, ds.camera.fy,
                                         ds.camera.cx, ds.camera.cy)
    pixels = np.asarray(ds.images[f])[idx]
    depth = np.asarray(ds.depths[f])[idx] / 1000.0

    R1, t1, loss = register_camera(
        field, trainer.state['params'], pixels, dirs_cam, norms,
        R_bad, t_bad,
        options=RenderOptions(num_steps=48, proposal_steps=24,
                              perturb=False),
        iters=400, lr=5e-3, depth=depth)

    rot_err1 = _rot_err_deg(R1, R_gt)
    t_err1 = float(np.linalg.norm(t1 - t_gt))
    # Measured r4 at this config: 0.91 deg / 0.016 m — the 0.5x bars
    # leave >2x margin against host-to-host numeric variance.
    assert rot_err1 < rot_err0 * 0.5, (rot_err0, rot_err1)
    assert t_err1 < t_err0 * 0.5, (t_err0, t_err1)
    assert np.isfinite(loss)


def test_joint_pose_refinement_smoke(tmp_path):
    """Joint mode wires up end to end: pose params exist, receive
    finite updates, the gauge anchor stays fixed, and refined_poses
    round-trips."""
    from room import make_room_scene
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.train.pose_refine import refined_poses

    scene = str(tmp_path / 'scene')
    make_room_scene(scene, n_frames=6, width=64, height=48,
                    label_every=2)
    ds = SceneDataset('train', scene, factor=1, batch_size=512)
    ds.emit_frame_rays = True
    R0 = np.array(ds.rotations)
    t0 = np.array(ds.origins)
    # iters=200 -> pose lr unfreezes at step 20 (10% warmup).
    _, _, trainer = _train_room_field(scene, iters=200,
                                      pose_refine=(R0, t0), dataset=ds)
    pose = {k: np.asarray(v)
            for k, v in trainer.state['params']['pose'].items()}
    assert np.isfinite(pose['rot']).all() and np.isfinite(pose['t']).all()
    R1, t1 = refined_poses(pose, (R0, t0))
    np.testing.assert_allclose(R1[0], R0[0], atol=1e-6)  # gauge anchor
    np.testing.assert_allclose(t1[0], t0[0], atol=1e-6)
    # Deltas actually moved for the non-anchor frames (updates flowed).
    assert np.abs(pose['rot'][1:]).max() > 0


def test_register_cli_smoke(tmp_path):
    """scripts/register.py end to end: a (quickly) trained workspace +
    the CLI registers a perturbed frame, writes a valid scene-convention
    T_CW, and the written pose round-trips into the ngp frame. Recovery
    quality is covered by test_register_camera_recovers_pose; this
    pins the CLI contract (checkpoint loading, pose conventions,
    output file)."""
    from room import make_room_scene
    from autolabel_tpu import model_utils
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.losses import LossOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    scene = str(tmp_path / 'scene')
    make_room_scene(scene, n_frames=6, width=48, height=36, label_every=2)
    flags = model_utils.model_flag_parser().parse_args([])
    dataset = SceneDataset('train', scene, factor=1.0, batch_size=512)
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     dataset.n_classes, flags)
    model_dir = model_utils.model_dir(scene, flags)
    model_utils.write_params(model_dir, flags)
    trainer = SimpleTrainer('ngp', field, iters=100,
                            loss_options=LossOptions(),
                            render_options=RenderOptions(num_steps=16,
                                                         perturb=True),
                            workspace=model_dir, metrics=False)
    trainer.train_iterations(dataset, 30)
    trainer.save_checkpoint()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import register as register_cli
    out = str(tmp_path / 'pose.txt')
    sys.argv = [
        'register.py', scene, '--model-dir', model_dir, '--frame-index',
        '2', '--perturb-deg', '2', '--perturb-cm', '3', '--rays', '256',
        '--iters', '5', '--num-steps', '16', '--out', out,
    ]
    register_cli.main()

    T_CW = np.loadtxt(out)
    assert T_CW.shape == (4, 4)
    R = T_CW[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.isclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Round-trip: the written scene pose maps back to a finite ngp pose
    # in the dataset's frame.
    from autolabel_tpu.core.rays import convert_pose
    T_ngp = convert_pose(T_CW)
    assert np.isfinite(T_ngp).all()
    # The registered pose should still be in the neighborhood of the
    # (perturbed) initial frame, not teleported.
    assert np.linalg.norm(T_ngp[:3, 3] -
                          np.asarray(dataset.origins[2])) < 0.5


def test_resume_across_pose_refine_toggle(tmp_path):
    """A workspace checkpoint survives toggling --pose-refine in either
    direction: the model hash excludes the pose deltas, so _try_resume
    must reconcile the 'pose' entry before optax.masked touches the
    pytree (it used to crash on the dict-key mismatch)."""
    from room import make_room_scene
    from autolabel_tpu.core.dataset import SceneDataset
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig
    from autolabel_tpu.render.renderer import RenderOptions
    from autolabel_tpu.train.trainer import SimpleTrainer

    scene = str(tmp_path / 'scene')
    make_room_scene(scene, n_frames=4, width=48, height=36, label_every=2)
    ds = SceneDataset('train', scene, factor=1, batch_size=512)
    grid = HashGridConfig(n_levels=2, n_features=2, log2_hashmap_size=8,
                          base_resolution=8, per_level_scale=1.5)
    field = Field(FieldConfig(encoding='hg+freq', hidden_dim=32,
                              hidden_dim_color=32, hidden_dim_semantic=8,
                              semantic_classes=ds.n_classes, bound=2.0,
                              grid=grid))
    ws = str(tmp_path / 'ws')

    def make(pose_refine):
        return SimpleTrainer('ngp', field, iters=100, workspace=ws,
                             render_options=RenderOptions(num_steps=8),
                             metrics=False, pose_refine=pose_refine)

    plain = make(None)
    plain.train_iterations(ds, 2)
    plain.epoch = 1
    plain.save_checkpoint()

    # plain checkpoint -> pose-refine trainer: fresh zero deltas join.
    ds.emit_frame_rays = True
    pr = (np.array(ds.rotations), np.array(ds.origins))
    resumed = make(pr)
    assert resumed.global_step == plain.global_step
    assert 'pose' in resumed.state['params']
    assert float(np.abs(resumed.state['params']['pose']['rot']).max()) == 0

    resumed.train_iterations(ds, 2)
    resumed.epoch = 2
    resumed.save_checkpoint()

    # pose-refine checkpoint -> plain trainer: deltas dropped cleanly.
    ds.emit_frame_rays = False
    back = make(None)
    assert back.global_step == resumed.global_step
    assert 'pose' not in back.state['params']
    back.train_iterations(ds, 1)
