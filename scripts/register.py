"""Register (localize) a camera frame against a TRAINED scene.

Optimizes one SE(3) pose through the frozen volumetric field
(train/pose_refine.register_camera): photometric + optional depth loss,
Adam with cosine decay, starting from an initial guess (a nearby
dataset frame, or a pose file). Validated recovery: 5 deg / 10 cm of
initial error converges 4x toward the true pose in ~400 steps (the
residual is the field's own blur floor; NOTES.md round 3).

Use cases: localizing a NEW capture frame against a trained scene (the
online path; the ROS node consumes poses from SLAM, this is the
SLAM-free alternative), or re-aligning a drifted SfM pose after
training. The reference has no equivalent — it trains and renders on
whatever poses COLMAP produced (reference scripts/mapping.py, train.py).

Pose file convention: 4x4 T_CW (OpenCV world-to-camera), the same as
the scene's pose/*.txt files.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu import model_utils
from autolabel_tpu.core.dataset import SceneDataset
from autolabel_tpu.core.rays import (compute_directions, convert_pose,
                                     ngp_pose_to_scene)
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.pose_refine import register_camera


def read_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('scene')
    parser.add_argument('--model-dir', type=str, required=True)
    parser.add_argument('--image', type=str, default=None,
                        help="External RGB frame to register (resized to "
                        "the scene camera; assumes the scene intrinsics). "
                        "Default: use --frame-index from the scene.")
    parser.add_argument('--depth', type=str, default=None,
                        help="Optional depth PNG (mm) for --image.")
    parser.add_argument('--frame-index', type=int, default=0,
                        help="Scene frame to register (ignored with "
                        "--image).")
    parser.add_argument('--init-frame', type=int, default=None,
                        help="Initialize from this scene frame's pose "
                        "(default: the registered frame's own pose, or "
                        "frame 0 for --image).")
    parser.add_argument('--init-pose', type=str, default=None,
                        help="Initialize from a 4x4 T_CW pose file "
                        "(scene pose/*.txt convention); overrides "
                        "--init-frame.")
    parser.add_argument('--perturb-deg', type=float, default=0.0,
                        help="Demo/eval: rotate the init away by this "
                        "many degrees before registering.")
    parser.add_argument('--perturb-cm', type=float, default=0.0,
                        help="Demo/eval: translate the init away by this "
                        "many centimeters (ngp units ~ meters).")
    parser.add_argument('--rays', type=int, default=2048)
    parser.add_argument('--iters', type=int, default=400)
    parser.add_argument('--lr', type=float, default=3e-3)
    parser.add_argument('--num-steps', type=int, default=64)
    parser.add_argument('--proposal-steps', type=int, default=32)
    parser.add_argument('--no-depth', action='store_true',
                        help="Photometric-only (skip the depth term even "
                        "when sensor depth exists).")
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--out', type=str, default=None,
                        help="Write the refined 4x4 T_CW here "
                        "(default: print only).")
    return parser.parse_args()


def _load_external(flags, dataset):
    import cv2
    w, h = dataset.camera.size
    bgr = cv2.imread(flags.image, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(flags.image)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    rgb = cv2.resize(rgb, (w, h)).reshape(-1, 3).astype(np.float32) / 255.0
    depth = None
    if flags.depth is not None:
        d = cv2.imread(flags.depth, cv2.IMREAD_UNCHANGED)
        depth = cv2.resize(d, (w, h), interpolation=cv2.INTER_NEAREST)
        depth = depth.reshape(-1).astype(np.float32) / 1000.0
    return rgb, depth


def main():
    flags = read_args()
    model_params = model_utils.read_params(flags.model_dir)
    dataset = SceneDataset('test', flags.scene, factor=1.0, batch_size=512,
                           lazy=True, load_semantic=False)
    n_classes = dataset.n_classes if dataset.n_classes is not None else 2
    field = model_utils.create_model(dataset.min_bounds, dataset.max_bounds,
                                     n_classes, model_params)
    params, _ = model_utils.load_checkpoint(
        os.path.join(flags.model_dir, 'checkpoints'))

    if flags.image is not None:
        pixels_flat, depth_flat = _load_external(flags, dataset)
        default_init = 0
    else:
        f = flags.frame_index
        pixels_flat = np.asarray(dataset.images[f]).reshape(-1, 3)
        if pixels_flat.max() > 1.5:
            pixels_flat = pixels_flat.astype(np.float32) / 255.0
        depth_flat = (np.asarray(dataset.depths[f]).reshape(-1)
                      .astype(np.float32) / 1000.0)
        default_init = f

    # Initial pose (ngp frame: R cam->world, t camera center).
    if flags.init_pose is not None:
        T = convert_pose(np.loadtxt(flags.init_pose))
        R0, t0 = T[:3, :3].copy(), T[:3, 3].copy()
    else:
        init = flags.init_frame if flags.init_frame is not None \
            else default_init
        R0 = np.array(dataset.rotations[init])
        t0 = np.array(dataset.origins[init])

    rng = np.random.default_rng(flags.seed)
    if flags.perturb_deg > 0:
        import cv2
        axis = rng.normal(size=3)
        axis *= np.radians(flags.perturb_deg) / np.linalg.norm(axis)
        R0 = R0 @ cv2.Rodrigues(axis)[0]
    if flags.perturb_cm > 0:
        off = rng.normal(size=3)
        t0 = t0 + off / np.linalg.norm(off) * (flags.perturb_cm / 100.0)

    idx = rng.choice(dataset.resolution, size=min(flags.rays,
                                                  dataset.resolution),
                     replace=False)
    dirs_cam, norms = compute_directions(np.eye(3), idx, dataset.w,
                                         dataset.camera.fx,
                                         dataset.camera.fy,
                                         dataset.camera.cx,
                                         dataset.camera.cy)
    pixels = pixels_flat[idx]
    depth = None
    if depth_flat is not None and not flags.no_depth:
        depth = depth_flat[idx]

    R1, t1, loss = register_camera(
        field, params, pixels, dirs_cam, norms, R0, t0,
        options=RenderOptions(num_steps=flags.num_steps,
                              proposal_steps=(flags.proposal_steps
                                              if field.config.proposal
                                              else 0),
                              perturb=False),
        iters=flags.iters, lr=flags.lr, depth=depth)

    T_ngp = np.eye(4)
    T_ngp[:3, :3] = R1
    T_ngp[:3, 3] = t1
    T_CW = ngp_pose_to_scene(T_ngp)
    rot_moved = np.degrees(np.arccos(np.clip(
        (np.trace(R1 @ R0.T) - 1) / 2, -1, 1)))
    print(f"registered: loss={loss:.5f} moved {rot_moved:.2f} deg / "
          f"{np.linalg.norm(t1 - t0) * 100:.1f} cm from the init")
    print(T_CW)
    if flags.out is not None:
        np.savetxt(flags.out, T_CW)
        print(f"T_CW (scene pose convention) -> {flags.out}")


if __name__ == '__main__':
    main()
