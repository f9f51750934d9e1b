"""scripts/fuse_gt_mesh.py: gt depth + labels -> mesh.ply/mesh_labels.npy
for the 3D open-vocab evaluator, checked against the room scene's known
analytic geometry and the renderer's own ray convention."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'scripts'))

from tests.room import BOXES, ROOM_MAX, ROOM_MIN, SPHERES, make_room_scene


@pytest.fixture(scope='module')
def room_scene(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp('scenes') / 'room')
    make_room_scene(scene_dir, n_frames=10, width=80, height=60)
    return scene_dir


def test_fuse_gt_mesh_geometry(room_scene):
    import fuse_gt_mesh

    points, labels = fuse_gt_mesh.fuse_scene(room_scene, frame_stride=2,
                                             pixel_stride=2,
                                             voxel_size=0.02)
    assert len(points) == len(labels)
    assert len(points) > 2000
    present = set(np.unique(labels))
    assert {1, 2, 3, 4, 5} <= present

    # Class-2 points lie on the red sphere's surface.
    center, radius, _, cls = SPHERES[0]
    on_sphere = points[labels == cls]
    dist = np.linalg.norm(on_sphere - center, axis=-1)
    assert np.abs(dist - radius).max() < 0.02

    # Class-3 points lie on the green box's surface (inside the AABB and
    # within a hair of a face).
    bmin, bmax, _, cls = BOXES[0]
    on_box = points[labels == cls]
    assert (on_box >= bmin - 0.01).all() and (on_box <= bmax + 0.01).all()
    face_dist = np.minimum(np.abs(on_box - bmin),
                           np.abs(on_box - bmax)).min(axis=-1)
    assert face_dist.max() < 0.01

    # Background points sit on the room shell.
    walls = points[labels == 1]
    shell = np.minimum(np.abs(walls - ROOM_MIN),
                       np.abs(walls - ROOM_MAX)).min(axis=-1)
    assert np.percentile(shell, 99) < 0.02

    # Voxel dedupe: one point per 2 cm cell.
    cells = np.floor(points / 0.02).astype(np.int64)
    assert len(np.unique(cells, axis=0)) == len(points)


def test_fused_points_match_ray_convention(room_scene):
    """The world->ngp permutation the 3D evaluator applies at read time
    (mesh x,y,z -> y,z,x) must land fused points exactly on the
    renderer's rays: p_ngp == origin + unit_dir * (z_depth * norm)."""
    import cv2

    import fuse_gt_mesh
    from autolabel_tpu.core.rays import compute_directions, convert_pose
    from autolabel_tpu.utils import Scene

    scene = Scene(room_scene)
    depth = cv2.imread(scene.depth_paths()[0], -1).astype(np.float32) / 1000.0
    labels = cv2.imread(scene.gt_semantic()[0], -1)
    K = scene.camera.camera_matrix
    T_CW = scene.poses[0]

    points, _ = fuse_gt_mesh.backproject_frame(depth, labels, K, T_CW)
    p_ngp = np.stack([points[:, 1], points[:, 2], points[:, 0]], axis=-1)

    h, w = depth.shape
    keep = ((depth > 0) & (labels > 0)).reshape(-1)
    T_WC = convert_pose(T_CW)
    dirs, norms = compute_directions(
        np.ascontiguousarray(T_WC[:3, :3]),
        np.arange(h * w)[keep], w, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    z = depth.reshape(-1)[keep, None]
    on_ray = T_WC[:3, 3] + dirs * (z * norms)
    np.testing.assert_allclose(p_ngp, on_ray, atol=1e-4)
