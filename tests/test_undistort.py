"""The HLoc backend's post-reconstruction undistortion stage.

The reference rectifies raw_rgb/raw_depth with the COLMAP-refined
OPENCV intrinsics (reference scripts/mapping.py:139-175); here that is
scripts/mapping.undistort_scene + autolabel_tpu.undistort. No SfM stack
is needed: the test fabricates a distorted capture analytically — dots
painted at the OPENCV forward-distortion of known 3D points — and
checks that after undistort_scene each dot sits at the plain pinhole
projection under the rectified camera, for the rgb stream and the
lower-resolution depth stream (scaled camera), with depth values
preserved through nearest-neighbor remap.
"""
import importlib.util
import json
import os

import cv2
import numpy as np
import pytest


def _load_mapping():
    path = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                        'mapping.py')
    spec = importlib.util.spec_from_file_location('mapping_cli', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _distort_project(K, dist, points_c):
    """OPENCV (k1 k2 p1 p2) forward model: 3D camera-frame points ->
    distorted pixel coordinates (the raw sensor image)."""
    pts, _ = cv2.projectPoints(points_c.reshape(-1, 1, 3), np.zeros(3),
                               np.zeros(3), K, np.asarray(dist, np.float64))
    return pts.reshape(-1, 2)


def _dot_centers(image, n):
    """Centroids of the n brightest connected blobs."""
    mask = (image > 128).astype(np.uint8)
    count, labels, stats, centroids = cv2.connectedComponentsWithStats(mask)
    order = np.argsort(stats[1:, cv2.CC_STAT_AREA])[::-1][:n]
    return centroids[1:][order]


@pytest.fixture()
def distorted_scene(tmp_path):
    scene = tmp_path / 'scene'
    (scene / 'raw_rgb').mkdir(parents=True)
    (scene / 'raw_depth').mkdir()
    (scene / 'pose').mkdir()

    w, h = 320, 240
    K = np.array([[260.0, 0, w / 2], [0, 260.0, h / 2], [0, 0, 1.0]])
    dist = np.array([-0.28, 0.07, 0.001, -0.002])

    # Known 3D points in the camera frame, kept off-center so the radial
    # distortion displaces them by several pixels.
    points_c = np.array([[0.35, 0.22, 1.0],
                         [-0.40, -0.25, 1.2],
                         [0.30, -0.28, 0.9],
                         [-0.33, 0.30, 1.1]])
    raw = np.zeros((h, w), np.uint8)
    for u, v in _distort_project(K, dist, points_c):
        cv2.circle(raw, (int(round(u)), int(round(v))), 3, 255, -1)
    cv2.imwrite(str(scene / 'raw_rgb' / '0.png'), raw)

    # Depth stream at half resolution: constant-depth dots at the
    # distorted positions of the same points under the scaled camera.
    dw, dh = w // 2, h // 2
    Kd = K.copy()
    Kd[:2] *= 0.5
    depth_raw = np.zeros((dh, dw), np.uint16)
    for (u, v), p in zip(_distort_project(Kd, dist, points_c), points_c):
        cv2.circle(depth_raw, (int(round(u)), int(round(v))), 2,
                   int(p[2] * 1000), -1)
    cv2.imwrite(str(scene / 'raw_depth' / '0.png'), depth_raw)

    np.savetxt(str(scene / 'pose' / '0.txt'), np.eye(4))
    np.savetxt(str(scene / 'intrinsics.txt'), K)
    (scene / 'metadata.json').write_text(json.dumps({'n_classes': 2}))
    return str(scene), K, dist, points_c


def test_undistort_scene_recovers_pinhole_projection(distorted_scene):
    scene_path, K, dist, points_c = distorted_scene
    mapping = _load_mapping()
    from autolabel_tpu.utils import Scene

    mapping.undistort_scene(Scene(scene_path), K, dist)

    rgb = cv2.imread(os.path.join(scene_path, 'rgb', '0.png'),
                     cv2.IMREAD_GRAYSCALE)
    depth = cv2.imread(os.path.join(scene_path, 'depth', '0.png'),
                       cv2.IMREAD_UNCHANGED)
    assert rgb is not None and depth is not None
    assert depth.dtype == np.uint16 and depth.shape == (120, 160)

    # After rectification each dot must sit at the PLAIN pinhole
    # projection under the ORIGINAL K: the reference remaps onto
    # newCameraMatrix=K (reference undistort.py:26-28), which keeps the
    # intrinsics.txt written by the mapping stage consistent with the
    # rectified rgb/depth pixels.
    from autolabel_tpu.undistort import ImageUndistorter
    und = ImageUndistorter(K, dist, (rgb.shape[1], rgb.shape[0]))
    assert np.allclose(und.new_K, K)
    expected = (points_c[:, :2] / points_c[:, 2:]) @ K[:2, :2].T + K[:2, 2]
    found = _dot_centers(rgb, len(points_c))
    # Match each expected dot to the nearest found centroid.
    for e in expected:
        assert np.min(np.linalg.norm(found - e, axis=1)) < 2.0

    # Depth stream: same property under the scaled camera, and the
    # nearest-neighbor remap preserves the metric values exactly.
    Kd = K.copy()
    Kd[:2] *= 0.5
    expected_d = (points_c[:, :2] / points_c[:, 2:]) @ Kd[:2, :2].T + Kd[:2, 2]
    values = set(np.unique(depth[depth > 0]))
    for e, p in zip(expected_d, points_c):
        x, y = int(round(e[0])), int(round(e[1]))
        patch = depth[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3]
        assert (patch == int(p[2] * 1000)).any()
    assert values <= {int(p[2] * 1000) for p in points_c}
