"""Converters and SfM helpers: pure-function and file-format coverage."""
import json
import os
import struct
import sys
import zlib

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts')
sys.path.insert(0, SCRIPTS)

from autolabel_tpu.utils.ply import read_ply_vertices, write_ply_pointcloud


def test_ply_roundtrip(tmp_path):
    points = np.random.default_rng(0).normal(size=(100, 3)).astype(
        np.float32)
    colors = np.random.default_rng(1).random((100, 3))
    path = str(tmp_path / 'cloud.ply')
    write_ply_pointcloud(path, points, colors)
    vertices = read_ply_vertices(path)
    np.testing.assert_allclose(vertices, points, atol=1e-6)


def test_ply_ascii(tmp_path):
    path = str(tmp_path / 'ascii.ply')
    with open(path, 'w') as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n1 2 3\n4 5 6\n")
    vertices = read_ply_vertices(path)
    np.testing.assert_allclose(vertices, [[1, 2, 3], [4, 5, 6]])


def test_ransac_scale_robust_to_outliers():
    from mapping import ransac_scale
    rng = np.random.default_rng(0)
    inliers = 2.5 + rng.normal(scale=0.005, size=500)
    outliers = rng.uniform(0.1, 10.0, size=100)
    scales = np.concatenate([inliers, outliers])
    rng.shuffle(scales)
    estimate = ransac_scale(scales, iterations=2000, seed=1)
    assert abs(estimate - 2.5) < 0.05


def test_oriented_bounding_frame_recovers_box():
    from mapping import oriented_bounding_frame
    rng = np.random.default_rng(0)
    # A box of half-extents (2, 1, 0.5), rotated and offset.
    local = rng.uniform(-1, 1, size=(2000, 3)) * np.array([2.0, 1.0, 0.5])
    angle = 0.7
    R = np.array([[np.cos(angle), -np.sin(angle), 0],
                  [np.sin(angle), np.cos(angle), 0], [0, 0, 1.0]])
    points = local @ R.T + np.array([5.0, -3.0, 2.0])
    T, aabb = oriented_bounding_frame(points)
    # Transformed into the box frame, the AABB is centered and matches the
    # half-extents (sorted: PCA may permute axes).
    transformed = points @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(transformed.mean(axis=0), 0.0, atol=0.1)
    extents = np.sort(aabb[1] - aabb[0])[::-1]
    np.testing.assert_allclose(extents, [4.0, 2.0, 1.0], atol=0.1)


def test_sens_reader(tmp_path):
    """Parse a synthetic ScanNet .sens v4 stream."""
    import cv2
    from convert_scannet import SensReader

    path = str(tmp_path / 'scene.sens')
    rgb = np.random.default_rng(0).integers(0, 255, (8, 12, 3),
                                            dtype=np.uint8)
    ok, jpeg = cv2.imencode('.jpg', rgb)
    assert ok
    depth = (np.arange(8 * 12, dtype=np.uint16) * 10).reshape(8, 12)
    depth_blob = zlib.compress(depth.tobytes())
    pose = np.eye(4, dtype=np.float32)

    with open(path, 'wb') as f:
        f.write(struct.pack('I', 4))
        name = b'sensor'
        f.write(struct.pack('Q', len(name)))
        f.write(name)
        for _ in range(4):  # intrinsics/extrinsics color+depth
            f.write(np.eye(4, dtype=np.float32).tobytes())
        f.write(struct.pack('i', 1))  # color compression (jpeg)
        f.write(struct.pack('i', 0))  # depth compression (zlib)
        f.write(struct.pack('II', 12, 8))  # color size
        f.write(struct.pack('II', 12, 8))  # depth size
        f.write(struct.pack('f', 1000.0))  # depth shift
        f.write(struct.pack('Q', 2))  # num frames
        for _ in range(2):
            f.write(pose.tobytes())
            f.write(struct.pack('Q', 0))  # ts color
            f.write(struct.pack('Q', 0))  # ts depth
            f.write(struct.pack('Q', len(jpeg)))
            f.write(struct.pack('Q', len(depth_blob)))
            f.write(jpeg.tobytes())
            f.write(depth_blob)

    with SensReader(path) as reader:
        assert reader.num_frames == 2
        assert reader.rgb_size == (12, 8)
        frames = list(reader.read())
    assert len(frames) == 2
    T_WC, rgb_out, depth_out = frames[0]
    np.testing.assert_allclose(T_WC, np.eye(4))
    assert rgb_out.shape == (8, 12, 3)
    np.testing.assert_array_equal(depth_out, depth)


def test_convert_to_instant_ngp(sphere_scene, monkeypatch):
    import convert_to_instant_ngp
    out_path = os.path.join(sphere_scene, 'transforms.json')
    if os.path.exists(out_path):
        os.remove(out_path)
    monkeypatch.setattr(sys, 'argv',
                        ['convert_to_instant_ngp.py', '--dataset_folder',
                         sphere_scene])
    convert_to_instant_ngp.main()
    with open(out_path) as f:
        transforms = json.load(f)
    assert len(transforms['frames']) == 12
    assert transforms['w'] == 48 and transforms['h'] == 36
    assert transforms['scale'] > 0
    M = np.asarray(transforms['frames'][0]['transform_matrix'])
    np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3),
                               atol=1e-5)
    # Cameras orbit at unit-ish average distance after rescaling... the
    # scale normalizes mean camera distance to 1.
    dists = [np.linalg.norm(np.asarray(f['transform_matrix'])[:3, 3]) *
             transforms['scale'] for f in transforms['frames']]
    np.testing.assert_allclose(np.mean(dists), 1.0, rtol=1e-5)


def test_scene_bounds_cli(sphere_scene, monkeypatch):
    import compute_scene_bounds
    bbox_path = os.path.join(sphere_scene, 'bbox.txt')
    original = open(bbox_path).read()
    try:
        monkeypatch.setattr(sys, 'argv',
                            ['compute_scene_bounds.py', sphere_scene])
        compute_scene_bounds.main()
        bounds = np.loadtxt(bbox_path)[:6].reshape(2, 3)
        # The sphere (radius 0.5) and all cameras (distance ~1.7) fit.
        assert (bounds[0] < -0.5).all()
        assert (bounds[1] > 0.5).all()
    finally:
        with open(bbox_path, 'w') as f:
            f.write(original)


def test_create_rosbag_message_streams(tmp_path):
    """ops/maplab/create_rosbag.py without ROS: pure message builders
    over a capture reader, merged into global timestamp order (images +
    camera_info + imu + maplab odometry with the reference's topic and
    field contract)."""
    import importlib.util
    import types
    spec = importlib.util.spec_from_file_location(
        'create_rosbag',
        os.path.join(os.path.dirname(SCRIPTS), 'ops', 'maplab',
                     'create_rosbag.py'))
    crb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(crb)

    class _Vec:
        def __init__(self):
            self.x = self.y = self.z = self.w = 0.0

    class _Msg:
        def __init__(self):
            self.header = types.SimpleNamespace(stamp=None, seq=None,
                                                frame_id=None)
            self.pose = types.SimpleNamespace(
                pose=types.SimpleNamespace(position=_Vec(),
                                           orientation=_Vec()))
            self.linear_acceleration = _Vec()
            self.angular_velocity = _Vec()

    class _Time:
        def __init__(self, seconds):
            self.seconds = seconds

        def to_sec(self):
            return self.seconds

    class _Bridge:
        def cv2_to_imgmsg(self, image):
            msg = _Msg()
            msg.image = image
            return msg

        cv2_to_compressed_imgmsg = cv2_to_imgmsg

    ros = {'Time': _Time, 'CvBridge': _Bridge, 'CameraInfo': _Msg,
           'Imu': _Msg, 'OdometryWithImuBiases': _Msg}

    # odometry: timestamp, frame, xyz, qxyzw; imu interleaves between.
    odometry = np.array([
        [0.0, 0, 1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0],
        [0.1, 1, 1.1, 2.1, 3.1, 0.0, 0.0, 0.0, 1.0],
    ])
    imu = np.array([
        [0.02, 0.1, 0.2, 9.8, 0.01, 0.02, 0.03],
        [0.07, 0.1, 0.2, 9.8, 0.01, 0.02, 0.03],
    ])

    capture = crb.StrayCapture.__new__(crb.StrayCapture)
    capture.intrinsics = np.diag([500.0, 500.0, 1.0])
    capture.odometry = odometry
    capture.imu = imu
    capture.frames = lambda: iter(
        [(0.0, np.zeros((4, 6, 3), np.uint8)),
         (0.1, np.zeros((4, 6, 3), np.uint8))])

    messages = list(crb.build_messages(capture, ros))
    times = [stamp.to_sec() for _, _, stamp in messages]
    assert times == sorted(times)  # globally time-ordered bag
    topics = [topic for topic, _, _ in messages]
    assert topics.count('/rgb/image_raw') == 2
    assert topics.count('/rgb/camera_info') == 2
    assert topics.count('/imu') == 2
    assert topics.count('/pose') == 2

    info = next(m for t, m, _ in messages if t == '/rgb/camera_info')
    assert (info.height, info.width) == (4, 6)
    assert info.K[0] == 500.0 and info.distortion_model == 'plumb_bob'
    imu_msg = next(m for t, m, _ in messages if t == '/imu')
    assert imu_msg.linear_acceleration.z == 9.8
    assert imu_msg.angular_velocity.x == 0.01
    pose = next(m for t, m, _ in messages if t == '/pose')
    assert pose.pose.pose.position.x == 1.0
    assert pose.pose.pose.orientation.w == 1.0
    assert pose.child_frame_id == 'rgb_optical'


def test_convert_scanner_capture(tmp_path):
    """scripts/convert_scanner.py: video + confidence-masked depth +
    intrinsics into the raw-scene contract, with subsample and rotate."""
    import importlib
    import cv2
    scanner = importlib.import_module('convert_scanner')

    scan = tmp_path / 'scan'
    (scan / 'depth').mkdir(parents=True)
    (scan / 'confidence').mkdir()
    w, h = 32, 24
    writer = cv2.VideoWriter(str(scan / 'rgb.mp4'),
                             cv2.VideoWriter_fourcc(*'mp4v'), 30, (w, h))
    for i in range(4):
        frame = np.full((h, w, 3), i * 40, np.uint8)
        writer.write(frame)
    writer.release()
    rng = np.random.default_rng(0)
    for i in range(4):
        depth = rng.integers(100, 5000, (h, w)).astype(np.uint16)
        conf = np.full((h, w), 2, np.uint8)
        conf[:, :8] = 1  # low-confidence stripe
        cv2.imwrite(str(scan / 'depth' / f'{i}.png'), depth)
        cv2.imwrite(str(scan / 'confidence' / f'{i}.png'),
                    np.stack([conf] * 3, axis=-1))
    K = np.array([[400.0, 0, 16], [0, 410.0, 12], [0, 0, 1]])
    np.savetxt(scan / 'camera_matrix.csv', K, delimiter=',')

    out = tmp_path / 'scene'
    scanner.convert(str(scan), str(out), subsample=2)

    assert sorted(os.listdir(out / 'raw_rgb')) == ['00000.jpg', '00001.jpg']
    assert sorted(os.listdir(out / 'raw_depth')) == ['00000.png',
                                                     '00001.png']
    depth0 = cv2.imread(str(out / 'raw_depth' / '00000.png'), -1)
    assert (depth0[:, :8] == 0).all()          # masked stripe
    assert (depth0[:, 8:] > 0).all()
    np.testing.assert_allclose(np.loadtxt(out / 'intrinsics.txt'), K)

    # Rotation: swapped intrinsics and portrait frames.
    out_rot = tmp_path / 'scene_rot'
    scanner.convert(str(scan), str(out_rot), rotate=True)
    K_rot = np.loadtxt(out_rot / 'intrinsics.txt')
    assert K_rot[0, 0] == K[1, 1] and K_rot[1, 1] == K[0, 0]
    assert cv2.imread(str(out_rot / 'raw_depth' / '00000.png'),
                      -1).shape == (w, h)


def test_convert_arkitscenes_capture(tmp_path):
    """scripts/convert_arkitscenes.py: asset maps + trajectory matching
    into the scene contract (confidence masking, pose timestamp gate,
    intrinsics)."""
    import importlib
    import cv2
    arkit = importlib.import_module('convert_arkitscenes')

    scene = tmp_path / 'cap' / '41069021'
    for sub in ('lowres_wide', 'lowres_depth', 'confidence',
                'lowres_wide_intrinsics'):
        (scene / sub).mkdir(parents=True)
    w, h = 32, 24
    rng = np.random.default_rng(1)
    # Three frames; the third has no pose within 1/90 s.
    stamps = ['41069021_1000.100', '41069021_1000.200', '41069021_1000.900']
    for name in stamps:
        rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        depth = rng.integers(100, 4000, (h, w)).astype(np.uint16)
        conf = np.full((h, w), 2, np.uint8)
        conf[:4] = 0
        cv2.imwrite(str(scene / 'lowres_wide' / f'{name}.png'), rgb)
        cv2.imwrite(str(scene / 'lowres_depth' / f'{name}.png'), depth)
        cv2.imwrite(str(scene / 'confidence' / f'{name}.png'), conf)
    np.savetxt(scene / 'lowres_wide_intrinsics' / f'{stamps[0]}.pincam',
               np.array([w, h, 300.0, 310.0, 16.0, 12.0]))
    # trajectory rows: timestamp, rotvec (3), translation (3)
    np.savetxt(scene / 'lowres_wide.traj', np.array([
        [1000.101, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0],
        [1000.203, 0.0, 0.0, np.pi / 2, 4.0, 5.0, 6.0],
    ]))

    capture = arkit.ArkitCapture(str(scene))
    assert capture.complete
    out = tmp_path / 'scene'
    arkit.write_scene(capture, str(out))

    # Frame 3 dropped by the pose gate -> two frames written.
    assert sorted(os.listdir(out / 'rgb')) == ['000000.png', '000001.png']
    depth0 = cv2.imread(str(out / 'depth' / '000000.png'), -1)
    assert (depth0[:4] == 0).all() and (depth0[4:] > 0).all()
    T = np.loadtxt(out / 'pose' / '000001.txt')
    np.testing.assert_allclose(T[:3, 3], [4.0, 5.0, 6.0])
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-9)
    K = np.loadtxt(out / 'intrinsics.txt')
    assert K[0, 0] == 300.0 and K[1, 2] == 12.0
