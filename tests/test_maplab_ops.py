"""Execute the maplab ops pipeline end to end under stub ROS modules.

The real pipeline is: Stray capture -> create_rosbag.py -> (Rovioli/Maplab
in Docker) -> csv trajectory export -> convert_to_autolabel.py -> scene
dir. ROS/maplab aren't installable here, so these tests run everything on
both sides of the Docker step with in-memory stand-ins for rosbag/rospy:
the bag WRITER path (create_rosbag.write_bag) and the bag READER +
scene-writer path (convert_to_autolabel collect_frames/write_scene),
checked against analytically-known camera geometry.

Reference: ops/maplab/create_rosbag.py, ops/maplab/convert_to_autolabel.py.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'scripts'))


def _load(name, *relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, *relpath))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


# ---------------------------------------------------------------- stubs

class _Vec:

    def __init__(self):
        self.x = self.y = self.z = self.w = 0.0


class _Msg:

    def __init__(self):
        self.header = types.SimpleNamespace(stamp=None, seq=None,
                                            frame_id=None)
        self.pose = types.SimpleNamespace(
            pose=types.SimpleNamespace(position=_Vec(), orientation=_Vec()))
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


def _ros_dict():
    return {'Time': _Time, 'CvBridge': _Bridge, 'CameraInfo': _Msg,
            'Imu': _Msg, 'OdometryWithImuBiases': _Msg}


class _RecordingBag:
    """Stub rosbag.Bag('w'): records writes instead of serializing."""

    instances = []

    def __init__(self, path, mode):
        assert mode == 'w'
        self.path = path
        self.writes = []
        self.closed = False
        _RecordingBag.instances.append(self)

    def write(self, topic, msg, t=None):
        assert not self.closed
        self.writes.append((topic, msg, t))

    def close(self):
        self.closed = True


class _ReadableBag:
    """Stub rosbag.Bag('r'): replays (topic, msg, t) records."""

    def __init__(self, records):
        self.records = records

    def read_messages(self, topics):
        wanted = [topics] if isinstance(topics, str) else list(topics)
        for topic, msg, t in self.records:
            if topic in wanted:
                yield topic, msg, t


# ------------------------------------------------------- bag writer path

def test_write_bag_records_time_ordered_stream(tmp_path, monkeypatch):
    crb = _load('create_rosbag_x', 'ops', 'maplab', 'create_rosbag.py')

    stub = types.ModuleType('rosbag')
    stub.Bag = _RecordingBag
    monkeypatch.setitem(sys.modules, 'rosbag', stub)
    _RecordingBag.instances = []

    capture = crb.StrayCapture.__new__(crb.StrayCapture)
    capture.intrinsics = np.diag([400.0, 400.0, 1.0])
    capture.odometry = np.array([
        [0.00, 0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
        [0.10, 1, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
        [0.20, 2, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
    ])
    capture.imu = np.array([
        [0.05, 0.0, 0.0, 9.8, 0.0, 0.0, 0.0],
        [0.15, 0.0, 0.0, 9.8, 0.0, 0.0, 0.0],
    ])
    image = np.zeros((6, 8, 3), np.uint8)
    capture.frames = lambda: iter([(t, image) for t in (0.0, 0.1, 0.2)])

    crb.write_bag(str(tmp_path / 'out.bag'), capture, _ros_dict())

    bag, = _RecordingBag.instances
    assert bag.closed
    # 3 images + 3 camera_infos + 2 imu + 3 poses.
    assert len(bag.writes) == 11
    stamps = [t.to_sec() for _, _, t in bag.writes]
    assert stamps == sorted(stamps)
    by_topic = {}
    for topic, _, _ in bag.writes:
        by_topic[topic] = by_topic.get(topic, 0) + 1
    assert by_topic == {'/rgb/image_raw': 3, '/rgb/camera_info': 3,
                        '/imu': 2, '/pose': 3}


# --------------------------------------------- bag -> scene converter path

def _pose_matrix(position, rotvec):
    from scipy.spatial.transform import Rotation
    T = np.eye(4)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    T[:3, 3] = position
    return T


def _image_msg(t, data, height, width, encoding=None):
    msg = _Msg()
    msg.header.stamp = _Time(t)
    msg.data = data.tobytes()
    msg.height, msg.width = height, width
    if encoding:
        msg.encoding = encoding
    return msg


def test_convert_to_autolabel_scene_roundtrip(tmp_path):
    """Drive collect_frames + write_scene from a stub bag and verify the
    produced scene dir: frame gating, pose geometry (relative transforms
    survive the OBB re-centering exactly), depth round-trip, contract
    files."""
    from scipy.spatial.transform import Rotation
    cta = _load('convert_to_autolabel_x', 'ops', 'maplab',
                'convert_to_autolabel.py')

    rng = np.random.default_rng(3)
    h, w = 24, 32
    n = 10
    times = np.arange(n) * 0.1

    # Ground-truth camera trajectory: an arc looking roughly at origin.
    T_WCs = []
    for i in range(n):
        angle = 0.15 * i
        position = np.array([2.0 * np.sin(angle), 0.3 * i / n,
                             2.0 * np.cos(angle)])
        T_WCs.append(_pose_matrix(position, [0.05 * i, angle, 0.0]))

    # IMU rig: camera mounted off the body by a fixed T_IC.
    T_IC = _pose_matrix([0.02, -0.01, 0.005], [0.0, 0.0, 0.1])
    sensors = tmp_path / 'sensors.yaml'
    rows = ",\n                 ".join(
        ", ".join(repr(float(v)) for v in row) for row in T_IC)
    sensors.write_text(f"""sensors:
  - sensor_type: NCAMERA
    cameras:
      - camera:
          label: rgb
        T_B_C:
          cols: 4
          rows: 4
          data: [{rows}]
  - sensor_type: IMU
""")

    # Maplab export: T_WI vertices at the frame times plus a tail vertex
    # (collect_frames brackets with [closest, closest+1]).
    vertex_times = np.concatenate([times, [times[-1] + 0.1]])
    vertices = []
    for i, t in enumerate(vertex_times):
        T_WI = (T_WCs[min(i, n - 1)] @ np.linalg.inv(T_IC))
        q = Rotation.from_matrix(T_WI[:3, :3]).as_quat()  # xyzw
        vertices.append([t, *T_WI[:3, 3], *q])
    vertices = np.array(vertices)

    # Bag contents: rgb at each vertex time (+ one far outlier that the
    # 50 ms gate must drop), depth matched by stamp except frame 3.
    records = []
    depth_images = {}
    for i, t in enumerate(times):
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        records.append(('/rgb/image_rect_color',
                        _image_msg(t, rgb, h, w), t))
        if i != 3:
            depth = rng.integers(1500, 2500, (h, w)).astype(np.uint16)
            depth_images[t] = depth
            records.append(('/depth_to_rgb/image_rect',
                            _image_msg(t, depth, h, w, '16UC1'), t))
    records.append(('/rgb/image_rect_color',
                    _image_msg(99.0, np.zeros((h, w, 3), np.uint8), h, w),
                    99.0))
    info = _Msg()
    info.K = np.array([300.0, 0, 16.0, 0, 300.0, 12.0, 0, 0, 1.0])
    records.append(('/rgb/camera_info', info, 0.0))
    bag = _ReadableBag(records)

    timestamps, vertex_rows = vertex_times, vertices
    frames = cta.collect_frames(bag, timestamps, vertex_rows, str(sensors))
    # 10 in-range rgb frames, minus the depth-less frame 3; the t=99
    # outlier fails the 50 ms measurement gate.
    assert len(frames) == n - 1
    kept = [i for i in range(n) if i != 3]

    # Poses interpolate exactly at vertex times: T_CW == inv(T_WC).
    for frame, i in zip(sorted(frames, key=lambda f: f.t_img), kept):
        np.testing.assert_allclose(frame.T_CW, np.linalg.inv(T_WCs[i]),
                                   atol=1e-9)

    out = tmp_path / 'scene'
    cta.write_scene(str(out), frames, cta.get_intrinsics(bag))

    from autolabel_tpu.utils import Scene
    scene = Scene(str(out))
    assert len(scene.poses) == n - 1
    np.testing.assert_allclose(scene.camera.camera_matrix,
                               info.K.reshape(3, 3))
    lo, hi = scene.bbox()
    assert np.all(hi > lo)

    # The OBB re-centering is a single rigid transform: relative camera
    # transforms must survive it exactly.
    for a, b in [(0, 4), (2, 7)]:
        i, j = kept[a], kept[b]
        written = scene.poses[a] @ np.linalg.inv(scene.poses[b])
        original = np.linalg.inv(T_WCs[i]) @ T_WCs[j]
        np.testing.assert_allclose(written, original, atol=1e-8)

    # Depth survives the png round trip bit-exactly.
    import cv2
    depth0 = cv2.imread(scene.depth_paths()[0], -1)
    np.testing.assert_array_equal(depth0, depth_images[times[kept[0]]])


def test_interpolate_to_pose_midpoint():
    cta = _load('convert_to_autolabel_y', 'ops', 'maplab',
                'convert_to_autolabel.py')
    previous = np.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    following = np.array([1.0, 3.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    T_IW = cta.interpolate_to_pose(previous, following, 0.5)
    T_WI = np.linalg.inv(T_IW)
    np.testing.assert_allclose(T_WI[:3, 3], [2.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(T_WI[:3, :3], np.eye(3), atol=1e-12)
