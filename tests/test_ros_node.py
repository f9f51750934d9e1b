"""Functional drive of scripts/ros/node.py under a working rospy stand-in.

The round-2 coverage was import-only; these tests actually EXECUTE the
node: messages flow through real subscriber callbacks into the stream
matcher, Bridge conversions and TrainingLoop; the training thread runs
real 100-iteration bursts on a tiny field and publishes rendered
previews. Only the ROS transport itself is stubbed (no rospy here).

Reference behavior: scripts/ros/node.py (subscribe /slam/*, triple-match
by stamp, LSeg features per keyframe, background train thread, publish
/autolabel/{image,features,depth} at the odometry pose).
"""
import importlib
import os
import sys
import time
import types

import numpy as np
import pytest

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'scripts'))


class _Registry:

    def __init__(self):
        self.subs = {}
        self.pubs = {}
        self.services = {}


def _ros_mocks(registry):
    """Functional stand-ins for the ROS modules node.py imports."""
    rospy = types.ModuleType('rospy')

    class Subscriber:
        def __init__(self, topic, msg_type, callback, queue_size=None):
            self.topic = topic
            registry.subs[topic] = callback

        def unregister(self):
            registry.subs.pop(self.topic, None)

    class Publisher:
        def __init__(self, topic, msg_type, queue_size=None):
            self.msgs = registry.pubs.setdefault(topic, [])

        def publish(self, msg):
            self.msgs.append(msg)

    class Service:
        def __init__(self, name, srv, handler):
            registry.services[name] = handler

    class _Now:
        @staticmethod
        def to_sec():
            return 0.0

    rospy.Subscriber = Subscriber
    rospy.Publisher = Publisher
    rospy.Service = Service
    rospy.Time = types.SimpleNamespace(now=lambda: _Now())
    rospy.spin = lambda: None

    tf = types.ModuleType('tf')
    tf.TransformListener = lambda: None

    cv_bridge = types.ModuleType('cv_bridge')

    class CvBridge:
        def imgmsg_to_cv2(self, msg, encoding=None):
            return msg.array

        def cv2_to_imgmsg(self, array, encoding=None):
            return types.SimpleNamespace(
                array=array, header=types.SimpleNamespace(stamp=None))

    cv_bridge.CvBridge = CvBridge

    def _msg_module(name, *classes):
        mod = types.ModuleType(name)
        for cls in classes:
            setattr(mod, cls, type(cls, (), {}))
        return mod

    return {
        'rospy': rospy,
        'tf': tf,
        'cv_bridge': cv_bridge,
        'geometry_msgs': types.ModuleType('geometry_msgs'),
        'geometry_msgs.msg': _msg_module('geometry_msgs.msg',
                                         'PoseStamped'),
        'sensor_msgs': types.ModuleType('sensor_msgs'),
        'sensor_msgs.msg': _msg_module('sensor_msgs.msg', 'Image',
                                       'CameraInfo'),
        'std_msgs': types.ModuleType('std_msgs'),
        'std_msgs.msg': _msg_module('std_msgs.msg', 'String'),
        'std_srvs': types.ModuleType('std_srvs'),
        'std_srvs.srv': _msg_module('std_srvs.srv', 'Empty'),
    }


@pytest.fixture
def ros_node(monkeypatch):
    registry = _Registry()
    for name, mod in _ros_mocks(registry).items():
        monkeypatch.setitem(sys.modules, name, mod)
    sys.modules.pop('ros.node', None)
    node_mod = importlib.import_module('ros.node')
    yield registry, node_mod
    sys.modules.pop('ros.node', None)


def _stamped(t, seq=0):
    return types.SimpleNamespace(
        stamp=types.SimpleNamespace(to_sec=lambda: t), seq=seq)


def _image_msg(t, array, seq=0):
    return types.SimpleNamespace(header=_stamped(t, seq), array=array)


def _pose_msg(t, position, quat=(0.0, 0.0, 0.0, 1.0)):
    return types.SimpleNamespace(
        header=_stamped(t),
        pose=types.SimpleNamespace(
            position=types.SimpleNamespace(x=position[0], y=position[1],
                                           z=position[2]),
            orientation=types.SimpleNamespace(x=quat[0], y=quat[1],
                                              z=quat[2], w=quat[3])))


def test_node_wiring_end_to_end(ros_node, monkeypatch, tmp_path):
    """Messages through the real callbacks: camera info arms the dataset,
    synchronized rgb/depth/keyframe triples become Frames (converted
    pose + fallback LSeg features), out-of-sync frames are dropped,
    prompt and service topics act."""
    registry, node_mod = ros_node

    class SpyLoop:
        def __init__(self, bridge, bound):
            self.bridge = bridge
            self.bound = bound
            self.frames = []
            self.cameras = []
            self.training = True
            self.odometry_pose = None

        def set_camera(self, msg):
            self.cameras.append(msg)

        def add_frame(self, frame):
            self.frames.append(frame)

        def stop(self):
            pass

    monkeypatch.setattr(node_mod, 'TrainingLoop', SpyLoop)
    log_dir = str(tmp_path / 'log')
    flags = types.SimpleNamespace(features='lseg', checkpoint=None,
                                  allow_fallback=True, log=log_dir,
                                  bound=2.5)
    node = node_mod.AutolabelNode(flags)
    loop = node.training_loop

    # Camera info arms the dataset once, then unsubscribes.
    info = types.SimpleNamespace(
        K=[100.0, 0, 16.0, 0, 100.0, 12.0, 0, 0, 1.0], width=32, height=24)
    registry.subs['/slam/camera_info'](info)
    assert loop.cameras == [info]
    assert '/slam/camera_info' not in registry.subs

    # A synchronized rgb/depth/keyframe triple produces one frame.
    rgb = np.random.default_rng(0).integers(0, 255, (24, 32, 3),
                                            dtype=np.uint8)
    depth = np.full((24, 32), 2000, np.uint16)
    registry.subs['/slam/rgb'](_image_msg(1.000, rgb, seq=7))
    registry.subs['/slam/depth'](_image_msg(1.004, depth))
    assert loop.frames == []  # no keyframe pose yet
    registry.subs['/slam/keyframe'](_pose_msg(1.008, (1.0, 2.0, 3.0)))
    assert len(loop.frames) == 1
    frame = loop.frames[0]
    assert frame.num == 7
    np.testing.assert_array_equal(frame.image, rgb)
    np.testing.assert_array_equal(frame.depth, depth)
    # Identity orientation: T_CW = inv(T_WC) has the negated translation.
    np.testing.assert_allclose(frame.T_CW[:3, 3], [-1.0, -2.0, -3.0])
    out_dim = node.bridge.feature_extractor.out_dim
    assert frame.features.shape[-1] == out_dim
    assert np.isfinite(frame.features).all()
    # Debug logging wrote the frame in the scene contract.
    assert os.path.exists(os.path.join(log_dir, 'rgb', '000007.jpg'))
    assert os.path.exists(os.path.join(log_dir, 'pose', '000007.txt'))

    # Out-of-sync streams never match (> 1/60 s apart).
    registry.subs['/slam/rgb'](_image_msg(2.0, rgb))
    registry.subs['/slam/depth'](_image_msg(2.5, depth))
    registry.subs['/slam/keyframe'](_pose_msg(3.0, (0.0, 0.0, 0.0)))
    assert len(loop.frames) == 1

    # Odometry updates the render pose (world->camera).
    registry.subs['/slam/odometry'](_pose_msg(2.0, (0.0, 0.0, 1.0)))
    np.testing.assert_allclose(loop.odometry_pose[:3, 3], [0.0, 0.0, -1.0])

    # Prompt topic re-encodes the open-vocab classes.
    registry.subs['/autolabel/segmentation_classes'](
        types.SimpleNamespace(data='wall|red ball|floor'))
    assert node.bridge.prompt_features.shape[0] == 3

    # Services toggle training and ingestion.
    registry.services['/autolabel/train'](None)
    assert loop.training is False
    registry.services['/autolabel/pause'](None)
    registry.subs['/slam/rgb'](_image_msg(4.0, rgb))
    registry.subs['/slam/depth'](_image_msg(4.0, depth))
    registry.subs['/slam/keyframe'](_pose_msg(4.0, (0.0, 0.0, 0.0)))
    assert len(loop.frames) == 1  # reading paused


def test_training_loop_trains_and_publishes(ros_node, monkeypatch):
    """The real TrainingLoop on a tiny field: add keyframes, run a
    training burst on the background thread, render at the odometry pose
    and publish image/features/depth previews."""
    registry, node_mod = ros_node

    from autolabel_tpu import model_utils
    from autolabel_tpu.models.field import Field, FieldConfig
    from autolabel_tpu.ops.encoders import HashGridConfig

    feature_dim = 16

    def tiny_create(min_bounds, max_bounds, n_classes, opt):
        bound = model_utils.compute_bound(min_bounds, max_bounds)
        return Field(FieldConfig(
            encoding='hg+freq', hidden_dim=32, hidden_dim_color=32,
            hidden_dim_semantic=feature_dim, semantic_classes=n_classes,
            bound=bound,
            grid=HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                per_level_scale=1.6)))

    monkeypatch.setattr(node_mod.model_utils, 'create_model', tiny_create)
    real_options = node_mod.RenderOptions
    monkeypatch.setattr(
        node_mod, 'RenderOptions',
        lambda **kw: real_options(**{**kw, 'num_steps': 16}))
    w, h = 32, 24
    monkeypatch.setattr(node_mod, 'RENDER_INTRINSICS',
                        (20.0, 20.0, w / 2, h / 2))

    class StubBridge:
        def image_to_message(self, array):
            return array

        def features_to_message(self, feature_map):
            return feature_map

    loop = node_mod.TrainingLoop(StubBridge(), 1.5)
    try:
        loop.render_resolution = (w, h)
        loop.pixel_indices = np.arange(w * h)
        loop.set_camera(types.SimpleNamespace(
            K=[20.0, 0, w / 2, 0, 20.0, h / 2, 0, 0, 1.0],
            width=w, height=h))

        rng = np.random.default_rng(1)
        for i in range(6):
            T_CW = np.eye(4)
            T_CW[:3, 3] = [0.01 * i, 0.0, -1.0]
            image = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            depth = rng.integers(900, 1100, (h, w)).astype(np.uint16)
            features = rng.normal(size=(h // 8, w // 8,
                                        feature_dim)).astype(np.float32)
            loop.add_frame(node_mod.Frame(i, T_CW, image, depth, features))
        loop.odometry_pose = np.eye(4)

        deadline = time.time() + 240
        topics = ('/autolabel/image', '/autolabel/features',
                  '/autolabel/depth')
        while time.time() < deadline:
            if all(registry.pubs.get(t) for t in topics):
                break
            time.sleep(0.5)
        else:
            pytest.fail("training loop never published previews")
    finally:
        loop.stop()

    image = registry.pubs['/autolabel/image'][0]
    assert image.shape == (h, w, 3) and image.dtype == np.uint8
    depth = registry.pubs['/autolabel/depth'][0]
    assert depth.shape == (h, w, 3)
    features = registry.pubs['/autolabel/features'][0]
    assert features.shape == (h, w, feature_dim)
    assert np.isfinite(np.asarray(features)).all()
    # The burst actually trained: steps advanced past warm-up.
    assert loop.trainer.global_step >= 100
