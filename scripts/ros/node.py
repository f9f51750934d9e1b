"""Online incremental mapping ROS node.

Subscribes to /slam/{rgb,depth,keyframe,camera_info,odometry}, matches the
streams by timestamp, extracts LSeg features per keyframe, feeds them into
a DynamicDataset, and trains the field in 100-iteration bursts on a
background thread while publishing /autolabel/{image,features,depth}
previews at the current odometry pose.

CLI parity: reference scripts/ros/node.py (its dangling
autolabel.utils.ros_utils import is implemented here for real).
Requires rospy/cv_bridge/tf (ROS 1).
"""
import argparse
import os
import sys
import threading
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import rospy
import tf
from cv_bridge import CvBridge
from geometry_msgs.msg import PoseStamped
from sensor_msgs.msg import CameraInfo, Image
from std_msgs.msg import String
from std_srvs.srv import Empty

from autolabel_tpu import model_utils, visualization
from autolabel_tpu.constants import COLORS
from autolabel_tpu.core.dataset import DynamicDataset
from autolabel_tpu.core.rays import compute_directions
from autolabel_tpu.features.feature_utils import get_feature_extractor
from autolabel_tpu.render.renderer import RenderOptions
from autolabel_tpu.train.losses import LossOptions
from autolabel_tpu.train.trainer import SimpleTrainer
from autolabel_tpu.utils import Camera, ros_utils

RENDER_INTRINSICS = (205.0, 205.0, 128.0, 96.0)  # fx fy cx cy @ 256x192


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--features', type=str, default='lseg')
    parser.add_argument('--checkpoint',
                        type=str,
                        default=None,
                        help='path to feature model checkpoint')
    parser.add_argument('--allow-fallback', action='store_true',
                        help="Permit stand-in features when teacher "
                        "weights are unavailable (testing only).")
    parser.add_argument(
        '--log',
        default=None,
        type=str,
        help="Save incoming images to this directory in the autolabel "
        "format for debugging.")
    parser.add_argument(
        '--bound',
        '-b',
        type=float,
        default=2.5,
        help="The size of bounding volume of the scene. Range will be from "
        "-bound to bound in x, y and z.")
    return parser.parse_args()


class Frame:

    def __init__(self, num, T_CW, image, depth, features):
        self.num = num
        self.T_CW = T_CW
        self.image = image
        self.depth = depth
        self.features = features


class Bridge:
    """ROS <-> numpy conversions + live open-vocab preview coloring."""

    def __init__(self, features, checkpoint, allow_fallback=False):
        self.tf_listener = tf.TransformListener()
        self.bridge = CvBridge()
        self.feature_extractor = get_feature_extractor(
            features, checkpoint, allow_fallback=allow_fallback)
        self.set_prompts(["background", "other"])

    def set_prompts(self, prompts):
        self.prompt_features = np.asarray(
            self.feature_extractor.encode_text(list(prompts)))

    def depth_to_array(self, depth_msg):
        return self.bridge.imgmsg_to_cv2(depth_msg, 'mono16')

    def color_to_array(self, image_msg):
        return self.bridge.imgmsg_to_cv2(image_msg, 'rgb8')

    def features(self, image_array):
        """H x W x 3 rgb -> H_o x W_o x D unit-norm teacher features."""
        image = np.transpose(image_array / 255.0, [2, 0, 1])[None]
        features = np.asarray(self.feature_extractor(image))[0]
        norms = np.linalg.norm(features, axis=-1, keepdims=True)
        return features / np.maximum(norms, 1e-9)

    def image_to_message(self, array):
        msg = self.bridge.cv2_to_imgmsg(array, encoding='rgb8')
        msg.header.stamp = rospy.Time.now()
        return msg

    def features_to_message(self, feature_map):
        class_map = self._feature_similarity(feature_map)
        seg_map = (COLORS[class_map % len(COLORS)] * 255).astype(np.uint8)
        msg = self.bridge.cv2_to_imgmsg(seg_map, encoding='rgb8')
        msg.header.stamp = rospy.Time.now()
        return msg

    def _feature_similarity(self, feature_map):
        norms = np.linalg.norm(feature_map, axis=-1, keepdims=True)
        feature_map = feature_map / np.maximum(norms, 1e-9)
        text = self.prompt_features[:, :feature_map.shape[-1]]
        similarities = feature_map @ text.T
        return similarities.argmax(axis=-1)


class TrainingLoop:
    """Background thread: 100-iteration training bursts interleaved with
    256x192 preview renders at the latest odometry pose."""

    def __init__(self, bridge, bound):
        self.bridge = bridge
        min_bounds = np.array([-bound] * 3)
        max_bounds = np.array([bound] * 3)

        class _Opt:
            encoding = 'hg+freq'
            geometric_features = 15
            feature_dim = 512
            features = 'lseg'

        self.field = model_utils.create_model(min_bounds, max_bounds, 2,
                                              _Opt())
        loss_options = LossOptions(rgb_weight=1.0,
                                   depth_weight=0.025,
                                   semantic_weight=0.0,
                                   feature_weight=0.5,
                                   feature_loss=True)
        self.trainer = SimpleTrainer(
            'ngp',
            self.field,
            lr=1e-2,
            iters=None,  # constant lr online
            loss_options=loss_options,
            render_options=RenderOptions(num_steps=128, perturb=True),
            workspace=None,
            ema_decay=0.95,
            max_ray_batch=2048)
        self.dataset = None
        self.initialized = False
        self.training = True
        self.done = False
        self.render_resolution = (256, 192)
        self.pixel_indices = np.arange(self.render_resolution[0] *
                                       self.render_resolution[1])
        self.odometry_pose = None
        self.image_pub = rospy.Publisher('/autolabel/image', Image,
                                         queue_size=1)
        self.feature_pub = rospy.Publisher('/autolabel/features', Image,
                                           queue_size=1)
        self.depth_pub = rospy.Publisher('/autolabel/depth', Image,
                                         queue_size=1)
        self.training_thread = threading.Thread(target=self.train)
        self.training_thread.start()

    def set_camera(self, msg):
        if self.dataset is None:
            K = np.array(msg.K).reshape(3, 3)
            camera = Camera(K, (msg.width, msg.height))
            self.dataset = DynamicDataset(2048, camera, capacity=325)

    def train(self):
        while True:
            if self.done:
                print("Closing training loop")
                return 0
            if self.initialized:
                if self.training and len(self.dataset) > 5:
                    print(f"Fitting with {len(self.dataset)} images")
                    self.trainer.train_iterations(self.dataset, 100)
                if self.odometry_pose is not None:
                    self.render_frame()
            else:
                time.sleep(0.05)

    def render_frame(self):
        T_CW = self.odometry_pose
        resolution = self.render_resolution
        T_WC = self.dataset._convert_pose(T_CW)
        origins = np.broadcast_to(
            T_WC[:3, 3],
            (resolution[1], resolution[0], 3)).astype(np.float32)
        fx, fy, cx, cy = RENDER_INTRINSICS
        directions, norms = compute_directions(
            np.ascontiguousarray(T_WC[:3, :3]), self.pixel_indices,
            resolution[0], fx, fy, cx, cy)
        batch = {
            'rays_o': origins,
            'rays_d': directions.reshape(resolution[1], resolution[0], 3),
            'direction_norms': norms,
        }
        import jax
        # The staged renderer returns device arrays (chunks concatenate
        # on device); fetch the finished frame once for cv_bridge.
        outputs = jax.device_get(self.trainer._staged.render(
            self.trainer.state['params'], batch['rays_o'], batch['rays_d'],
            norms.reshape(resolution[1], resolution[0])))
        image = (np.clip(outputs['image'], 0, 1) * 255).astype(np.uint8)
        self.image_pub.publish(self.bridge.image_to_message(image))
        self.feature_pub.publish(
            self.bridge.features_to_message(outputs['semantic_features']))
        depth_frame = visualization.visualize_depth(outputs['depth'],
                                                    maxdepth=10.0)
        self.depth_pub.publish(self.bridge.image_to_message(depth_frame))

    def add_frame(self, frame):
        if self.dataset is None:
            return
        self.dataset.add_frame(frame.T_CW, frame.image, frame.depth,
                               frame.features)
        self.initialized = True

    def stop(self):
        self.training = False
        self.done = True
        self.training_thread.join()
        if self.dataset is not None:
            self.dataset.stop()


class AutolabelNode:
    """Wires the SLAM topics into the training loop.

    Stream synchronization lives in ros_utils.SynchronizedStreams (the
    rgb/depth/keyframe triple-match, testable without rospy); this class
    only subscribes, converts and forwards.
    """

    SYNC_THRESHOLD = 1.0 / 60.0

    def __init__(self, flags):
        self.reading = True
        self.bridge = Bridge(flags.features, flags.checkpoint,
                             allow_fallback=flags.allow_fallback)
        self.training_loop = TrainingLoop(self.bridge, flags.bound)
        self.streams = ros_utils.SynchronizedStreams(
            ('rgb', 'depth', 'pose'), self.SYNC_THRESHOLD, max_size=10)
        self.subscribers = {
            name: rospy.Subscriber(f'/slam/{topic}', Image,
                                   self._stream_callback(name),
                                   queue_size=20)
            for name, topic in (('rgb', 'rgb'), ('depth', 'depth'))
        }
        self.subscribers['pose'] = rospy.Subscriber(
            '/slam/keyframe', PoseStamped, self._stream_callback('pose'),
            queue_size=20)
        self.odometry_sub = rospy.Subscriber(
            '/slam/odometry', PoseStamped, lambda msg: setattr(
                self.training_loop, 'odometry_pose',
                ros_utils.pose_matrix(msg)))
        self.camera_info_sub = rospy.Subscriber('/slam/camera_info',
                                                CameraInfo,
                                                self.camera_info_callback)
        self.prompt_sub = rospy.Subscriber(
            '/autolabel/segmentation_classes', String, lambda msg: self.
            bridge.set_prompts(str(msg.data).split("|")))
        self.services = [
            rospy.Service('/autolabel/train', Empty, self.toggle_training),
            rospy.Service('/autolabel/pause', Empty, self.toggle_reading),
        ]
        self.debug_log = flags.log
        if self.debug_log is not None:
            for sub in ('rgb', 'depth', 'pose'):
                os.makedirs(os.path.join(self.debug_log, sub), exist_ok=True)

    def toggle_training(self, req):
        self.training_loop.training = not self.training_loop.training
        print("toggled training")
        return []

    def toggle_reading(self, req):
        self.reading = not self.reading
        print(f"Accepting new images: {self.reading}")
        return []

    def _stream_callback(self, name):

        def callback(msg):
            if not self.reading:
                return
            matched = self.streams.offer(name, msg)
            if matched is not None:
                self._ingest(matched)

        return callback

    def _ingest(self, matched):
        image_msg, depth_msg = matched['rgb'], matched['depth']
        if np.abs(depth_msg.header.stamp.to_sec() -
                  image_msg.header.stamp.to_sec()) > self.SYNC_THRESHOLD:
            print("WARNING depth and rgb might not be synchronized")
        image = self.bridge.color_to_array(image_msg)
        frame = Frame(image_msg.header.seq,
                      ros_utils.pose_matrix(matched['pose']), image,
                      self.bridge.depth_to_array(depth_msg),
                      self.bridge.features(image))
        self.training_loop.add_frame(frame)
        if self.debug_log is not None:
            self._debug_log_frame(frame)

    def _debug_log_frame(self, frame):
        filename = f"{frame.num:06d}"
        cv2.imwrite(os.path.join(self.debug_log, 'rgb', f"{filename}.jpg"),
                    cv2.cvtColor(frame.image, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(self.debug_log, 'depth', f"{filename}.png"),
                    frame.depth)
        np.savetxt(os.path.join(self.debug_log, 'pose', f"{filename}.txt"),
                   frame.T_CW)

    def camera_info_callback(self, msg):
        self.training_loop.set_camera(msg)
        self.camera_info_sub.unregister()

    def run(self):
        rospy.spin()

    def stop(self):
        self.training_loop.stop()


if __name__ == "__main__":
    flags = read_args()
    rospy.init_node("autolabel")
    try:
        node = AutolabelNode(flags)
        node.run()
    finally:
        node.stop()
