"""Pack a Stray-Scanner-style capture (rgb.mp4 + odometry.csv + imu.csv +
camera_matrix.csv) into a rosbag for the Rovioli/Maplab pipeline.

Same artifact contract as the reference tool (ops/maplab/
create_rosbag.py: topics /rgb/image_raw, /rgb/camera_info, /imu, /pose;
maplab_msgs OdometryWithImuBiases poses), restructured as pure message
builders over a capture reader plus a time-ordered stream merge — the
bag comes out globally sorted by timestamp (rosbag tooling prefers
chronological bags; the reference writes the three streams
back-to-back), and everything up to the final `bag.write` is testable
without ROS installed (tests stub the ros modules).
"""
from __future__ import print_function

import argparse
import heapq
import os

import numpy as np


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--out', default='bag.bag', type=str)
    parser.add_argument('--compressed', action='store_true')
    return parser.parse_args()


class StrayCapture:
    """Reader for a Stray Scanner capture directory.

    odometry.csv rows: timestamp, frame, x, y, z, qx, qy, qz, qw
    imu.csv rows:      timestamp, a_xyz (3), omega_xyz (3)
    """

    def __init__(self, scene):
        self.scene = scene
        self.intrinsics = np.loadtxt(
            os.path.join(scene, 'camera_matrix.csv'), delimiter=',')
        self.odometry = np.loadtxt(os.path.join(scene, 'odometry.csv'),
                                   delimiter=',', skiprows=1)
        self.imu = np.loadtxt(os.path.join(scene, 'imu.csv'), delimiter=',',
                              skiprows=1)

    def frames(self):
        """Yield (timestamp_seconds, bgr_image) per video frame, matched
        to odometry rows in order."""
        import cv2
        video = cv2.VideoCapture(os.path.join(self.scene, 'rgb.mp4'))
        try:
            for seconds in self.odometry[:, 0]:
                ok, image = video.read()
                if not ok:
                    return
                yield float(seconds), image
        finally:
            video.release()


def _camera_info(ros, stamp, seq, shape, intrinsics):
    msg = ros['CameraInfo']()
    _stamp(msg, ros, stamp, seq, 'rgb_optical')
    msg.height, msg.width = shape[0], shape[1]
    msg.distortion_model = 'plumb_bob'
    msg.K = np.asarray(intrinsics).ravel().tolist()
    return msg


def _imu_msg(ros, stamp, seq, reading):
    msg = ros['Imu']()
    _stamp(msg, ros, stamp, seq, 'imu_frame')
    for field, value in zip(('x', 'y', 'z'), reading[1:4]):
        setattr(msg.linear_acceleration, field, value)
    for field, value in zip(('x', 'y', 'z'), reading[4:7]):
        setattr(msg.angular_velocity, field, value)
    return msg


def _pose_msg(ros, stamp, seq, row):
    """maplab OdometryWithImuBiases from an odometry row (position +
    xyzw quaternion, both already in the map frame)."""
    msg = ros['OdometryWithImuBiases']()
    _stamp(msg, ros, stamp, seq, 'map')
    msg.child_frame_id = 'rgb_optical'
    for field, value in zip(('x', 'y', 'z'), row[2:5]):
        setattr(msg.pose.pose.position, field, value)
    for field, value in zip(('x', 'y', 'z', 'w'), row[5:9]):
        setattr(msg.pose.pose.orientation, field, value)
    return msg


def _stamp(msg, ros, stamp, seq, frame_id):
    msg.header.stamp = stamp
    msg.header.seq = seq
    msg.header.frame_id = frame_id


def build_messages(capture, ros, compressed=False):
    """Yield (topic, message, ros.Time) across all streams, merged into
    global timestamp order."""
    time = ros['Time']

    def image_stream():
        bridge = ros['CvBridge']()
        convert = (bridge.cv2_to_compressed_imgmsg if compressed else
                   bridge.cv2_to_imgmsg)
        for seq, (seconds, image) in enumerate(capture.frames()):
            stamp = time(seconds)
            msg = convert(image)
            _stamp(msg, ros, stamp, seq, 'rgb_optical')
            yield seconds, ('/rgb/image_raw', msg, stamp)
            yield seconds, ('/rgb/camera_info',
                            _camera_info(ros, stamp, seq, image.shape,
                                         capture.intrinsics), stamp)

    def imu_stream():
        for seq, reading in enumerate(capture.imu):
            stamp = time(float(reading[0]))
            yield float(reading[0]), ('/imu',
                                      _imu_msg(ros, stamp, seq, reading),
                                      stamp)

    def pose_stream():
        for seq, row in enumerate(capture.odometry):
            stamp = time(float(row[0]))
            yield float(row[0]), ('/pose', _pose_msg(ros, stamp, seq, row),
                                  stamp)

    for _, item in heapq.merge(image_stream(), imu_stream(), pose_stream(),
                               key=lambda pair: pair[0]):
        yield item


def import_ros_modules():
    import rospy
    from cv_bridge import CvBridge
    from maplab_msgs.msg import OdometryWithImuBiases
    from sensor_msgs.msg import CameraInfo, Imu
    return {'Time': rospy.Time, 'CvBridge': CvBridge,
            'OdometryWithImuBiases': OdometryWithImuBiases,
            'CameraInfo': CameraInfo, 'Imu': Imu}


def write_bag(out_path, capture, ros, compressed=False):
    import rosbag
    bag = rosbag.Bag(out_path, 'w')
    try:
        for count, (topic, msg, stamp) in enumerate(
                build_messages(capture, ros, compressed=compressed)):
            bag.write(topic, msg, t=stamp)
            if count % 100 == 0:
                print('Writing message {c} t={t:.02f}'.format(
                    c=count, t=msg.header.stamp.to_sec()), end='\r')
    finally:
        bag.close()


def main():
    flags = read_args()
    write_bag(flags.out, StrayCapture(flags.scene), import_ros_modules(),
              compressed=flags.compressed)


if __name__ == "__main__":
    main()
