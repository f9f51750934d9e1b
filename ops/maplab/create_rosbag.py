"""Pack a Stray-Scanner-style capture (rgb.mp4 + odometry.csv + imu.csv +
camera_matrix.csv) into a rosbag for the Rovioli/Maplab pipeline.

Parity: reference ops/maplab/create_rosbag.py (skvideo replaced by
cv2.VideoCapture). Requires rosbag/rospy/cv_bridge + maplab_msgs.
"""
from __future__ import print_function

import argparse
import os

import cv2
import numpy as np
from scipy.spatial.transform import Rotation


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--out', default='bag.bag', type=str)
    parser.add_argument('--compressed', action='store_true')
    return parser.parse_args()


def read_data(scene):
    intrinsics = np.loadtxt(os.path.join(scene, 'camera_matrix.csv'),
                            delimiter=',')
    odometry = np.loadtxt(os.path.join(scene, 'odometry.csv'),
                          delimiter=',', skiprows=1)
    imu = np.loadtxt(os.path.join(scene, 'imu.csv'), delimiter=',',
                     skiprows=1)
    return {'intrinsics': intrinsics, 'odometry': odometry, 'imu': imu}


def create_pose(t, q):
    T_WC = np.eye(4)
    T_WC[:3, :3] = Rotation.from_quat(q).as_matrix()
    T_WC[:3, 3] = t
    return T_WC


def main():
    import rosbag
    import rospy
    from cv_bridge import CvBridge
    from maplab_msgs.msg import OdometryWithImuBiases
    from sensor_msgs.msg import CameraInfo, Imu

    def camera_info_msg(image, timestamp, intrinsics):
        msg = CameraInfo()
        msg.header.stamp = timestamp
        msg.header.frame_id = 'rgb_optical'
        msg.height = image.shape[0]
        msg.width = image.shape[1]
        msg.distortion_model = 'plumb_bob'
        msg.K = intrinsics.ravel().tolist()
        return msg

    flags = read_args()
    bag = rosbag.Bag(flags.out, 'w')
    data = read_data(flags.scene)
    cv_bridge = CvBridge()

    rgb_topic = '/rgb/image_raw'
    rgb_camera_info_topic = '/rgb/camera_info'
    imu_topic = '/imu'
    pose_topic = '/pose'

    # odometry rows: timestamp, frame, x, y, z, qx, qy, qz, qw
    odometry = data['odometry']
    timestamps = odometry[:, 0]
    # imu rows: timestamp, a_x, a_y, a_z, alpha_x, alpha_y, alpha_z
    imu = data['imu']

    video = cv2.VideoCapture(os.path.join(flags.scene, 'rgb.mp4'))
    try:
        for i, seconds in enumerate(timestamps):
            ok, image = video.read()
            if not ok:
                break
            if flags.compressed:
                msg = cv_bridge.cv2_to_compressed_imgmsg(image)
            else:
                msg = cv_bridge.cv2_to_imgmsg(image)
            print('Writing image {i} timestamp {seconds:.02f}'.format(
                i=i, seconds=seconds), end='\r')
            ts = rospy.Time(seconds)
            msg.header.stamp = ts
            msg.header.seq = i
            msg.header.frame_id = 'rgb_optical'
            bag.write(rgb_topic, msg, t=ts)
            bag.write(rgb_camera_info_topic,
                      camera_info_msg(image, ts, data['intrinsics']), t=ts)

        for i, reading in enumerate(imu):
            seconds = reading[0]
            msg = Imu()
            ts = rospy.Time(seconds)
            msg.header.stamp = ts
            msg.header.seq = i
            msg.header.frame_id = 'imu_frame'
            msg.linear_acceleration.x = reading[1]
            msg.linear_acceleration.y = reading[2]
            msg.linear_acceleration.z = reading[3]
            msg.angular_velocity.x = reading[4]
            msg.angular_velocity.y = reading[5]
            msg.angular_velocity.z = reading[6]
            bag.write(imu_topic, msg, t=ts)

        for i, reading in enumerate(odometry):
            ts = rospy.Time(reading[0])
            msg = OdometryWithImuBiases()
            msg.header.stamp = ts
            msg.header.seq = i
            msg.header.frame_id = 'map'
            msg.child_frame_id = 'rgb_optical'
            T_WC = create_pose(reading[2:5], reading[5:])
            translation = T_WC[:3, 3]
            orn = Rotation.from_matrix(T_WC[:3, :3]).as_quat()
            msg.pose.pose.position.x = translation[0]
            msg.pose.pose.position.y = translation[1]
            msg.pose.pose.position.z = translation[2]
            msg.pose.pose.orientation.x = orn[0]
            msg.pose.pose.orientation.y = orn[1]
            msg.pose.pose.orientation.z = orn[2]
            msg.pose.pose.orientation.w = orn[3]
            bag.write(pose_topic, msg, t=ts)
    finally:
        video.release()
        bag.close()


if __name__ == "__main__":
    main()
