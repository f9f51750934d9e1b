"""Convert a Maplab csv trajectory export + the mapped rosbag into an
autolabel scene directory.

Poses are interpolated to each rgb frame's timestamp (SLERP rotations,
lerp translations), depth frames matched by closest stamp, and the scene
recentered into an OBB-aligned frame with bbox.txt.

Parity: reference ops/maplab/convert_to_autolabel.py (open3d bbox replaced
by the numpy PCA OBB; requires rosbag + yaml at runtime).
"""
from __future__ import print_function

import argparse
import os
import sys

import cv2
import numpy as np
from scipy.spatial.transform import Rotation, Slerp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

from scripts.mapping import oriented_bounding_frame


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--bag',
                        required=True,
                        help="Path to bag file that was mapped.")
    parser.add_argument('--export',
                        default="/tmp/maps/csv_export.csv",
                        help="Path to maplab csv export.")
    parser.add_argument('--out',
                        required=True,
                        help="Where to write the resulting scene.")
    parser.add_argument('--sensors',
                        required=True,
                        help="Maplab sensor config.")
    return parser.parse_args()


def read_csv(filepath):
    array = np.loadtxt(filepath)
    order = np.argsort(array[:, 0])
    array = array[order]
    return array[:, 0], array


class Frame:

    def __init__(self, t_img):
        self.t_img = t_img
        self.t_depth = None
        self.T_CW = None
        self.image = None
        self.depth = None


def interpolate_to_pose(previous, following, t_rgb):
    """SLERP/lerp the two bracketing trajectory vertices to t_rgb; returns
    the world-to-IMU transform T_IW."""
    t_prev = previous[0]
    assert following[0] > previous[0]
    t = (t_rgb - t_prev) / (following[0] - t_prev)
    assert 0.0 <= t <= 1.0
    translation = (1.0 - t) * previous[1:4] + t * following[1:4]
    slerp = Slerp([0.0, 1.0],
                  Rotation.from_quat([previous[4:], following[4:]]))
    T_WI = np.eye(4)
    T_WI[:3, 3] = translation
    T_WI[:3, :3] = slerp(t).as_matrix()
    return np.linalg.inv(T_WI)


def read_camera_extrinsics(sensor_filepath):
    """T_CI (IMU -> camera) from the maplab NCAMERA sensor config."""
    import yaml
    with open(sensor_filepath, 'rt') as f:
        config = yaml.load(f, Loader=yaml.SafeLoader)
    for sensor in config['sensors']:
        if sensor.get('sensor_type') == 'NCAMERA':
            camera = sensor['cameras'][0]['T_B_C']
            T_IC = np.array(camera['data']).reshape(4, 4)
            return np.linalg.inv(T_IC)
    raise ValueError("No NCAMERA sensor in config")


def collect_frames(bag, timestamps, vertices, sensor_filepath,
                   rgb_topic="/rgb/image_rect_color",
                   depth_topic="/depth_to_rgb/image_rect"):
    T_CI = read_camera_extrinsics(sensor_filepath)
    frames = []
    for topic, msg, t in bag.read_messages(topics=rgb_topic):
        t_rgb = msg.header.stamp.to_sec()
        closest = np.abs(timestamps - t_rgb).argmin()
        t_imu = timestamps[closest]
        distance = np.abs(t_rgb - t_imu)
        if distance > 0.05:
            print("Frame at time {} is too far away from a measurement "
                  "with distance of {} seconds.".format(t_rgb, distance))
            continue
        try:
            if t_imu <= t_rgb:
                previous, following = vertices[closest], vertices[closest + 1]
            elif closest == 0:
                continue  # frame precedes the first pose
            else:
                previous, following = vertices[closest - 1], vertices[closest]
        except IndexError:
            continue
        frame = Frame(t_rgb)
        frame.image = msg
        frame.T_CW = T_CI @ interpolate_to_pose(previous, following, t_rgb)
        frames.append(frame)

    frame_times = np.array([f.t_img for f in frames])
    for topic, msg, t in bag.read_messages(topics=depth_topic):
        t_depth = msg.header.stamp.to_sec()
        frame = frames[np.abs(frame_times - t_depth).argmin()]
        if frame.depth is not None:
            print("Found two rgb images to match depth.")
            if (np.abs(frame.t_img - t_depth)
                    > np.abs(frame.t_img - frame.t_depth)):
                continue  # the previously-found depth was a better fit
        frame.depth = msg
        frame.t_depth = t_depth

    without_depth = sum(1 for f in frames if f.depth is None)
    if without_depth:
        print("Skipping {} frames without depth frame.".format(
            without_depth))
    return [f for f in frames if f.depth is not None]


def get_intrinsics(bag):
    for topic, msg, t in bag.read_messages(topics='/rgb/camera_info'):
        return msg


def _backproject(depth, K):
    ys, xs = np.nonzero(depth)
    z = depth[ys, xs].astype(np.float64) / 1000.0
    return np.stack([(xs + 0.5 - K[0, 2]) * z / K[0, 0],
                     (ys + 0.5 - K[1, 2]) * z / K[1, 1], z], axis=-1)


def write_scene(out_dir, frames, intrinsics):
    rgb_out = os.path.join(out_dir, 'rgb')
    depth_out = os.path.join(out_dir, 'depth')
    pose_out = os.path.join(out_dir, 'pose')
    for d in (rgb_out, depth_out, pose_out):
        os.makedirs(d, exist_ok=True)

    K = np.array(intrinsics.K).reshape(3, 3)
    np.savetxt(os.path.join(out_dir, 'intrinsics.txt'), K)

    frames = sorted(frames, key=lambda f: f.t_img)
    points = []
    for i, frame in enumerate(frames):
        rgb = np.frombuffer(frame.image.data, dtype=np.uint8).reshape(
            frame.image.height, frame.image.width, -1)
        assert frame.depth.encoding == '16UC1'
        depth = np.frombuffer(frame.depth.data, dtype=np.uint16).reshape(
            frame.depth.height, frame.depth.width)
        if i % 5 == 0:
            pc_C = _backproject(depth, K)
            T_WC = np.linalg.inv(frame.T_CW)
            points.append((pc_C @ T_WC[:3, :3].T + T_WC[:3, 3])[::50])
        frame_name = "{i:05}".format(i=i)
        cv2.imwrite(os.path.join(rgb_out, frame_name + '.jpg'), rgb)
        cv2.imwrite(os.path.join(depth_out, frame_name + '.png'), depth)

    points = np.concatenate(points)
    lo = np.percentile(points, 0.5, axis=0)
    hi = np.percentile(points, 99.5, axis=0)
    keep = np.all((points >= lo) & (points <= hi), axis=1)
    T, bounds = oriented_bounding_frame(points[keep])

    for i, frame in enumerate(frames):
        frame_name = "{i:05}".format(i=i)
        # Re-express the pose in the OBB-aligned recentered frame.
        T_WC = T @ np.linalg.inv(frame.T_CW)
        np.savetxt(os.path.join(pose_out, frame_name + '.txt'),
                   np.linalg.inv(T_WC))

    with open(os.path.join(out_dir, 'bbox.txt'), 'wt') as f:
        min_str = " ".join(str(x) for x in bounds[0])
        max_str = " ".join(str(x) for x in bounds[1])
        f.write("{} {} 0.01".format(min_str, max_str))


def main():
    flags = read_args()
    import rosbag
    timestamps, vertices = read_csv(flags.export)
    bag = rosbag.Bag(flags.bag, 'r')
    frames = collect_frames(bag, timestamps, vertices, flags.sensors)
    intrinsics = get_intrinsics(bag)
    write_scene(flags.out, frames, intrinsics)
    print("Done")


if __name__ == "__main__":
    main()
