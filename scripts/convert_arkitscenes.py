description = """
This script converts scenes from the ARKitScenes dataset
(https://github.com/apple/ARKitScenes) format to the format used by
autolabel.

Usage:
    python scripts/convert_arkitscenes.py <arkit-scenes-dir> --out <out-dir>

After running this script, scripts/compute_scene_bounds.py needs to be run
to compute the scene bounding box.

Uses the lowres_wide, lowres_depth, lowres_wide.traj, confidence and
lowres_wide_intrinsics assets (see ARKitScenes DATA.md). Poses are matched
to rgb frames by nearest trajectory timestamp within one frame interval.
"""
import argparse
import os
from argparse import RawTextHelpFormatter

import cv2
import numpy as np
from scipy.spatial.transform import Rotation

# CLI parity: reference scripts/convert_arkitscenes.py.


def read_args():
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=RawTextHelpFormatter)
    parser.add_argument('arkit_scenes')
    parser.add_argument('--out')
    return parser.parse_args()


def collect_images(dir_path):
    return {
        filename.replace('.png', ''): os.path.join(dir_path, filename)
        for filename in os.listdir(dir_path)
    }


def read_intrinsics(dir_path):
    intrinsic_path = os.path.join(dir_path, os.listdir(dir_path)[0])
    _, _, fx, fy, cx, cy = np.loadtxt(intrinsic_path)
    C = np.eye(3)
    C[0, 0] = fx
    C[1, 1] = fy
    C[0, 2] = cx
    C[1, 2] = cy
    return C


def to_ts(filename):
    # Names look like <video_id>_<seconds>.<milliseconds>
    _, ts = filename.split('_')
    seconds, ms = (int(v) for v in ts.split('.'))
    return seconds + ms * 1e-3


def find_pose(trajectory, rgb_name):
    timestamp = to_ts(rgb_name)
    errors = np.abs(trajectory[:, 0] - timestamp)
    closest = errors.argmin()
    return trajectory[closest], errors[closest]


def to_transform(pose):
    T_CW = np.eye(4)
    T_CW[:3, :3] = Rotation.from_rotvec(pose[1:4]).as_matrix()
    T_CW[:3, 3] = pose[4:]
    return T_CW


def write_scene(flags, scene_name, trajectory, rgb_images, depth_images,
                confidence_images, intrinsics):
    eps = 1.0 / 90.0  # max rgb <-> pose timestamp difference
    rgb_out = os.path.join(flags.out, scene_name, 'rgb')
    depth_out = os.path.join(flags.out, scene_name, 'depth')
    pose_out = os.path.join(flags.out, scene_name, 'pose')
    for d in (rgb_out, depth_out, pose_out):
        os.makedirs(d, exist_ok=True)

    images = sorted(rgb_images.items(), key=lambda x: to_ts(x[0]))
    for i, (rgb_name, rgb_path_in) in enumerate(images):
        print(f"Writing {rgb_name}", end='\r')
        if rgb_name not in depth_images or rgb_name not in confidence_images:
            print(f"Skipping image {rgb_name}")
            continue
        pose, time_diff = find_pose(trajectory, rgb_name)
        if time_diff > eps:
            print(f"Skipping {rgb_name} due to time diff {time_diff:.03}",
                  end='\r')
            continue
        T_CW = to_transform(pose)

        image_name = f"{i:06}"
        rgb = cv2.imread(rgb_path_in, -1)
        depth = cv2.imread(depth_images[rgb_name], -1)
        confidence = cv2.imread(confidence_images[rgb_name], -1)
        depth[confidence < 2] = 0
        cv2.imwrite(os.path.join(depth_out, image_name + '.png'), depth)
        cv2.imwrite(os.path.join(rgb_out, image_name + '.png'), rgb)
        np.savetxt(os.path.join(pose_out, image_name + '.txt'), T_CW)
    np.savetxt(os.path.join(flags.out, scene_name, 'intrinsics.txt'),
               intrinsics)


def main():
    flags = read_args()
    for scene in os.listdir(flags.arkit_scenes):
        scene_dir = os.path.join(flags.arkit_scenes, scene)
        traj_file = os.path.join(scene_dir, 'lowres_wide.traj')
        confidence_dir = os.path.join(scene_dir, 'confidence')
        depth_dir = os.path.join(scene_dir, 'lowres_depth')
        rgb_dir = os.path.join(scene_dir, 'lowres_wide')
        intrinsics_dir = os.path.join(scene_dir, 'lowres_wide_intrinsics')

        if not all(
                os.path.exists(p)
                for p in (traj_file, confidence_dir, rgb_dir,
                          intrinsics_dir)):
            print(f"Missing files in {scene}")
            continue

        write_scene(flags, scene, np.loadtxt(traj_file),
                    collect_images(rgb_dir), collect_images(depth_dir),
                    collect_images(confidence_dir),
                    read_intrinsics(intrinsics_dir))


if __name__ == "__main__":
    main()
