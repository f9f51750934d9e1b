description = """
This script computes the scene bounding box file (<scene>/bbox.txt) from
depth images and camera poses.

Usage:
    python scripts/compute_scene_bounds.py <scene> [--vis]
"""
import argparse
import os
import sys
from argparse import RawTextHelpFormatter

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.utils import Scene

# Parity: reference scripts/compute_scene_bounds.py (open3d depth
# back-projection replaced by a direct numpy unprojection — open3d is not
# available in this environment and only the AABB is needed).


def read_args():
    parser = argparse.ArgumentParser(description=description,
                                     formatter_class=RawTextHelpFormatter)
    parser.add_argument('scene')
    parser.add_argument('--vis', action='store_true')
    parser.add_argument('--stride', type=int, default=1)
    return parser.parse_args()


def backproject_depth(depth, K, depth_scale=1000.0, depth_trunc=100.0):
    """uint16 depth image -> (N, 3) camera-space points (meters)."""
    h, w = depth.shape[:2]
    ys, xs = np.nonzero(depth)
    z = depth[ys, xs].astype(np.float64) / depth_scale
    keep = z < depth_trunc
    xs, ys, z = xs[keep], ys[keep], z[keep]
    x = (xs + 0.5 - K[0, 2]) * z / K[0, 0]
    y = (ys + 0.5 - K[1, 2]) * z / K[1, 1]
    return np.stack([x, y, z], axis=-1)


class BBoxComputer:
    """Union of depth point clouds + camera centers, 25% margin."""

    def __init__(self, K, image_size):
        self.K = np.asarray(K)
        self.image_size = image_size
        self.min_bounds = np.zeros(3)
        self.max_bounds = np.zeros(3)
        self.points = []

    def add_frame(self, T_CW, depth):
        pc_C = backproject_depth(depth, self.K)
        if pc_C.shape[0] == 0:
            return
        T_WC = np.linalg.inv(T_CW)
        pc_W = pc_C @ T_WC[:3, :3].T + T_WC[:3, 3]
        c_W = T_WC[:3, 3]
        self.min_bounds = np.minimum(self.min_bounds, pc_W.min(axis=0))
        self.max_bounds = np.maximum(self.max_bounds, pc_W.max(axis=0))
        self.min_bounds = np.minimum(self.min_bounds, c_W)
        self.max_bounds = np.maximum(self.max_bounds, c_W)
        self.points.append(pc_W[::50])

    def get_bounds(self):
        aabb = np.stack([self.min_bounds, self.max_bounds])
        the_range = aabb[1] - aabb[0]
        aabb[0] -= 0.25 * the_range
        aabb[1] += 0.25 * the_range
        return aabb


def main():
    flags = read_args()
    print(f"Computing scene bounds for {flags.scene}")

    scene = Scene(flags.scene)
    image_size = scene.peak_image_size()
    bbox_computer = BBoxComputer(scene.camera.camera_matrix, image_size)

    data = list(zip(scene.depth_paths(), scene.rgb_paths(), scene.poses))
    for depth_path, rgb_path, T_CW in data[::flags.stride]:
        depth = cv2.imread(depth_path, -1)
        bbox_computer.add_frame(T_CW, depth)

    bounds = bbox_computer.get_bounds()
    with open(os.path.join(flags.scene, 'bbox.txt'), 'wt') as f:
        min_str = " ".join(str(x) for x in bounds[0])
        max_str = " ".join(str(x) for x in bounds[1])
        f.write("{} {} 0.01".format(min_str, max_str))

    if flags.vis:
        from autolabel_tpu.utils.ply import write_ply_pointcloud
        points = np.concatenate(bbox_computer.points)
        out = os.path.join(flags.scene, 'bounds_preview.ply')
        write_ply_pointcloud(out, points)
        print(f"Wrote point cloud preview to {out}")


if __name__ == "__main__":
    main()
