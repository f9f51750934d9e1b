"""Converts rendered Replica scenes from Semantic-NeRF
(https://github.com/Harry-Zhi/semantic_nerf) to the autolabel scene format.

usage:
    python scripts/convert_replica.py <replica sequence> --out <out-dir>

CLI parity: reference scripts/convert_replica.py (open3d bounds
computation replaced by numpy backprojection + percentile outlier trim).
"""
import argparse
import json
import math
import os
import shutil
import sys

import cv2
import numpy as np
from tqdm import tqdm

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.utils import Scene, transform_points


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("scene")
    parser.add_argument("--out", type=str, required=True)
    return parser.parse_args()


def _numeric_key(name):
    return int(name.split('_')[-1].split('.')[0])


class Exporter:

    def __init__(self, flags):
        self.flags = flags
        self.in_scene = flags.scene
        self._collect_paths()

    def _collect_paths(self):
        rgb_path = os.path.join(self.in_scene, 'rgb')
        depth_path = os.path.join(self.in_scene, 'depth')
        semantic_path = os.path.join(self.in_scene, 'semantic_class')
        rgb = sorted((f for f in os.listdir(rgb_path) if f[0] != '.'),
                     key=_numeric_key)
        depth = sorted((f for f in os.listdir(depth_path) if f[0] != '.'),
                       key=_numeric_key)
        semantic = sorted(
            (f for f in os.listdir(semantic_path)
             if f[0] != '.' and 'semantic' in f), key=_numeric_key)
        self.rgb_frames = [os.path.join(rgb_path, f) for f in rgb]
        self.depth_frames = [os.path.join(depth_path, f) for f in depth]
        self.semantic_frames = [
            os.path.join(semantic_path, f) for f in semantic
        ]

    def _copy_frames(self):
        rgb_out = os.path.join(self.flags.out, 'rgb')
        depth_out = os.path.join(self.flags.out, 'depth')
        semantic_out = os.path.join(self.flags.out, 'semantic')
        for d in (rgb_out, depth_out, semantic_out):
            os.makedirs(d, exist_ok=True)

        # First pass: copy frames + discover the set of class ids so they
        # can be remapped to a compact 0..n range.
        semantic_classes = set()
        semantic_maps = []
        for i, (rgb, depth, semantic) in enumerate(
                zip(tqdm(self.rgb_frames, desc="Copying frames"),
                    self.depth_frames, self.semantic_frames)):
            shutil.copy(rgb, os.path.join(rgb_out, f"{i:06}.png"))
            shutil.copy(depth, os.path.join(depth_out, f"{i:06}.png"))
            sem_frame = cv2.imread(semantic, -1)
            semantic_maps.append(sem_frame)
            semantic_classes.update(np.unique(sem_frame).tolist())

        for i, frame in enumerate(
                tqdm(semantic_maps, desc="Writing semantic")):
            remapped = np.zeros_like(frame)
            for new_class_id, class_id in enumerate(sorted(semantic_classes)):
                remapped[frame == class_id] = new_class_id
            cv2.imwrite(os.path.join(semantic_out, f"{i:06}.png"), remapped)

        metadata = {'n_classes': len(semantic_classes)}
        with open(os.path.join(self.flags.out, 'metadata.json'), 'w') as f:
            f.write(json.dumps(metadata, indent=2))

    def _copy_trajectory(self):
        pose_dir = os.path.join(self.flags.out, 'pose')
        os.makedirs(pose_dir, exist_ok=True)
        trajectory = np.loadtxt(
            os.path.join(self.flags.scene, 'traj_w_c.txt'),
            delimiter=' ').reshape(-1, 4, 4)
        for i, T_WC in enumerate(trajectory):
            np.savetxt(os.path.join(pose_dir, f"{i:06}.txt"),
                       np.linalg.inv(T_WC))

    def _copy_intrinsics(self):
        width, height = 640, 480
        hfov = 90.0
        fx = width / 2.0 / math.tan(math.radians(hfov / 2.0))
        camera_matrix = np.eye(3)
        camera_matrix[0, 0] = fx
        camera_matrix[1, 1] = fx
        camera_matrix[0, 2] = (width - 1.0) / 2.0
        camera_matrix[1, 2] = (height - 1.0) / 2.0
        np.savetxt(os.path.join(self.flags.out, 'intrinsics.txt'),
                   camera_matrix)

    def _compute_bounds(self):
        scene = Scene(self.flags.out)
        depth0 = cv2.imread(scene.depth_paths()[0], -1)
        depth_size = depth0.shape[::-1]
        K = scene.camera.scale(depth_size).camera_matrix

        points = []
        poses = scene.poses[::10]
        depths = scene.depth_paths()[::10]
        for T_CW, depth_path in zip(poses,
                                    tqdm(depths, desc="Computing bounds")):
            depth = cv2.imread(depth_path, -1)
            ys, xs = np.nonzero(depth)
            z = depth[ys, xs].astype(np.float64) / 1000.0
            pc_C = np.stack([(xs + 0.5 - K[0, 2]) * z / K[0, 0],
                             (ys + 0.5 - K[1, 2]) * z / K[1, 1], z], axis=-1)
            pc_W = transform_points(np.linalg.inv(T_CW), pc_C)
            points.append(pc_W[::50])
        points = np.concatenate(points)
        # Percentile trim stands in for open3d's statistical outlier filter.
        lo = np.percentile(points, 0.5, axis=0)
        hi = np.percentile(points, 99.5, axis=0)
        with open(os.path.join(scene.path, 'bbox.txt'), 'wt') as f:
            min_str = " ".join(str(x) for x in lo)
            max_str = " ".join(str(x) for x in hi)
            f.write(f"{min_str} {max_str} 0.01")

    def run(self):
        self._copy_frames()
        self._copy_trajectory()
        self._copy_intrinsics()
        self._compute_bounds()


if __name__ == "__main__":
    Exporter(read_args()).run()
