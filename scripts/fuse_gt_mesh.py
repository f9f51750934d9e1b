"""Fuse a scene's gt depth + gt_semantic frames into mesh.ply +
mesh_labels.npy — the 3D ground truth the open-vocab point-cloud
evaluator consumes (language/evaluate.py --pc).

The reference gets these artifacts from dataset-specific annotation
files (ScanNet meshes, scripts/convert_scannet.py; reference
evaluation.py:447-461 reads them); scenes produced by other converters
or the synthetic generators have dense per-frame gt but no mesh. This
tool backprojects every labeled depth pixel to world coordinates,
deduplicates on a voxel grid, and writes the same artifact pair, so
ANY scene with gt_semantic + depth becomes 3D-evaluable.

The vertices are stored in scene-world coordinates: the evaluator's
(x, y, z) -> (y, z, x) read-time permutation is exactly the ngp world
remap the pose conversion applies (core/rays.nerf_matrix_to_ngp), so
world-coordinate meshes land in field space — the same convention real
ScanNet meshes use.

Usage:
    python scripts/fuse_gt_mesh.py <scene> [--frame-stride 4]
        [--pixel-stride 2] [--voxel-size 0.02]
"""
import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autolabel_tpu.utils import Scene
from autolabel_tpu.utils.ply import write_ply_pointcloud


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('scene')
    parser.add_argument('--frame-stride', type=int, default=4,
                        help="Fuse every Nth frame.")
    parser.add_argument('--pixel-stride', type=int, default=2,
                        help="Backproject every Nth pixel in x and y.")
    parser.add_argument('--voxel-size', type=float, default=0.02,
                        help="Deduplication voxel edge in meters.")
    parser.add_argument('--max-points', type=int, default=2 ** 19,
                        help="Random-subsample cap on the fused cloud.")
    return parser.parse_args()


def backproject_frame(depth_m, labels, K, T_CW, pixel_stride=1):
    """Labeled depth pixels -> (world points, labels)."""
    depth_m = depth_m[::pixel_stride, ::pixel_stride]
    labels = labels[::pixel_stride, ::pixel_stride]
    h, w = depth_m.shape
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    us = us * pixel_stride + 0.5
    vs = vs * pixel_stride + 0.5
    keep = (depth_m > 0) & (labels > 0)
    z = depth_m[keep]
    x = (us[keep] - K[0, 2]) * z / K[0, 0]
    y = (vs[keep] - K[1, 2]) * z / K[1, 1]
    p_cam = np.stack([x, y, z], axis=-1)
    T_WC = np.linalg.inv(T_CW)
    return p_cam @ T_WC[:3, :3].T + T_WC[:3, 3], labels[keep]


def voxel_dedupe(points, labels, voxel_size):
    """One point per voxel (first hit wins, points averaged per voxel
    would blur label boundaries)."""
    cells = np.floor(points / voxel_size).astype(np.int64)
    # Stable unique over rows via a structured view.
    _, first = np.unique(cells, axis=0, return_index=True)
    return points[first], labels[first]


def fuse_scene(scene_path, frame_stride=4, pixel_stride=2,
               voxel_size=0.02, max_points=2 ** 19, seed=0):
    scene = Scene(scene_path)
    depth_paths = scene.depth_paths()
    label_paths = scene.gt_semantic()
    if not label_paths:
        raise FileNotFoundError(f"{scene_path} has no gt_semantic/ frames")
    assert len(depth_paths) == len(label_paths), \
        "depth and gt_semantic frame counts differ"

    probe = cv2.imread(depth_paths[0], -1)
    K = scene.camera.scale((probe.shape[1],
                            probe.shape[0])).camera_matrix

    all_points, all_labels = [], []
    for i in range(0, len(depth_paths), frame_stride):
        depth = cv2.imread(depth_paths[i], -1).astype(np.float32) / 1000.0
        labels = cv2.imread(label_paths[i], -1)
        if labels.shape != depth.shape:
            labels = cv2.resize(labels, (depth.shape[1], depth.shape[0]),
                                interpolation=cv2.INTER_NEAREST)
        points, frame_labels = backproject_frame(
            depth, labels, K, scene.poses[i], pixel_stride=pixel_stride)
        all_points.append(points)
        all_labels.append(frame_labels)

    points = np.concatenate(all_points)
    labels = np.concatenate(all_labels)
    points, labels = voxel_dedupe(points, labels, voxel_size)
    if len(points) > max_points:
        pick = np.random.default_rng(seed).choice(len(points), max_points,
                                                  replace=False)
        points, labels = points[pick], labels[pick]
    return points.astype(np.float32), labels.astype(np.uint16)


def main():
    flags = read_args()
    points, labels = fuse_scene(flags.scene,
                                frame_stride=flags.frame_stride,
                                pixel_stride=flags.pixel_stride,
                                voxel_size=flags.voxel_size,
                                max_points=flags.max_points)
    write_ply_pointcloud(os.path.join(flags.scene, 'mesh.ply'), points)
    np.save(os.path.join(flags.scene, 'mesh_labels.npy'), labels)
    classes, counts = np.unique(labels, return_counts=True)
    per_class = ", ".join(f"{c}: {n}" for c, n in zip(classes, counts))
    print(f"wrote {len(points)} vertices ({per_class})")


if __name__ == "__main__":
    main()
