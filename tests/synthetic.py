"""Procedural test scene: a shaded sphere observed from a camera ring.

Writes a complete scene directory (rgb/ depth/ pose/ semantic/
intrinsics.txt bbox.txt metadata.json) with analytically known geometry so
end-to-end training and rendering can be verified without real data.
Depth images are uint16 millimeter z-depth, poses are OpenCV T_CW — the
same conventions the real pipeline produces (SURVEY.md §1 scene contract).
"""
import json
import os

import cv2
import numpy as np

SPHERE_RADIUS = 0.5
SPHERE_COLOR = np.array([0.9, 0.3, 0.2])
BACKGROUND = np.array([0.75, 0.78, 0.8])


def look_at_cv(position, target, up=(0.0, 0.0, 1.0)):
    """OpenCV camera-to-world pose (x right, y down, z forward)."""
    position = np.asarray(position, dtype=np.float64)
    forward = target - position
    forward /= np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, dtype=np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    T_WC = np.eye(4)
    T_WC[:3, 0] = right
    T_WC[:3, 1] = down
    T_WC[:3, 2] = forward
    T_WC[:3, 3] = position
    return T_WC


def ray_sphere(origins, dirs, radius):
    """t of first intersection with a sphere at the origin, inf if miss."""
    b = 2.0 * (origins * dirs).sum(-1)
    c = (origins * origins).sum(-1) - radius ** 2
    disc = b ** 2 - 4 * c
    hit = disc > 0
    sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
    t = (-b - sqrt_disc) / 2.0
    return np.where(hit & (t > 0), t, np.inf)


def render_frame(T_WC, camera_matrix, width, height):
    fx, fy = camera_matrix[0, 0], camera_matrix[1, 1]
    cx, cy = camera_matrix[0, 2], camera_matrix[1, 2]
    xs, ys = np.meshgrid(np.arange(width) + 0.5, np.arange(height) + 0.5)
    dirs_cam = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], axis=-1)
    norms = np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_cam = dirs_cam / norms
    R = T_WC[:3, :3]
    origin = T_WC[:3, 3]
    dirs = dirs_cam @ R.T
    origins = np.broadcast_to(origin, dirs.shape)

    t = ray_sphere(origins.reshape(-1, 3), dirs.reshape(-1, 3),
                   SPHERE_RADIUS).reshape(height, width)
    hit = np.isfinite(t)
    t_safe = np.where(hit, t, 0.0)
    points = origins + t_safe[..., None] * dirs
    normals = points / max(SPHERE_RADIUS, 1e-9)
    light = np.array([0.5, -0.5, 0.8])
    light = light / np.linalg.norm(light)
    shade = np.clip((normals * light).sum(-1), 0.1, 1.0)

    rgb = np.where(hit[..., None], SPHERE_COLOR * shade[..., None],
                   BACKGROUND)
    # z-depth (projection onto the optical axis), meters.
    z = np.where(hit, t_safe * dirs_cam[..., 2], 0.0)
    semantic = np.where(hit, 2, 1).astype(np.uint8)
    return rgb, z, semantic


def make_synthetic_scene(scene_dir,
                         n_frames=12,
                         width=48,
                         height=36,
                         camera_distance=1.6,
                         label_every=3):
    os.makedirs(scene_dir, exist_ok=True)
    for sub in ('rgb', 'depth', 'pose', 'semantic', 'gt_masks'):
        os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)

    focal = 0.8 * width
    camera_matrix = np.array([[focal, 0, width / 2.0],
                              [0, focal, height / 2.0], [0, 0, 1.0]])
    np.savetxt(os.path.join(scene_dir, 'intrinsics.txt'), camera_matrix)
    bound = 1.0
    np.savetxt(os.path.join(scene_dir, 'bbox.txt'),
               np.array([-bound] * 3 + [bound] * 3))
    with open(os.path.join(scene_dir, 'metadata.json'), 'w') as f:
        json.dump({'n_classes': 2}, f)

    for i in range(n_frames):
        angle = 2 * np.pi * i / n_frames
        position = np.array([
            camera_distance * np.cos(angle),
            camera_distance * np.sin(angle),
            0.7,
        ])
        T_WC = look_at_cv(position, np.zeros(3))
        T_CW = np.linalg.inv(T_WC)
        rgb, z, semantic = render_frame(T_WC, camera_matrix, width, height)

        cv2.imwrite(os.path.join(scene_dir, 'rgb', f'{i}.png'),
                    cv2.cvtColor((rgb * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(scene_dir, 'depth', f'{i}.png'),
                    (z * 1000).astype(np.uint16))
        np.savetxt(os.path.join(scene_dir, 'pose', f'{i}.txt'), T_CW)
        if i % label_every == 0:
            cv2.imwrite(os.path.join(scene_dir, 'semantic', f'{i}.png'),
                        semantic)
            _write_gt_mask(scene_dir, i, semantic, width, height)
    return scene_dir


def _write_gt_mask(scene_dir, index, semantic, width, height):
    """Labelme-style polygon annotation of the sphere silhouette."""
    contours, _ = cv2.findContours((semantic == 2).astype(np.uint8),
                                   cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    shapes = [{
        'label': 'sphere',
        'points': contour.reshape(-1, 2).astype(float).tolist(),
    } for contour in contours if len(contour) >= 3]
    with open(os.path.join(scene_dir, 'gt_masks', f'{index}.json'),
              'w') as f:
        json.dump({
            'imageWidth': width,
            'imageHeight': height,
            'shapes': shapes,
        }, f)
