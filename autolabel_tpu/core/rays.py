"""Camera rays and pose conventions.

World space is defined by three chained transforms, exactly as in the
reference (autolabel/dataset.py:13-14, 268-274): a scene pose T_CW (OpenCV
camera convention) is inverted, flipped to OpenGL, then axis-permuted with
the instant-ngp remap. Ray directions are computed per pixel on the host
(reference uses a numba njit kernel, dataset.py:17-37); here it is plain
vectorized numpy — the TPU never sees per-pixel Python.
"""
import numpy as np

try:  # native kernel (native/raybatch.c); numpy fallback below
    from autolabel_tpu import _raybatch
except ImportError:
    _raybatch = None

# OpenCV camera (x right, y down, z forward) -> OpenGL (y up, z backward).
CV_TO_OPENGL = np.diag([1.0, -1.0, -1.0, 1.0])

# instant-ngp axis remap: rows cycled (y, z, x) with flipped 2nd/3rd columns.
_NGP_ROW_PERM = np.array([1, 2, 0])
_NGP_COL_SIGN = np.array([1.0, -1.0, -1.0, 1.0])


def nerf_matrix_to_ngp(pose, scale=1.0, offset=(0.0, 0.0, 0.0)):
    """Convert an OpenGL camera-to-world pose to instant-ngp's convention.

    Same semantics as torch-ngp's provider function the reference imports
    (autolabel/dataset.py:11): cycle the axes so ngp's z is up, flip the
    second and third basis vectors, and scale/offset the translation.
    """
    pose = np.asarray(pose)
    out = np.eye(4, dtype=np.float32)
    out[:3] = pose[_NGP_ROW_PERM, :] * _NGP_COL_SIGN[None, :]
    out[:3, 3] = out[:3, 3] * scale + np.asarray(offset)
    return out


def convert_pose(T_CW):
    """Scene-file T_CW (OpenCV world-to-camera) -> ngp T_WC.

    Parity: autolabel/dataset.py:268-274.
    """
    T_WC = np.linalg.inv(T_CW) @ CV_TO_OPENGL
    return nerf_matrix_to_ngp(T_WC, scale=1.0)


def ngp_pose_to_scene(T_ngp):
    """Inverse of convert_pose: ngp T_WC -> scene-file T_CW (OpenCV
    world-to-camera), so refined/registered poses (train/pose_refine.py,
    scripts/register.py) can be written back in the scene's pose/*.txt
    convention."""
    T_ngp = np.asarray(T_ngp, np.float64)
    T_WC_gl = np.eye(4)
    # Undo nerf_matrix_to_ngp's row cycle + column flips.
    T_WC_gl[_NGP_ROW_PERM, :] = T_ngp[:3] * _NGP_COL_SIGN[None, :]
    T_WC_gl[3] = (0.0, 0.0, 0.0, 1.0)
    return np.linalg.inv(T_WC_gl @ np.linalg.inv(CV_TO_OPENGL))


def compute_directions(R_WC,
                       ray_indices,
                       w,
                       fx,
                       fy,
                       cx,
                       cy,
                       rng=None):
    """World-space unit ray directions for flat pixel indices.

    Arguments:
        R_WC: (3, 3) camera-to-world rotation.
        ray_indices: (N,) int flat pixel indices (row-major).
        w: image width in pixels.
        rng: np.random.Generator for intra-pixel jitter, or None for
            pixel centers.
    Returns:
        directions: (N, 3) float32 unit directions in world space.
        norms: (N, 1) float32 norm of the unnormalized camera-space
            direction (x, y, 1) — the factor converting ray distance to
            z-depth.

    Parity: autolabel/dataset.py:17-37 (njit _compute_direction). Uses
    the native C kernel when built (setup.py build_ext --inplace).
    """
    ray_indices = np.asarray(ray_indices)
    if _raybatch is not None:
        if rng is not None:
            jx = rng.random(ray_indices.size, dtype=np.float32)
            jy = rng.random(ray_indices.size, dtype=np.float32)
        else:
            jx = jy = None
        return _raybatch.compute_directions(
            np.asarray(R_WC, np.float64), ray_indices.astype(np.int64),
            int(w), float(fx), float(fy), float(cx), float(cy), jx, jy)
    xs = (ray_indices % w).astype(np.float32)
    ys = ((ray_indices - xs) / w).astype(np.float32)
    if rng is not None:
        xs = xs + rng.random(ray_indices.size, dtype=np.float32)
        ys = ys + rng.random(ray_indices.size, dtype=np.float32)
    else:
        xs = xs + 0.5
        ys = ys + 0.5
    directions = np.empty((ray_indices.size, 3), dtype=np.float32)
    directions[:, 0] = (xs - cx) / fx
    directions[:, 1] = (ys - cy) / fy
    directions[:, 2] = 1.0
    norms = np.linalg.norm(directions, axis=1, keepdims=True)
    directions /= norms
    return directions @ np.asarray(R_WC, dtype=np.float32).T, norms
