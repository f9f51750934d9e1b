"""nerf_matrix_to_ngp stand-in (torch-ngp provider semantics: cycle the
axes so ngp's z is up, flip the 2nd/3rd basis vectors, scale+offset the
translation). Same math as autolabel_tpu/core/rays.py:25-36."""
import numpy as np

_ROW_PERM = np.array([1, 2, 0])
_COL_SIGN = np.array([1.0, -1.0, -1.0, 1.0])


def nerf_matrix_to_ngp(pose, scale=0.33, offset=(0.0, 0.0, 0.0)):
    pose = np.asarray(pose)
    out = np.eye(4, dtype=np.float32)
    out[:3] = pose[_ROW_PERM, :] * _COL_SIGN[None, :]
    out[:3, 3] = out[:3, 3] * scale + np.asarray(offset)
    return out
