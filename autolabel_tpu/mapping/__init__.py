"""Structure-from-motion mapping: cv2 front-end + JAX bundle adjustment.

The reference's mapping entry point (reference scripts/mapping.py:25-179)
runs SuperPoint/SuperGlue/COLMAP via hloc. That stack is heavy, optional,
and CUDA-oriented; this package provides a self-contained backend with
the same contract — images in, COLMAP-convention reconstruction out —
built from cv2 feature geometry and a TPU-native bundle adjustment
(batched reprojection residuals + matrix-free Levenberg-Marquardt under
jit; mapping/ba.py). scripts/mapping.py picks hloc when importable and
this backend otherwise (--backend).
"""
from autolabel_tpu.mapping.ba import bundle_adjust  # noqa: F401
from autolabel_tpu.mapping.sfm import IncrementalSfM  # noqa: F401
