from autolabel_tpu.core.rays import (CV_TO_OPENGL, compute_directions,
                                     convert_pose, nerf_matrix_to_ngp)
from autolabel_tpu.core.sampler import IndexSampler
