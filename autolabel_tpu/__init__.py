"""autolabel_tpu — a TPU-native (JAX/XLA/Pallas) interactive scene-labeling
framework with the capabilities of ethz-asl/autolabel.

The reference's CUDA compute core (torch-ngp + tiny-cuda-nn) is replaced by
jit-compiled JAX with Pallas kernels for the hot ops; the scene-directory
format, CLI surface and interactive paint->train->propagate loop are kept
compatible (see SURVEY.md).
"""

__version__ = "0.1.0"
