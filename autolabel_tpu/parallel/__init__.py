"""Device-mesh utilities for data-parallel training.

The reference is single-GPU (SURVEY.md §2.3: no distributed backend at
all). On TPU, rays are i.i.d., so the idiomatic scaling story is pure DP
over ICI: params replicated, ray batch sharded on a 1-D 'data' mesh axis,
gradient psum inserted by XLA from the sharding annotations on the jitted
train step. No NCCL analog, no hand-written collectives.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ('data',))


def batch_sharding(mesh):
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    return NamedSharding(mesh, P())
