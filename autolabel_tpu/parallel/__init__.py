"""Device-mesh utilities: data-parallel and grid tensor-parallel.

The reference is single-GPU (SURVEY.md §2.3: no distributed backend at
all). On TPU, rays are i.i.d., so the primary scaling story is DP over
ICI: params replicated, ray batch sharded on a 'data' mesh axis,
gradient psum inserted by XLA from the sharding annotations on the
jitted train step. No NCCL analog, no hand-written collectives.

For grids too large to replicate, the hash table additionally shards
TENSOR-PARALLEL over a 'model' axis — on its FEATURE axis, so every
device gathers its own feature slice of the same hashed rows and the
dominant gather/scatter traffic stays device-local; XLA inserts the
activation all-gather where the encode output meets the (replicated)
sigma-net matmul. Mesh layout: ('data', 'model') with 'data' outermost.
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


def make_mesh_2d(n_data, n_model, devices=None):
    """('data', 'model') mesh for DP x grid-TP training."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, ('data', 'model'))


def batch_sharding(mesh):
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def grid_sharding(mesh):
    """Hash table (L, T, F) sharded on the feature axis over 'model'."""
    return NamedSharding(mesh, P(None, None, 'model'))


def tree_shardings(mesh, tree, grid_shape=None):
    """Sharding tree for a params/opt-state pytree: leaves with the hash
    table's exact (L, T, F) shape shard on the feature axis over the
    mesh's 'model' axis (if present); everything else replicates. Works
    for optimizer states too — Adam moments mirror the param shapes."""
    shard_grid = (grid_shape is not None and 'model' in mesh.axis_names)
    grid = grid_sharding(mesh) if shard_grid else None
    rep = replicated(mesh)

    def leaf_sharding(leaf):
        if (shard_grid and hasattr(leaf, 'shape')
                and tuple(leaf.shape) == tuple(grid_shape)):
            return grid
        return rep

    return jax.tree.map(leaf_sharding, tree)
