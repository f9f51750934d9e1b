"""Pallas TPU kernel for the multiresolution hash-grid encode.

The encode is the one genuinely random-access op in the field: per sample,
8 corner gathers from a 2^19-entry table at each of 16 levels. The XLA
path (ops/encoders.py) materializes (L, N) index/weight intermediates in
HBM between gather ops; this kernel fuses index computation, gather and
trilinear blend per level with the level's table slice pinned in VMEM
(4 MB at T=2^19, F=2, fp32), so HBM sees only the point stream and the
output.

Grid: (n_levels, N / TILE_N). The table BlockSpec maps only on the level
axis, so Mosaic keeps the block resident across the inner point-tile
loop. Output layout (L, F, N) keeps the large axis in lanes; the wrapper
transposes to the (N, L*F) the field expects.

Falls back to the XLA implementation when the table does not fit VMEM.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autolabel_tpu.ops import encoders

TILE_N = 1024
# Above this table footprint we keep the XLA path (VMEM is ~16 MB/core).
MAX_VMEM_TABLE_BYTES = 8 * 1024 * 1024


def _encode_kernel(res_ref, stride_ref, dense_ref, x_ref, table_ref,
                   out_ref, *, table_size, n_features):
    level = pl.program_id(0)
    res = res_ref[level]
    stride = stride_ref[level]
    use_dense = dense_ref[level] > 0

    # x block: (3, TILE_N)
    pos = x_ref[:] * res  # (3, TILE_N)
    cell = jnp.floor(pos)
    frac = pos - cell
    cell = cell.astype(jnp.int32)

    acc = jnp.zeros((n_features, x_ref.shape[1]), jnp.float32)
    for ox, oy, oz in encoders._CORNERS:
        cx = cell[0] + ox
        cy = cell[1] + oy
        cz = cell[2] + oz
        hashed = (cx.astype(jnp.uint32) * jnp.uint32(encoders._PRIMES[0])
                  ^ cy.astype(jnp.uint32) * jnp.uint32(encoders._PRIMES[1])
                  ^ cz.astype(jnp.uint32) * jnp.uint32(encoders._PRIMES[2]))
        hashed = (hashed % jnp.uint32(table_size)).astype(jnp.int32)
        dense = cx + stride * (cy + stride * cz)
        idx = jnp.where(use_dense, dense, hashed)  # (TILE_N,)

        wx = jnp.where(ox, frac[0], 1.0 - frac[0])
        wy = jnp.where(oy, frac[1], 1.0 - frac[1])
        wz = jnp.where(oz, frac[2], 1.0 - frac[2])
        weight = wx * wy * wz  # (TILE_N,)

        # Gather the 8 corners from the VMEM-resident level table.
        # Mosaic's dynamic gather is take_along_axis-shaped: indices must
        # match the output shape, gathering along one axis.
        idx_b = jnp.broadcast_to(idx[None, :], (n_features, idx.shape[0]))
        feats = jnp.take_along_axis(table_ref[0], idx_b, axis=1)
        acc = acc + feats * weight[None, :]
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=('config', 'interpret'))
def hashgrid_encode_pallas(table, x, config, interpret=False):
    """Pallas forward encode: (N, 3) in [0, 1] -> (N, L * F).

    table: (L, T, F) fp32 (same param layout as the XLA path).
    NOTE: compiles only in interpret mode on current Mosaic (the in-VMEM
    dynamic gather form is not yet supported on v5e); kept as the kernel
    skeleton for gens with dynamic_gather.
    """
    n = x.shape[0]
    L, T, F = table.shape
    padded_n = ((n + TILE_N - 1) // TILE_N) * TILE_N
    xs = jnp.zeros((3, padded_n), x.dtype).at[:, :n].set(x.T)
    table = table.transpose(0, 2, 1)  # (L, F, T), lanes on T

    resolutions = np.asarray(config.resolutions, np.float32)
    strides = np.asarray([r + 1 for r in config.resolutions], np.int64)
    dense_ok = ((strides ** 3) <= config.table_size).astype(np.int32)

    kernel = functools.partial(_encode_kernel,
                               table_size=config.table_size,
                               n_features=F)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L, padded_n // TILE_N),
        in_specs=[
            pl.BlockSpec((3, TILE_N), lambda l, i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, T), lambda l, i, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, TILE_N), lambda l, i, *_: (l, 0, i),
                               memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, F, padded_n), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(resolutions), jnp.asarray(strides, jnp.int32),
      jnp.asarray(dense_ok), xs, table)

    # (L, F, N) -> (N, L*F)
    return out[:, :, :n].transpose(2, 0, 1).reshape(n, L * F)


def supports(config):
    """Whether the kernel can pin one level's table in VMEM."""
    return (config.table_size * config.n_features * 4
            <= MAX_VMEM_TABLE_BYTES)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hashgrid_encode_hybrid(table, x, config):
    """Pallas forward, XLA backward.

    The backward pass w.r.t. the table is a scatter-add; XLA's scatter is
    used for it (recomputing indices/weights is cheap next to the HBM
    traffic), while the forward runs the fused VMEM-resident kernel.
    """
    return hashgrid_encode_pallas(table, x, config)


def _hybrid_fwd(table, x, config):
    return hashgrid_encode_pallas(table, x, config), (table, x)


def _hybrid_bwd(config, residuals, g):
    table, x = residuals
    _, vjp = jax.vjp(
        lambda t, xx: encoders.hashgrid_encode(t, xx, config), table, x)
    return vjp(g)


hashgrid_encode_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
