"""Input encodings: frequency, spherical harmonics, multiresolution hash grid.

TPU-native replacements for the reference's CUDA encoders:
  - tcnn Frequency (autolabel/models.py:19-22,34-37)  -> frequency_encode
  - tcnn SphericalHarmonics deg 4 (models.py:97-101)  -> sh_encode
  - tcnn Grid/Hash 16x2 T=2^19 (models.py:38-48) and
    torch_ngp GridEncoder desired_resolution=2^18 (models.py:143)
    -> hashgrid_encode (one fused gather over all levels; XLA lowers the
       backward to a scatter-add into the table).

Frequency and SH are pure jnp: they are bandwidth-trivial and XLA fuses
them into the surrounding network. The hash grid is the one genuinely
random-access op; see autolabel_tpu/ops/hashgrid_pallas.py for the Pallas
kernel used on real TPUs.
"""
import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# instant-ngp spatial hashing primes (identity on x).
_PRIMES = (1, 2654435761, 805459861)

# Corner offsets of the trilinear interpolation cell, shape (8, 3).
_CORNERS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing='ij')).reshape(3, 8).T


def frequency_encode(x, n_frequencies):
    """NeRF-style positional encoding: sin/cos at octave frequencies.

    x: (..., D) -> (..., D * n_frequencies * 2)
    """
    freqs = (2.0 ** jnp.arange(n_frequencies)) * jnp.pi
    angles = x[..., None] * freqs  # (..., D, F)
    enc = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * n_frequencies * 2)


def sh_encode(d):
    """Real spherical harmonics basis up to degree 4 (16 coefficients).

    d: (..., 3) unit directions -> (..., 16). Closed-form polynomials;
    the MXU-free VPU evaluates this fused into the color MLP.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = [
        jnp.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(out, axis=-1)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Multiresolution hash grid hyperparameters (instant-ngp layout)."""
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0

    @classmethod
    def from_desired_resolution(cls, desired_resolution, **kwargs):
        """torch-ngp get_encoder semantics: solve per-level scale so the
        finest level reaches desired_resolution."""
        base = kwargs.get('base_resolution', 16)
        n_levels = kwargs.get('n_levels', 16)
        scale = math.exp(
            math.log(desired_resolution / base) / (n_levels - 1))
        return cls(per_level_scale=scale, **kwargs)

    @property
    def table_size(self):
        return 1 << self.log2_hashmap_size

    @property
    def resolutions(self):
        """Per-level grid resolution N_l = floor(base * scale^l)."""
        return tuple(
            int(math.floor(self.base_resolution * self.per_level_scale ** l))
            for l in range(self.n_levels))

    @property
    def out_dim(self):
        return self.n_levels * self.n_features


def hashgrid_init(key, config, dtype=jnp.float32):
    """Hash table of shape (n_levels, table_size, n_features), U(-1e-4, 1e-4)."""
    shape = (config.n_levels, config.table_size, config.n_features)
    return jax.random.uniform(key, shape, dtype, -1e-4, 1e-4)


@functools.partial(jax.jit, static_argnames='config')
def hashgrid_encode(table, x, config):
    """Encode (N, 3) points in [0, 1] -> (N, n_levels * n_features).

    TPU layout note: all large intermediates keep N in the LAST (lane)
    dimension — a (N, L, 8, 3) corner tensor would be tile-padded 42x by
    the TPU's (8, 128) layout (the trailing 3 pads to 128). The 8 cell
    corners are a static unrolled loop of (L, N) gathers instead; grad
    w.r.t. the table lowers to scatter-adds (XLA). The Pallas kernel in
    ops/hashgrid_pallas.py replaces this on the TPU hot path.
    """
    n = x.shape[0]
    res = jnp.asarray(config.resolutions, dtype=jnp.float32)  # (L,)
    # (3, L, N): per-dimension positions, N in lanes.
    pos = res[None, :, None] * x.T[:, None, :]
    cell = jnp.floor(pos)
    frac = pos - cell
    cell = cell.astype(jnp.int32)

    strides = np.asarray([r + 1 for r in config.resolutions], dtype=np.int64)
    dense_ok = (strides ** 3) <= config.table_size
    use_dense = jnp.asarray(dense_ok)[:, None]  # (L, 1)
    stride = jnp.asarray(strides, dtype=jnp.int32)[:, None]  # (L, 1)
    level = jnp.arange(config.n_levels, dtype=jnp.int32)[:, None]  # (L, 1)

    out = jnp.zeros((config.n_levels, n, config.n_features),
                    dtype=table.dtype)
    for ox, oy, oz in _CORNERS:
        cx = cell[0] + ox
        cy = cell[1] + oy
        cz = cell[2] + oz
        hashed = (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                  ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
                  ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
        hashed = (hashed % jnp.uint32(config.table_size)).astype(jnp.int32)
        dense = cx + stride * (cy + stride * cz)
        idx = jnp.where(use_dense, dense, hashed)  # (L, N)

        wx = frac[0] if ox else 1.0 - frac[0]
        wy = frac[1] if oy else 1.0 - frac[1]
        wz = frac[2] if oz else 1.0 - frac[2]
        weight = (wx * wy * wz).astype(table.dtype)  # (L, N)

        feats = table[level, idx]  # (L, N, F)
        out = out + feats * weight[..., None]

    # (L, N, F) -> (N, L*F)
    return out.transpose(1, 0, 2).reshape(n, config.out_dim)
