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

    x: (..., D) -> (..., D * n_frequencies * 2), columns ordered
    [d0: sin f0..fF-1, cos f0..fF-1, d1: ...].

    Computed entirely in 2D as one fused sin over (..., D*2F): TPU pads
    the trailing TWO dims of every materialized tensor to (8, 128)
    tiles, so the naive (..., D, F) intermediate inflates to ~21x its
    logical bytes at F=6 (measured: the proposal MLP's 36-dim encode was
    5 ms/step of pure padding traffic). Column-gathering x and using
    cos(t) = sin(t + pi/2) keeps every tensor rank-2 and lane-aligned,
    and XLA fuses the whole chain into the consuming matmul.
    """
    d = x.shape[-1]
    freqs = (2.0 ** np.arange(n_frequencies, dtype=np.float64)) * np.pi
    col_dim = np.repeat(np.arange(d), 2 * n_frequencies)
    col_freq = jnp.asarray(np.tile(np.concatenate([freqs, freqs]), d),
                           jnp.float32)
    col_phase = jnp.asarray(
        np.tile(np.concatenate([np.zeros(n_frequencies),
                                np.full(n_frequencies, np.pi / 2.0)]), d),
        jnp.float32)
    return jnp.sin(x[..., col_dim] * col_freq + col_phase)


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
    """Multiresolution hash grid hyperparameters (instant-ngp layout).

    variant selects the lattice/indexing convention:
      'native'    — ours: pos = x * N_l with N_l = floor(base * plc^l),
                    dense stride N_l + 1, every level hashed modulo the
                    full table. The TPU-first default.
      'tcnn'      — tiny-cuda-nn grid.h semantics (for checkpoints
                    imported from the reference's tcnn Grid encoders,
                    autolabel/models.py:38-48): scale_l = base*plc^l - 1,
                    pos = x * scale_l + 0.5, resolution ceil(scale)+1,
                    dense stride = resolution, per-level entry counts
                    next_multiple(min(res^3, T), 8).
      'torch_ngp' — torch-ngp gridencoder semantics (align_corners=False;
                    the reference's 'hg' encoding, models.py:143): same
                    positions as tcnn but dense stride = resolution + 1
                    and per-level counts next_multiple(min(T, (res+1)^3),
                    8).
    All variants share the coherent prime hash (1, 2654435761,
    805459861), so tables from the source frameworks drop in entry-for-
    entry under their own variant (torch_import.py)."""
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    variant: str = 'native'

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
        """Per-level grid resolution (knots per axis - 1 for 'native',
        knots per axis for the imported variants — mirrors each
        convention's own meaning of 'resolution')."""
        if self.variant == 'native':
            return tuple(
                int(math.floor(self.base_resolution
                               * self.per_level_scale ** l))
                for l in range(self.n_levels))
        return tuple(
            int(math.ceil(self.base_resolution * self.per_level_scale ** l
                          - 1.0)) + 1
            for l in range(self.n_levels))

    @property
    def scales(self):
        """Per-level position scale: pos = x * scale + pos_offset."""
        if self.variant == 'native':
            return tuple(float(r) for r in self.resolutions)
        return tuple(
            self.base_resolution * self.per_level_scale ** l - 1.0
            for l in range(self.n_levels))

    @property
    def pos_offset(self):
        return 0.0 if self.variant == 'native' else 0.5

    @property
    def dense_strides(self):
        if self.variant == 'tcnn':
            return self.resolutions
        return tuple(r + 1 for r in self.resolutions)

    @property
    def level_sizes(self):
        """Entries per level (hash modulus). Uniform for 'native';
        source-exact per level for the imported variants."""
        if self.variant == 'native':
            return (self.table_size,) * self.n_levels
        return tuple(
            (min(s ** 3, self.table_size) + 7) // 8 * 8
            for s in self.dense_strides)

    @property
    def out_dim(self):
        return self.n_levels * self.n_features


# TPU-first hash-grid shape: measured on v5e, the gather engine costs
# ~9 ns per ROW regardless of row width, and narrow (N, F) tiles pad the
# lane dim to 128 — so few levels x 128-wide features x smaller tables is
# ~10x faster in encode fwd+bwd than the reference's 16 x 2 x 2^19 at the
# SAME 16.7M parameter count. Resolutions still span 16 -> ~2048.
TPU_GRID = HashGridConfig(n_levels=4,
                          n_features=128,
                          log2_hashmap_size=15,
                          base_resolution=16,
                          per_level_scale=5.04)


def parse_sampled_backward(spec):
    """CLI spec -> sampled_backward value: '2' -> 2, '1,1,2,2' -> tuple
    of per-level scatter-row counts (coarsest level first), '0' -> 0."""
    if isinstance(spec, (int, tuple)):
        return spec
    parts = [int(p) for p in str(spec).split(',')]
    return parts[0] if len(parts) == 1 else tuple(parts)


def hashgrid_init(key, config, dtype=jnp.float32):
    """Hash table of shape (n_levels, table_size, n_features), U(-1e-4, 1e-4)."""
    shape = (config.n_levels, config.table_size, config.n_features)
    return jax.random.uniform(key, shape, dtype, -1e-4, 1e-4)


def _corner_index(cell, corner, stride, use_dense, level_size):
    """Table index of one interpolation-cell corner, shape (L, N).

    level_size: hash modulus — an int32 array broadcastable against the
    cell coordinates ((L, 1) across levels or (1,) for one level)."""
    ox, oy, oz = corner
    cx = cell[0] + ox
    cy = cell[1] + oy
    cz = cell[2] + oz
    hashed = (cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
              ^ cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
              ^ cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    size = jnp.asarray(level_size)
    hashed = (hashed % size.astype(jnp.uint32)).astype(jnp.int32)
    # Dense indices wrap modulo the level size too (tcnn grid.h /
    # torch-ngp both `return index % hashmap_size`): the +0.5 voxel
    # offset of the imported variants pushes boundary corners one knot
    # past resolution^3. A no-op for 'native' (indices always in range).
    dense = (cx + stride * (cy + stride * cz)) % size
    return jnp.where(use_dense, dense, hashed)


def _corner_weight(frac, corner):
    ox, oy, oz = corner
    wx = frac[0] if ox else 1.0 - frac[0]
    wy = frac[1] if oy else 1.0 - frac[1]
    wz = frac[2] if oz else 1.0 - frac[2]
    return wx * wy * wz  # (L, N)


def _grid_geometry(x, config):
    """Shared cell/fraction computation, all arrays (., L, N)."""
    scales = jnp.asarray(config.scales, dtype=jnp.float32)  # (L,)
    pos = scales[None, :, None] * x.T[:, None, :] + config.pos_offset
    cell = jnp.floor(pos)  # (3, L, N)
    frac = pos - cell
    strides = np.asarray(config.dense_strides, dtype=np.int64)
    sizes = np.asarray(config.level_sizes, dtype=np.int64)
    dense_ok = (strides ** 3) <= sizes
    use_dense = jnp.asarray(dense_ok)[:, None]  # (L, 1)
    stride = jnp.asarray(strides, dtype=jnp.int32)[:, None]  # (L, 1)
    size = jnp.asarray(sizes, dtype=jnp.int32)[:, None]  # (L, 1)
    return cell.astype(jnp.int32), frac, stride, use_dense, size


@functools.partial(jax.jit,
                   static_argnames=('config', 'n_samples', 'exact_levels',
                                    'interp', 'residual', 'sampled_backward',
                                    'backward_points'))
def hashgrid_encode(table, x, config, key=None, n_samples=1, exact_levels=0,
                    interp='trilinear', residual=False, sampled_backward=0,
                    backward_points=1.0):
    """Encode (N, 3) points in [0, 1] -> (N, n_levels * n_features).

    Two formulations, chosen by feature width (both exact):
      - wide rows (F a multiple of 8): per-level jnp.take of whole table
        ROWS — on TPU the gather engine is row-latency-bound (~9 ns/row
        measured on v5e), so wide rows amortize it and (N, F) accumulators
        don't tile-pad. This is the fast path for TPU_GRID-shaped tables.
      - narrow rows (reference 16x2 shape): (F, N)-layout gathers keeping
        the big axis in lanes — a (N, F=2) layout would pad the lane dim
        64x and turn the encode into a multi-GB memory op.
    Grad w.r.t. the table lowers to scatter-adds (XLA) in both.

    key: optional PRNG key enabling STOCHASTIC-CORNER mode (training-time
    only): instead of gathering all 8 cell corners and trilinearly
    weighting them, each (point, level) samples ONE corner, picking the
    upper corner on each axis with probability frac — so
    E[gathered row] == trilinear interpolation exactly, at 8x fewer
    gather rows (and 8x fewer scatter rows in the backward). The
    per-step noise averages out under SGD like dropout; eval paths pass
    key=None and get the exact interpolation. n_samples corner draws are
    averaged; draws come in ANTITHETIC pairs (u, 1-u) — each unbiased,
    negatively correlated — so n_samples=2 costs 2 rows (4x fewer than
    the full 8-corner gather) with variance well below two independent
    draws. exact_levels > 0 keeps the FINEST levels exactly interpolated
    (they carry the detail and, being the most hash-colliding, most of
    the estimator variance) while coarser levels stay stochastic.

    interp: 'trilinear' (8 cell corners, the reference's tcnn
    formulation) or 'simplex' (tetrahedral: the cube splits into 6
    tetrahedra by the ordering of the fractional coords and only the 4
    corners of the containing tetrahedron are gathered — exact C0
    interpolant, matches trilinear on cell corners and edges).
    Scatter/gather rows cost ~15 ns/row on v5e regardless of structure
    (benchmarks/scatter_lab.py), so halving the rows halves the
    dominant encode fwd+bwd cost; the features are learned, so the
    field adapts to the interpolant it is trained with. In stochastic
    mode the corner is drawn from the 4-atom simplex distribution
    (inverse CDF, antithetic pairs) — same unbiasedness, lower variance
    than the 8-atom trilinear draw.

    residual (n_samples == 2 only): Rao-Blackwellized two-row
    estimator — the MAX-WEIGHT corner is taken deterministically at its
    exact weight and one draw comes from the renormalized residual
    distribution, so out = w_m * f_m + (1 - w_m) * f_J. Same unbiased
    mean and the same 2 gathered rows as the antithetic pair, but the
    stochastic mass shrinks from 1 to (1 - w_m) — measured variance is
    well below the antithetic estimator (tests/test_encoders.py).

    sampled_backward (1 or 2, or per-level tuple; requires key): EXACT
    forward, SAMPLED backward. The forward pass interpolates exactly (all corners
    gathered — cheap on TPU: gathers into a 2^15-row table run at
    ~0.6 ns/row thanks to temporal locality) while a custom VJP
    scatters each point/level's cotangent into only `sampled_backward`
    sampled corner rows instead of all of them (scatter-add costs
    ~15-17 ns/row REGARDLESS of structure — benchmarks/scatter_lab.py
    — so the backward is the cost center the sampling attacks).
    E[scattered cotangent] equals the exact gradient:
      1 -> one importance draw J ~ w (scatters g, since w_J/p_J = 1),
      2 -> Rao-Blackwellized residual pair (w_m * g into the max-weight
           corner, (1 - w_m) * g into a residual draw),
      n_atoms (4 simplex / 8 trilinear) -> EXACT scatter on that level
           (zero variance; useful per-level for the coarse levels).
    Unlike stochastic_corners there is NO forward noise — the loss sees
    the exact field — and the gradient estimator is unbiased with
    variance far below forward sampling at the same row budget. When
    set, n_samples/residual are ignored (they shape the forward).

    backward_points (0 < fraction <= 1, sampled_backward mode only):
    magnitude-weighted POINT subsampling of the backward scatter. The
    scatter-row budget above is per (point, level); this cuts the
    point axis too: the custom VJP draws K = ceil(fraction * N) points
    by SYSTEMATIC RESAMPLING from p_i ∝ ||g_i|| (the point's
    encode-output cotangent norm across all levels) and scatters each
    selected point's cotangent scaled by counts_i / (K * p_i), so
    E[table gradient] stays exactly the full estimator's mean.
    Volume-rendering cotangents are concentrated (samples in empty or
    occluded space get ~zero gradient), so most of the scattered rows
    of the full estimator carry ~no mass; the selection spends the row
    budget where the gradient actually is. Total backward scatter rows
    drop from N * sum(rows_l) to K * sum(rows_l) — at the measured
    15-17 ns/row scatter floor this is a direct step-time cut.
    """
    if sampled_backward and key is not None:
        if config.n_features % 8 != 0:
            raise NotImplementedError(
                "sampled_backward is implemented for the wide-row "
                "(TPU_GRID-shaped) layout only")
        # int -> every level; tuple -> per-level row counts (coarsest
        # first), e.g. (1, 1, 2, 2) spends the scatter budget on the
        # finest levels. A per-level count equal to the interpolation's
        # atom count (4 simplex / 8 trilinear) scatters EXACTLY on that
        # level — e.g. (4, 4, 2, 2) keeps the coarse levels' gradients
        # exact (where the table's global layout is decided; see the
        # sampled-warmup dead end, NOTES.md) and samples only the fine
        # ones.
        n_atoms = 4 if interp == 'simplex' else 8
        if isinstance(sampled_backward, int):
            rows = (int(sampled_backward),) * config.n_levels
        else:
            rows = tuple(int(r) for r in sampled_backward)
        if len(rows) != config.n_levels or any(r not in (1, 2, n_atoms)
                                               for r in rows):
            raise NotImplementedError(
                "sampled_backward must be 1 (importance draw), 2 "
                f"(residual pair), or {n_atoms} (exact scatter for this "
                "interpolation), or a per-level tuple of those with one "
                f"entry per grid level; got {sampled_backward!r}")
        pf = float(backward_points)
        if not 0.0 < pf <= 1.0:
            raise ValueError(
                f"backward_points must be in (0, 1]; got {backward_points!r}")
        # One extra uniform column feeds the systematic-resampling offset
        # of the point subsample (u[0, N]); corner draws use u[:, :N].
        n_extra = 1 if pf < 1.0 else 0
        u = jax.random.uniform(key, (config.n_levels, x.shape[0] + n_extra))
        return _encode_sampled_bwd(config, interp, rows, pf, table, x, u)
    if residual and key is not None:
        if n_samples != 2:
            raise NotImplementedError(
                "residual sampling is a 2-row estimator (n_samples=2)")
        if config.n_features % 8 != 0:
            raise NotImplementedError(
                "residual sampling is implemented for the wide-row "
                "layout only")
        return _encode_residual(table, x, config, key, exact_levels,
                                interp)
    if interp == 'simplex':
        if config.n_features % 8 != 0:
            raise NotImplementedError(
                "simplex interpolation is implemented for the wide-row "
                "(TPU_GRID-shaped) layout only")
        if key is not None:
            return _encode_stochastic_simplex(table, x, config, key,
                                              n_samples, exact_levels)
        return _encode_rows_simplex(table, x, config)
    if key is not None:
        return _encode_stochastic(table, x, config, key, n_samples,
                                  exact_levels)
    if config.n_features % 8 == 0:
        return _encode_rows(table, x, config)
    return _encode_lanes(table, x, config)


def _encode_rows(table, x, config, dtype=None):
    n = x.shape[0]
    dtype = dtype or table.dtype
    table = table.astype(dtype)
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    outs = []
    for l in range(config.n_levels):
        acc = jnp.zeros((n, config.n_features), dtype)
        for corner in _CORNERS:
            idx = _corner_index(cell[:, l], corner, stride[l], use_dense[l],
                                size[l])  # (N,)
            weight = _corner_weight(frac[:, l], corner).astype(dtype)
            acc = acc + jnp.take(table[l], idx, axis=0) * weight[:, None]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


def _simplex_corners(frac_l):
    """Tetrahedral-interpolation corners of one level.

    frac_l: (3, N) fractional coords in the cell. The unit cube splits
    into 6 tetrahedra by the ordering of (fx, fy, fz); the containing
    tetrahedron's corners are the lattice path base -> +e_max -> +e_mid
    -> (1,1,1). With sorted fractions s1 >= s2 >= s3 the barycentric
    weights are (1-s1, s1-s2, s2-s3, s3): non-negative, summing to 1,
    continuous in frac (ties zero the ambiguous corners' weights, so the
    argmax/argmin tie-breaks never matter), and agreeing with trilinear
    interpolation on cell corners and edges (linear, not cubic, along
    the main diagonal).

    Returns (offsets (4, 3, N) int32 in {0, 1}, weights (4, N)).
    """
    s1 = jnp.max(frac_l, axis=0)
    s3 = jnp.min(frac_l, axis=0)
    s2 = frac_l.sum(axis=0) - s1 - s3
    o1 = jax.nn.one_hot(jnp.argmax(frac_l, axis=0), 3, axis=0,
                        dtype=jnp.int32)  # (3, N)
    o2 = 1 - jax.nn.one_hot(jnp.argmin(frac_l, axis=0), 3, axis=0,
                            dtype=jnp.int32)
    offsets = jnp.stack(
        [jnp.zeros_like(o1), o1, o2, jnp.ones_like(o1)])  # (4, 3, N)
    weights = jnp.stack([1.0 - s1, s1 - s2, s2 - s3, s3])  # (4, N)
    return offsets, weights


def _exact_level_rows_simplex(table, l, cell, frac, stride, use_dense,
                              size, config, dtype=None):
    """4-corner tetrahedral interpolation of one level (rows layout)."""
    dtype = dtype or table.dtype
    offsets, weights = _simplex_corners(frac[:, l])
    acc = jnp.zeros((cell.shape[-1], config.n_features), dtype)
    table_l = table[l].astype(dtype)
    for ci in range(4):
        idx = _corner_index(cell[:, l],
                            (offsets[ci, 0], offsets[ci, 1], offsets[ci, 2]),
                            stride[l], use_dense[l], size[l])
        acc = acc + jnp.take(table_l, idx, axis=0) \
            * weights[ci].astype(dtype)[:, None]
    return acc


def _encode_rows_simplex(table, x, config, dtype=None):
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    return jnp.concatenate([
        _exact_level_rows_simplex(table, l, cell, frac, stride,
                                  use_dense, size, config, dtype)
        for l in range(config.n_levels)
    ], axis=-1)


def _encode_stochastic_simplex(table, x, config, key, n_samples,
                               exact_levels=0):
    """Sampled-corner tetrahedral gathers; E[output] == simplex interp.

    Each draw picks one of the 4 tetrahedron corners by inverse CDF over
    the barycentric weights (gathered row has weight 1, so the estimator
    is exactly unbiased); antithetic pairs (u, 1-u) land on opposite
    tails of the CDF for negative correlation. Fewer atoms with more
    concentrated weights than the 8-corner trilinear draw -> lower
    variance at the same number of gathered rows.
    """
    n = x.shape[0]
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    n_levels = config.n_levels
    n_exact = min(max(exact_levels, 0), n_levels)

    n_pairs, odd = divmod(n_samples, 2)
    keys = jax.random.split(key, max(n_pairs + odd, 1))
    us = [jax.random.uniform(keys[s], (n_levels, n))
          for s in range(n_pairs + odd)]

    outs = []
    for l in range(n_levels):
        if l >= n_levels - n_exact:
            outs.append(_exact_level_rows_simplex(table, l, cell, frac,
                                                  stride, use_dense,
                                                  size, config))
            continue
        offsets, weights = _simplex_corners(frac[:, l])
        cum = jnp.cumsum(weights[:3], axis=0)  # (3, N)

        def one(u_l):
            r = (u_l[None, :] > cum).sum(axis=0)  # (N,) in [0, 3]
            off = jnp.where(
                r[None, :] == 0, offsets[0],
                jnp.where(r[None, :] == 1, offsets[1],
                          jnp.where(r[None, :] == 2, offsets[2],
                                    offsets[3])))  # (3, N)
            idx = _corner_index(cell[:, l], (off[0], off[1], off[2]),
                                stride[l], use_dense[l], size[l])
            return jnp.take(table[l], idx, axis=0)

        acc = None
        for s in range(n_pairs):
            pair = one(us[s][l]) + one(1.0 - us[s][l])
            acc = pair if acc is None else acc + pair
        if odd:
            single = one(us[-1][l])
            acc = single if acc is None else acc + single
        outs.append(acc / n_samples if n_samples > 1 else acc)
    return jnp.concatenate(outs, axis=-1)


def _encode_residual(table, x, config, key, exact_levels, interp):
    """Rao-Blackwellized 2-row estimator: deterministic max-weight
    corner + one draw from the renormalized residual distribution.

    out = w_m * f_m + (1 - w_m) * f_J,  J ~ w_j / (1 - w_m) over j != m
    E[out] equals the exact interpolation; the variance carries the
    factor (1 - w_m)^2 (often ~0.2 on simplex weights) instead of the
    full stochastic mass of two independent/antithetic draws.
    """
    n = x.shape[0]
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    n_levels = config.n_levels
    n_exact = min(max(exact_levels, 0), n_levels)
    us = jax.random.uniform(key, (n_levels, n))

    # Atom index -> corner offset without materialized (A, 3, N)
    # offset tensors or take_along_axis (both cost real milliseconds at
    # step scale): trilinear atoms are the bits of the index in the
    # _CORNERS meshgrid order; simplex atoms are 3 selects over the
    # per-point lattice path.
    def atom_offset(i, simplex_offsets):
        if interp == 'simplex':
            return jnp.where(
                i[None, :] == 0, simplex_offsets[0],
                jnp.where(i[None, :] == 1, simplex_offsets[1],
                          jnp.where(i[None, :] == 2, simplex_offsets[2],
                                    simplex_offsets[3])))  # (3, N)
        return jnp.stack([(i >> 2) & 1, (i >> 1) & 1, i & 1])

    def gather(l, off):
        idx = _corner_index(cell[:, l], (off[0], off[1], off[2]), stride[l],
                            use_dense[l], size[l])
        return jnp.take(table[l], idx, axis=0)

    outs = []
    for l in range(n_levels):
        if l >= n_levels - n_exact:
            exact = (_exact_level_rows_simplex if interp == 'simplex' else
                     _exact_level_rows)
            outs.append(exact(table, l, cell, frac, stride, use_dense,
                              size, config))
            continue
        if interp == 'simplex':
            simplex_offsets, weights = _simplex_corners(frac[:, l])
        else:
            simplex_offsets = None
            weights = jnp.stack(
                [_corner_weight(frac[:, l], c) for c in _CORNERS])
        m = jnp.argmax(weights, axis=0)  # (N,)
        w_m = jnp.max(weights, axis=0)
        f_det = gather(l, atom_offset(m, simplex_offsets))

        wr = jnp.where(
            jnp.arange(weights.shape[0])[:, None] == m[None], 0.0, weights)
        cum = jnp.cumsum(wr, axis=0) / jnp.maximum(
            wr.sum(axis=0), 1e-12)  # (A, N), last row ~1
        j = (us[l][None] > cum[:-1]).sum(axis=0)  # in [0, A-1], never m
        f_sto = gather(l, atom_offset(j, simplex_offsets))

        w = w_m.astype(table.dtype)[:, None]
        outs.append(w * f_det + (1.0 - w) * f_sto)
    return jnp.concatenate(outs, axis=-1)


def _corner_idx_weights(x, config, interp):
    """Every level's interpolation atoms, materialized: table indices
    (L, A, N) int32 and interpolation weights (L, A, N) fp32 (A = 4
    simplex / 8 trilinear atoms). Computed ONCE per step by the
    sampled-backward forward rule and saved as VJP residuals (8-17 MB at
    the flagship shape) so the backward never re-runs the cell/hash
    geometry — measured cheaper than the recompute it replaces."""
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    idx_levels, w_levels = [], []
    for l in range(config.n_levels):
        if interp == 'simplex':
            offsets, w = _simplex_corners(frac[:, l])
            idx = jnp.stack([
                _corner_index(cell[:, l],
                              (offsets[ci, 0], offsets[ci, 1],
                               offsets[ci, 2]),
                              stride[l], use_dense[l], size[l])
                for ci in range(4)])
        else:
            w = jnp.stack([_corner_weight(frac[:, l], c) for c in _CORNERS])
            idx = jnp.stack([
                _corner_index(cell[:, l], c, stride[l], use_dense[l],
                              size[l]) for c in _CORNERS])
        idx_levels.append(idx)
        w_levels.append(w)
    return jnp.stack(idx_levels), jnp.stack(w_levels)


def _gather_from_atoms(table, idx, w, config):
    """Exact interpolation from materialized atoms, in the MLP compute
    dtype (bf16 on TPU): the consuming matmul casts to bf16 anyway, so
    interpolating there only moves the rounding one op earlier while
    halving every gather/accumulate byte (benchmarks/encode_lab.py).
    Eval paths use the exact fp32 interpolation (key=None)."""
    from autolabel_tpu.ops.mlp import _default_compute_dtype
    dtype = _default_compute_dtype()
    n = idx.shape[2]
    outs = []
    for l in range(config.n_levels):
        table_l = table[l].astype(dtype)
        acc = jnp.zeros((n, config.n_features), dtype)
        for ci in range(idx.shape[1]):
            acc = acc + jnp.take(table_l, idx[l, ci], axis=0) \
                * w[l, ci].astype(dtype)[:, None]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _encode_sampled_bwd(config, interp, bwd_rows, point_frac, table, x, u):
    """Exact-forward / sampled-backward hash-grid encode (wide rows).

    Forward: the exact interpolation (trilinear or simplex). Backward:
    per (point, level), the cotangent is scattered into `bwd_rows[l]`
    corner rows (a per-level tuple, coarsest first) drawn via `u` so
    that E[table gradient] equals the exact gradient (see
    hashgrid_encode docstring). The x and u cotangents are zero — in
    this renderer sample positions carry no parameter gradients
    (z-placement is stop-gradded, renderer.py), so dropping dOut/dx
    loses nothing.
    """
    del u, bwd_rows, point_frac
    idx, w = _corner_idx_weights(x, config, interp)
    return _gather_from_atoms(table, idx, w, config)


def _encode_sampled_bwd_fwd(config, interp, bwd_rows, point_frac, table, x,
                            u):
    idx, w = _corner_idx_weights(x, config, interp)
    return _gather_from_atoms(table, idx, w, config), (idx, w, u)


def _select_backward_points(g, u_sys, k):
    """Systematic resample of k points from p_i ∝ ||g_i|| (cotangent row
    norms). Returns (sel (k,), coef (k,)) with E[sum_sel coef_j * g_sel]
    == sum_i g_i: counts_i = #{grid positions in (cum_{i-1}, cum_i]} has
    E[counts_i] = k * p_i exactly, and coef = counts / (k * p). Points
    with zero cotangent are never drawn (their true gradient is zero).
    top_k compacts the <= k nonzero counts into a static-shape index
    set; padding rows carry coef 0 and scatter nothing. top_k is the
    MEASURED winner for this compaction on TPU (benchmarks/
    select_lab.py, 131k points, k = N/4): 1.9 ms vs 5.9 ms for a
    searchsorted inverse-CDF draw (17 binary-search iterations = 17
    scalar-gather rounds — the gather engine's row latency dwarfs the
    sort) and vs 2.4 ms for a sort-free stride-stratified draw."""
    n = g.shape[0]
    g32 = g.astype(jnp.float32)
    s = jnp.sqrt(jnp.sum(g32 * g32, axis=-1))  # (N,)
    tot = jnp.sum(s)
    p = jnp.where(tot > 0, s / jnp.maximum(tot, 1e-30),
                  jnp.full_like(s, 1.0 / n))
    cum = jnp.cumsum(p)
    cum = cum / cum[-1]  # exact 1.0 tail => total counts == k
    c = jnp.floor(k * cum - u_sys)
    counts = jnp.diff(c, prepend=jnp.asarray(-1.0, c.dtype))
    counts_k, sel = jax.lax.top_k(counts, k)
    coef = counts_k / (k * jnp.maximum(p[sel], 1e-30))
    return sel, coef


def _pick_rows(rows, i):
    """rows (A, N) -> (N,): per-column selection by atom index i (N,).
    A is tiny (4/8), so chained selects beat a take_along_axis gather."""
    out = rows[0]
    for a in range(1, rows.shape[0]):
        out = jnp.where(i == a, rows[a], out)
    return out


def _encode_sampled_bwd_bwd(config, interp, bwd_rows, point_frac, res, g):
    idx, w, u = res  # (L, A, N) int32, (L, A, N) fp32, (L, N[+1])
    f = config.n_features
    n = idx.shape[2]
    n_points = n  # primal x row count, for the zero x-cotangent
    # The bf16 training forward hands back a bf16 cotangent; the table
    # gradient accumulates in fp32 regardless (scatter-add is row-
    # latency-bound, so the wider dtype costs nothing, and collisions
    # on coarse levels would otherwise compound bf16 rounding).
    g = g.astype(jnp.float32)
    cot = jnp.zeros((config.n_levels, config.table_size, f), g.dtype)

    uc = u[:, :n]
    g_sc = g
    if point_frac < 1.0:
        k = max(1, int(round(point_frac * n)))
        sel, coef = _select_backward_points(g, u[0, n], k)
        g_sc = jnp.take(g, sel, axis=0) * coef[:, None].astype(g.dtype)
        idx = jnp.take(idx, sel, axis=2)
        w = jnp.take(w, sel, axis=2)
        uc = jnp.take(uc, sel, axis=1)
        n = k

    for l in range(config.n_levels):
        g_l = g_sc[:, l * f:(l + 1) * f]
        idx_l, w_l = idx[l], w[l]  # (A, N)
        n_atoms = w_l.shape[0]
        if bwd_rows[l] >= n_atoms:
            # Exact scatter: every atom at its exact weight (the true
            # VJP of the interpolation on this level). Used for coarse
            # levels whose few distinct rows make the scatter cheap and
            # whose gradients decide the table's global layout.
            for ci in range(n_atoms):
                cot = cot.at[l, idx_l[ci]].add(w_l[ci][:, None] * g_l)
        elif bwd_rows[l] == 2:
            # Rao-Blackwellized residual pair (mirrors _encode_residual).
            m = jnp.argmax(w_l, axis=0)
            w_m = jnp.max(w_l, axis=0)
            cot = cot.at[l, _pick_rows(idx_l, m)].add(w_m[:, None] * g_l)
            wr = jnp.where(
                jnp.arange(n_atoms)[:, None] == m[None], 0.0, w_l)
            cum = jnp.cumsum(wr, axis=0) / jnp.maximum(
                wr.sum(axis=0), 1e-12)
            j = (uc[l][None] > cum[:-1]).sum(axis=0)
            cot = cot.at[l, _pick_rows(idx_l, j)].add(
                (1.0 - w_m)[:, None] * g_l)
        else:
            # One importance draw J ~ w: scattered mass w_J / p_J = 1.
            cum = jnp.cumsum(w_l[:-1], axis=0)
            j = (uc[l][None] > cum).sum(axis=0)
            cot = cot.at[l, _pick_rows(idx_l, j)].add(g_l)
    return (cot, jnp.zeros((n_points, 3), jnp.float32),
            jnp.zeros_like(u))


_encode_sampled_bwd.defvjp(_encode_sampled_bwd_fwd, _encode_sampled_bwd_bwd)


def _one_corner_rows(table, l, cell, stride, use_dense, size, config,
                     upper_l):
    """Gather the one level-l corner row selected by upper_l (3, N)."""
    idx = _corner_index(cell[:, l], (upper_l[0], upper_l[1], upper_l[2]),
                        stride[l], use_dense[l], size[l])
    return jnp.take(table[l], idx, axis=0)  # (N, F)


def _exact_level_rows(table, l, cell, frac, stride, use_dense, size,
                      config):
    """Full 8-corner trilinear interpolation of one level (rows layout)."""
    acc = jnp.zeros((cell.shape[-1], config.n_features), table.dtype)
    for corner in _CORNERS:
        idx = _corner_index(cell[:, l], corner, stride[l], use_dense[l],
                            size[l])
        weight = _corner_weight(frac[:, l], corner).astype(table.dtype)
        acc = acc + jnp.take(table[l], idx, axis=0) * weight[:, None]
    return acc


def _encode_stochastic(table, x, config, key, n_samples, exact_levels=0):
    """Average of n_samples sampled-corner gathers; E[output] == trilinear.

    The upper corner on each axis is picked independently with
    probability frac, so P(corner c) is exactly its trilinear weight and
    the gathered row (weight 1) is an unbiased estimator of the
    interpolated feature. Backward scatters into n_samples rows instead
    of 8. Draws are antithetic pairs (u, 1-u): both uniform, negatively
    correlated, so pair averages beat independent draws. The finest
    `exact_levels` levels are interpolated exactly.
    """
    n = x.shape[0]
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    n_levels = config.n_levels
    n_exact = min(max(exact_levels, 0), n_levels)

    n_pairs, odd = divmod(n_samples, 2)
    n_draw_keys = max(n_pairs + odd, 1)
    keys = jax.random.split(key, n_draw_keys)
    us = [jax.random.uniform(keys[s], (3, n_levels, n))
          for s in range(n_pairs + odd)]

    if config.n_features % 8 == 0:
        def level_stochastic(l):
            def one(u_l):
                upper = (u_l < frac[:, l]).astype(jnp.int32)
                return _one_corner_rows(table, l, cell, stride, use_dense,
                                        size, config, upper)
            acc = None
            for s in range(n_pairs):
                pair = one(us[s][:, l]) + one(1.0 - us[s][:, l])
                acc = pair if acc is None else acc + pair
            if odd:
                single = one(us[-1][:, l])
                acc = single if acc is None else acc + single
            return acc / n_samples if n_samples > 1 else acc

        outs = []
        for l in range(n_levels):
            if l >= n_levels - n_exact:
                outs.append(_exact_level_rows(table, l, cell, frac, stride,
                                              use_dense, size, config))
            else:
                outs.append(level_stochastic(l))
        return jnp.concatenate(outs, axis=-1)

    # Narrow rows (reference 16x2 shape): lanes-layout sampled gathers.
    # exact_levels is honored by selecting exact columns afterwards —
    # narrow tables are not the perf path, correctness over speed here.
    level = jnp.arange(n_levels, dtype=jnp.int32)[:, None]
    table_ft = table.transpose(0, 2, 1)  # (L, F, T)
    f_idx = jnp.arange(config.n_features)[None, :, None]

    def draw_lanes(u):
        upper = (u < frac).astype(jnp.int32)  # (3, L, N)
        idx = _corner_index(cell, (upper[0], upper[1], upper[2]), stride,
                            use_dense, size)  # (L, N)
        return table_ft[level[:, None, :], f_idx, idx[:, None, :]]

    acc = None
    for s in range(n_pairs):
        pair = draw_lanes(us[s]) + draw_lanes(1.0 - us[s])
        acc = pair if acc is None else acc + pair
    if odd:
        single = draw_lanes(us[-1])
        acc = single if acc is None else acc + single
    if n_samples > 1:
        acc = acc / n_samples
    out = acc.reshape(config.out_dim, n).T  # (N, L*F)
    if n_exact:
        exact = _encode_lanes(table, x, config)
        split = (n_levels - n_exact) * config.n_features
        out = jnp.concatenate([out[:, :split], exact[:, split:]], axis=-1)
    return out


def _encode_lanes(table, x, config):
    n = x.shape[0]
    cell, frac, stride, use_dense, size = _grid_geometry(x, config)
    level = jnp.arange(config.n_levels, dtype=jnp.int32)[:, None]  # (L, 1)
    table_ft = table.transpose(0, 2, 1)  # (L, F, T), lanes on T

    out = jnp.zeros((config.n_levels, config.n_features, n),
                    dtype=table.dtype)
    f_idx = jnp.arange(config.n_features)[None, :, None]
    for corner in _CORNERS:
        idx = _corner_index(cell, corner, stride, use_dense,
                            size)  # (L, N)
        weight = _corner_weight(frac, corner).astype(table.dtype)
        feats = table_ft[level[:, None, :], f_idx, idx[:, None, :]]
        out = out + feats * weight[:, None, :]

    # (L, F, N) -> (N, L*F)
    return out.reshape(config.out_dim, n).T
