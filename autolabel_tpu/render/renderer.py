"""Volumetric rendering with dense, static-shape sampling.

TPU-native replacement for torch-ngp's NeRFRenderer.run (reference call
sites: autolabel/trainer.py:64-70,102-107; scripts/render.py:96-102). The
CUDA path compacts live rays dynamically; XLA wants static shapes, so every
ray carries a fixed [num_steps (+ upsample_steps)] sample grid and dead
samples are masked, with compositing as closed-form exp/cumsum — everything
fuses into a handful of kernels around the field matmuls.

Output contract (keys consumed by trainer.py:72-116 and
scripts/language/pointcloud.py:65-68): image, depth, semantic,
semantic_features, depth_variance, coordinates_map, weights_sum.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

MIN_NEAR = 0.05


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    num_steps: int = 128
    upsample_steps: int = 0
    perturb: bool = False
    bg_color: float = 1.0
    # Proposal sampling (field.config.proposal must be on): a cheap
    # density MLP takes `proposal_steps` uniform samples and places the
    # main field's `num_steps` samples by inverse-CDF — ~4x fewer
    # hash-grid queries at equal quality (mip-NeRF-360 style). 0 = off.
    proposal_steps: int = 0
    # Stochastic-corner hash-grid gathers during training (requires a
    # PRNG key): each (sample, level) gathers `stochastic_corners` cell
    # corners, each drawn with probability equal to its trilinear weight,
    # and averages them — an unbiased estimator of the interpolation at
    # 8/k fewer gather/scatter rows. 0/False disables (exact trilinear);
    # 2 halves the estimator variance for ~1.5x the encode cost of 1.
    # Eval paths (key=None) always interpolate exactly.
    stochastic_corners: int = 2
    # With stochastic corners on, interpolate this many of the FINEST
    # grid levels exactly (they carry the detail and most of the
    # estimator variance); coarser levels stay stochastic.
    stochastic_exact_levels: int = 0
    # Rao-Blackwellized 2-row estimator instead of the antithetic pair
    # (requires stochastic_corners == 2): the max-weight corner enters
    # deterministically, one draw covers the renormalized remainder —
    # same gather rows, substantially lower estimator variance
    # (ops/encoders.hashgrid_encode residual mode).
    stochastic_residual: bool = False
    # Exact-forward / sampled-backward hash gathers (1 or 2 scatter rows
    # per point/level; 0 disables): the forward interpolates exactly and
    # only the backward scatter is sampled — unbiased gradients with no
    # forward noise (ops/encoders.hashgrid_encode sampled_backward).
    # Takes precedence over stochastic_corners when set.
    sampled_backward: int = 0
    # Magnitude-weighted POINT subsample of the sampled backward scatter
    # (fraction in (0, 1]; 1.0 = every point scatters). Cuts backward
    # scatter rows — the measured step bottleneck — by drawing
    # ceil(fraction * N) points ∝ cotangent norm with inverse-probability
    # weighting (unbiased; ops/encoders.hashgrid_encode backward_points).
    backward_points: float = 1.0
    # With an occupancy grid, probe it along each ray and shrink
    # [near, far] to the occupied span before sampling — the TPU-shaped
    # version of torch-ngp's empty-space skipping (samples concentrate
    # instead of compacting). Costs one tiny (N, 32) grid gather.
    # OPT-IN: an occupied shell thinner than the probe spacing can be
    # missed entirely, shrinking [near, far] past real geometry per-ray —
    # unlike the always-on sigma masking, which only ever zeros empty
    # cells. Big win on mostly-empty scenes (sphere: halves depth error),
    # risky on thin-structure content; the sampler never shrinks unless
    # at least one probe hits occupied space.
    occupancy_near_far: bool = False
    occupancy_probes: int = 32
    # Per-grid-level output scales (len == n_levels) — the BARF-style
    # coarse-to-fine window for joint pose refinement: with only coarse
    # levels active the field CANNOT absorb a sub-cell camera
    # misalignment, keeping the photometric pose gradient informative;
    # fine levels are enabled phase by phase (train/pose_refine.py).
    # None = all levels active.
    level_window: tuple = None


def ray_aabb_intersect(rays_o, rays_d, bound, min_near=MIN_NEAR):
    """Entry/exit distances of rays against the [-bound, bound]^3 cube."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9,
                            jnp.full_like(rays_d, 1e-9), rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    near = jnp.minimum(t0, t1).max(axis=-1)
    far = jnp.maximum(t0, t1).min(axis=-1)
    near = jnp.maximum(near, min_near)
    far = jnp.maximum(far, near + 1e-4)
    return near[..., None], far[..., None]


def shrink_near_far(occupancy, rays_o, rays_d, near, far, bound,
                    n_probe=32):
    """Tighten per-ray [near, far] to the span of occupied+trained cells.

    occupancy: (density_grid, trained_mask, threshold); near/far: (N, 1).
    Probes the grid at n_probe equally spaced points per ray and brackets
    the first/last occupied probe with a one-step margin. Rays with no
    occupied probe keep the full interval (their sigma is masked to zero
    downstream anyway).
    """
    density_grid, trained_mask, threshold = occupancy
    r = density_grid.shape[0]
    frac = jnp.linspace(0.0, 1.0, n_probe)
    t = near + (far - near) * frac[None, :]  # (N, P)
    xyz = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
    idx = jnp.clip(((xyz + bound) / (2 * bound) * r).astype(jnp.int32),
                   0, r - 1)
    occ = (density_grid[idx[..., 0], idx[..., 1], idx[..., 2]]
           > threshold) & trained_mask[idx[..., 0], idx[..., 1],
                                       idx[..., 2]]  # (N, P) bool
    any_occ = occ.any(axis=-1, keepdims=True)
    first = jnp.argmax(occ, axis=-1)
    last = n_probe - 1 - jnp.argmax(occ[:, ::-1], axis=-1)
    step = 1.0 / (n_probe - 1)
    lo = jnp.clip((first - 1) * step, 0.0, 1.0)[:, None]
    hi = jnp.clip((last + 1) * step, 0.0, 1.0)[:, None]
    new_near = jnp.where(any_occ, near + (far - near) * lo, near)
    new_far = jnp.where(any_occ, near + (far - near) * hi, far)
    return new_near, jnp.maximum(new_far, new_near + 1e-4)


def sample_pdf(z_mid, weights, n_samples, key):
    """Inverse-CDF importance sampling over coarse-pass weights.

    z_mid: (N, S-1) bin centers; weights: (N, S-1).
    Returns (N, n_samples) new depths: each u lands in the atom whose
    cumulative-mass interval contains it and returns that atom's
    (jittered) bin center — nearest-atom inverse-CDF sampling; the
    per-step perturbation of the proposal sample positions is what
    smooths the discretization, matching the stratified-jitter scheme.

    Gather-free on purpose: z_mid is sorted ascending, so selecting atom
    `#{j : cdf_j <= u} - 1` equals a masked MAX over the (S small) dense
    comparison matrix. take_along_axis here lowers to per-element
    gathers that cost real milliseconds per step on TPU (same pathology
    as ops/encoders._encode_residual's corner selection); the masked
    reduction is pure VPU work and fuses.
    """
    weights = weights + 1e-5
    pdf = weights / weights.sum(axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if key is None:
        u = jnp.linspace(0.0, 1.0, n_samples + 2)[1:-1]
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples))

    # z of the selected atom: max over {j : cdf_j <= u} of z_mid_j
    # (cdf_0 = 0 <= u always, so the -inf fill never survives).
    selectable = cdf[..., None, :-1] <= u[..., :, None]  # (N, n, S-1)
    return jnp.where(selectable, z_mid[..., None, :],
                     -jnp.inf).max(axis=-1)


def _interlevel_loss(z_main, d_main, w_main, z_prop, d_prop, w_prop):
    """mip-NeRF-360 proposal supervision: each main interval's weight must
    be covered by the proposal weights overlapping it. Dense (S_m, S_p)
    overlap matrix per ray — tiny, VPU-friendly.

    z_*: sample starts (N, S); d_*: interval lengths; w_*: weights.
    """
    m0 = z_main[..., :, None]
    m1 = (z_main + d_main)[..., :, None]
    p0 = z_prop[..., None, :]
    p1 = (z_prop + d_prop)[..., None, :]
    overlap = (jnp.minimum(m1, p1) - jnp.maximum(m0, p0)) > 0
    bound = (overlap * w_prop[..., None, :]).sum(axis=-1)  # (N, S_m)
    excess = jnp.maximum(w_main - bound, 0.0)
    return (excess ** 2 / (bound + 1e-4)).mean()


def _composite_weights(sigma, deltas):
    """Transmittance-weighted sample weights, fully vectorized.

    w_i = (1 - exp(-sigma_i d_i)) * exp(-sum_{j<i} sigma_j d_j)
    """
    tau = sigma * deltas
    accum = jnp.cumsum(tau, axis=-1) - tau  # exclusive prefix sum
    transmittance = jnp.exp(-accum)
    alpha = 1.0 - jnp.exp(-tau)
    return alpha * transmittance


def render_rays(field, params, rays_o, rays_d, direction_norms,
                key=None, options=RenderOptions(), occupancy=None):
    """Render a flat batch of rays.

    rays_o, rays_d: (N, 3); direction_norms: (N, 1) — the z-depth
    conversion factor |(u, v, 1)| from the ray generator.
    occupancy: optional (density_grid (R,R,R), trained_mask (R,R,R))
    from OccupancyGrid.state() + its threshold; samples in empty or
    untrained cells get sigma 0 (the TPU-shaped equivalent of torch-ngp's
    occupancy skipping — masking instead of compaction).
    """
    c = field.config
    bound = c.bound
    n_rays = rays_o.shape[0]
    num_steps = options.num_steps

    k_coarse = k_fine = k_enc = None
    if key is not None and options.perturb:
        key, k_coarse, k_fine, k_enc = jax.random.split(key, 4)
    if not options.stochastic_corners and not options.sampled_backward:
        k_enc = None

    near, far = ray_aabb_intersect(rays_o, rays_d, bound)
    if occupancy is not None and options.occupancy_near_far:
        near, far = shrink_near_far(occupancy, rays_o, rays_d, near, far,
                                    bound, options.occupancy_probes)
    sample_dist = (far - near) / num_steps  # (N, 1)

    proposal_info = None
    if options.proposal_steps > 0:
        sp = options.proposal_steps
        dist_p = (far - near) / sp
        z_p = near + (far - near) * jnp.linspace(0.0, 1.0, sp)[None, :]
        if k_coarse is not None:
            z_p = z_p + (jax.random.uniform(k_coarse, z_p.shape) - 0.5) \
                * dist_p
        xyz_p = rays_o[:, None, :] + z_p[..., None] * rays_d[:, None, :]
        sigma_p = field.proposal_sigma(
            params, jnp.clip(xyz_p, -bound, bound).reshape(-1, 3))
        sigma_p = sigma_p.reshape(n_rays, sp)
        deltas_p = jnp.concatenate(
            [jnp.diff(z_p, axis=-1),
             jnp.broadcast_to(dist_p, (n_rays, 1))], axis=-1)
        w_p = _composite_weights(sigma_p, deltas_p)
        proposal_info = (z_p, deltas_p, w_p)

        z_mid = 0.5 * (z_p[..., 1:] + z_p[..., :-1])
        z = sample_pdf(z_mid, jax.lax.stop_gradient(w_p[..., :-1]),
                       num_steps, k_fine)
        z = jnp.sort(z, axis=-1)
    else:
        z = near + (far - near) * jnp.linspace(0.0, 1.0, num_steps)[None, :]
        if k_coarse is not None:
            z = z + (jax.random.uniform(k_coarse, z.shape) - 0.5) \
                * sample_dist

    n_corner_samples = max(1, int(options.stochastic_corners))

    def query_density(z_vals, enc_key=None):
        xyz = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
        xyz = jnp.clip(xyz, -bound, bound)
        flat = xyz.reshape(-1, 3)
        sigma, geo = field.density(params, flat, key=enc_key,
                                   n_samples=n_corner_samples,
                                   exact_levels=options.
                                   stochastic_exact_levels,
                                   residual=options.stochastic_residual,
                                   sampled_backward=options.sampled_backward,
                                   level_window=options.level_window,
                                   backward_points=options.backward_points)
        sigma = _mask_sigma(flat, sigma)
        s = z_vals.shape[1]
        return (xyz, sigma.reshape(n_rays, s),
                geo.reshape(n_rays, s, -1))

    def _mask_sigma(flat, sigma):
        if occupancy is None:
            return sigma
        density_grid, trained_mask, threshold = occupancy
        r = density_grid.shape[0]
        idx = jnp.clip(((flat + bound) / (2 * bound) * r).astype(jnp.int32),
                       0, r - 1)
        occupied = density_grid[idx[:, 0], idx[:, 1], idx[:, 2]] > threshold
        trained = trained_mask[idx[:, 0], idx[:, 1], idx[:, 2]]
        return sigma * (occupied & trained).astype(sigma.dtype)

    # Fused head stack (ops/heads_pallas.py): sigma, rgb, and semantics
    # come out of one VMEM-resident kernel at query time. Only the
    # no-upsample path qualifies (upsampling interleaves a second
    # density query with a merge before the color/semantic heads).
    use_fused = (c.heads_impl == 'pallas' and options.upsample_steps == 0
                 and field.fused_heads_available(params))
    fused_outputs = None
    if use_fused:
        xyz = rays_o[:, None, :] + z[..., None] * rays_d[:, None, :]
        xyz = jnp.clip(xyz, -bound, bound)
        flat = xyz.reshape(-1, 3)
        dirs_flat = jnp.broadcast_to(
            rays_d[:, None, :], (n_rays, num_steps, 3)).reshape(-1, 3)
        sigma_f, rgb_f, logits_f, feats_f = field.all_heads(
            params, flat, dirs_flat, key=k_enc,
            n_samples=n_corner_samples,
            exact_levels=options.stochastic_exact_levels,
            residual=options.stochastic_residual,
            sampled_backward=options.sampled_backward,
            level_window=options.level_window,
            backward_points=options.backward_points)
        sigma = _mask_sigma(flat, sigma_f).reshape(n_rays, num_steps)
        fused_outputs = (rgb_f, logits_f, feats_f)
    else:
        xyz, sigma, geo = query_density(z, enc_key=k_enc)

    if not use_fused and options.upsample_steps > 0:
        # Importance-sample extra depths from the coarse weights
        # (gradients stopped), then merge-sort and gather — no re-query
        # of the coarse samples.
        deltas = jnp.diff(z, axis=-1)
        deltas = jnp.concatenate(
            [deltas, jnp.broadcast_to(sample_dist, (n_rays, 1))], axis=-1)
        w_coarse = _composite_weights(jax.lax.stop_gradient(sigma), deltas)
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_new = sample_pdf(z_mid, w_coarse[..., :-1],
                           options.upsample_steps, k_fine)
        z_new = jax.lax.stop_gradient(z_new)
        k_enc2 = None if k_enc is None else jax.random.fold_in(k_enc, 1)
        xyz_new, sigma_new, geo_new = query_density(z_new, enc_key=k_enc2)

        z_all = jnp.concatenate([z, z_new], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z = jnp.take_along_axis(z_all, order, axis=-1)
        sigma = jnp.take_along_axis(
            jnp.concatenate([sigma, sigma_new], axis=-1), order, axis=-1)
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, geo_new], axis=1), order[..., None], axis=1)
        xyz = jnp.take_along_axis(
            jnp.concatenate([xyz, xyz_new], axis=1), order[..., None], axis=1)

    total_steps = z.shape[1]
    deltas = jnp.diff(z, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.broadcast_to(sample_dist, (n_rays, 1))], axis=-1)
    weights = _composite_weights(sigma, deltas)  # (N, S)
    weights_sum = weights.sum(axis=-1)

    interlevel = None
    if proposal_info is not None:
        z_p, deltas_p, w_p = proposal_info
        # Proposal learns to cover the main field's weights; the main
        # field is not influenced (stop-grad on the main side).
        interlevel = _interlevel_loss(jax.lax.stop_gradient(z),
                                      jax.lax.stop_gradient(deltas),
                                      jax.lax.stop_gradient(weights),
                                      z_p, deltas_p, w_p)

    # Per-sample head evaluations on the flat (N*S, .) layout (already
    # done at query time on the fused path).
    if use_fused:
        rgb_f, logits_f, feats_f = fused_outputs
        rgb = rgb_f.reshape(n_rays, total_steps, 3)
        sem_logits = logits_f.astype(jnp.float32).reshape(
            n_rays, total_steps, -1)
        sem_features = feats_f.reshape(n_rays, total_steps, -1)
    else:
        geo_flat = geo.reshape(-1, geo.shape[-1])
        dirs = jnp.broadcast_to(rays_d[:, None, :],
                                (n_rays, total_steps, 3))
        rgb = field.color(params, dirs.reshape(-1, 3), geo_flat)
        rgb = rgb.reshape(n_rays, total_steps, 3)
        # Composite raw class logits (softmax/CE happen in the loss): the
        # standard semantic-NeRF formulation, numerically kinder than
        # compositing probabilities.
        logits, sem_features = field.semantic(params, geo_flat)
        sem_logits = logits.astype(jnp.float32).reshape(
            n_rays, total_steps, -1)
        sem_features = sem_features.reshape(n_rays, total_steps, -1)

    w = weights[..., None]
    image = (w * rgb).sum(axis=1) + (1.0 - weights_sum[:, None]) * \
        options.bg_color
    t_exp = (weights * z).sum(axis=-1)
    depth = t_exp / direction_norms[:, 0]
    z_depth = z / direction_norms
    depth_variance = (weights * (z_depth - depth[:, None]) ** 2).sum(axis=-1)

    out = {
        'image': image,
        'depth': depth,
        'depth_variance': depth_variance,
        'semantic': (w * sem_logits).sum(axis=1),
        'semantic_features': (w * sem_features).sum(axis=1),
        'coordinates_map': (w * xyz).sum(axis=1),
        'weights_sum': weights_sum,
    }
    if interlevel is not None:
        out['interlevel'] = interlevel
    return out


class StagedRenderer:
    """Memory-bounded full-frame rendering: chunk rays, reuse one compiled
    kernel per chunk shape (the 'staged=True' path of the reference)."""

    def __init__(self, field, options=None, max_ray_batch=4096):
        self.field = field
        self.options = options or RenderOptions()
        self.max_ray_batch = max_ray_batch

        def chunk_fn(params, o, d, dn):
            out = render_rays(field, params, o, d, dn,
                              options=self.options)
            out.pop('interlevel', None)  # per-chunk scalar, training-only
            return out

        self._chunk_fn = jax.jit(chunk_fn)

    def render(self, params, rays_o, rays_d, direction_norms):
        """rays_*: (..., 3) arrays of any leading shape; returns dict of
        DEVICE arrays with the same leading shape.

        All chunks are dispatched asynchronously and concatenated ON
        DEVICE — no host fetch happens here. The previous design
        device_get every 4096-ray chunk, which serialized one
        host<->device round trip per chunk; over a tunneled TPU (single-
        digit MB/s, tens-of-ms RTT) a 640x480 frame = 75 chunks paid 75
        round trips and dominated the preview latency (measured r4:
        14.8-22.5 s volumetric preview RTT). Callers fetch once — and
        should downcast first (uint8 rgb, f16 depth: backend._fetch_frame)
        so the fetch moves 5x fewer bytes."""
        lead_shape = rays_o.shape[:-1]
        o = np.asarray(rays_o, dtype=np.float32).reshape(-1, 3)
        d = np.asarray(rays_d, dtype=np.float32).reshape(-1, 3)
        dn = np.asarray(direction_norms, dtype=np.float32).reshape(-1, 1)
        n = o.shape[0]
        chunk = self.max_ray_batch
        padded = ((n + chunk - 1) // chunk) * chunk
        if padded != n:
            pad = padded - n
            o = np.concatenate([o, np.broadcast_to(o[-1:], (pad, 3))])
            d = np.concatenate([d, np.broadcast_to(d[-1:], (pad, 3))])
            dn = np.concatenate([dn, np.broadcast_to(dn[-1:], (pad, 1))])

        outs = []
        for start in range(0, padded, chunk):
            sl = slice(start, start + chunk)
            outs.append(self._chunk_fn(params, o[sl], d[sl], dn[sl]))
        if len(outs) == 1:
            merged = {k: outs[0][k][:n] for k in outs[0]}
        else:
            merged = {
                k: jnp.concatenate([chunk_out[k] for chunk_out in outs])[:n]
                for k in outs[0]
            }
        return {
            k: v.reshape(*lead_shape, *v.shape[1:])
            for k, v in merged.items()
        }
