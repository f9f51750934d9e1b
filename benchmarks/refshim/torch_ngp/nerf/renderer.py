"""NeRFRenderer stand-in.

The real class lives in the absent torch_ngp submodule; this rebuilds the
batched-sampling render path its call sites imply (SURVEY.md §2.2 N7,
autolabel/trainer.py:64-70,102-107): AABB near/far, uniform stratified
samples, optional importance upsampling, transmittance compositing of
rgb / z-depth / semantic logits / semantic features. cuda_ray stays
False in autolabel (model_utils.py:72), so the occupancy-grid march is
not needed; mark_untrained_grid is a no-op hook.
"""
import torch
import torch.nn as nn

MIN_NEAR = 0.05


def sample_pdf(z_mid, weights, n_samples, det=False):
    """Inverse-CDF sampling over coarse weights (torch)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(dim=-1, keepdim=True)
    cdf = torch.cumsum(pdf, dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)
    if det:
        u = torch.linspace(0.0, 1.0, n_samples + 2,
                           device=cdf.device)[1:-1]
        u = u.expand(*cdf.shape[:-1], n_samples)
    else:
        u = torch.rand(*cdf.shape[:-1], n_samples, device=cdf.device)
    inds = torch.searchsorted(cdf, u.contiguous(), right=True)
    below = (inds - 1).clamp(0, cdf.shape[-1] - 1)
    above = inds.clamp(0, cdf.shape[-1] - 1)
    cdf_lo = torch.gather(cdf, -1, below)
    cdf_hi = torch.gather(cdf, -1, above)
    z_lo = torch.gather(z_mid, -1, below.clamp(0, z_mid.shape[-1] - 1))
    z_hi = torch.gather(z_mid, -1, (above - 1).clamp(0, z_mid.shape[-1] - 1))
    denom = torch.where(cdf_hi - cdf_lo < 1e-5, torch.ones_like(cdf_lo),
                        cdf_hi - cdf_lo)
    t = (u - cdf_lo) / denom
    return z_lo + t * (z_hi - z_lo)


class NeRFRenderer(nn.Module):

    def __init__(self, bound=1.0, cuda_ray=False, density_scale=1,
                 bg_radius=0, **kwargs):
        super().__init__()
        self.bound = bound
        self.cuda_ray = cuda_ray
        self.density_scale = density_scale
        self.bg_radius = bg_radius

    def mark_untrained_grid(self, poses, intrinsics):
        pass  # occupancy grid only exists on the cuda_ray path

    # -- core ----------------------------------------------------------

    def _near_far(self, rays_o, rays_d):
        inv_d = 1.0 / torch.where(rays_d.abs() < 1e-9,
                                  torch.full_like(rays_d, 1e-9), rays_d)
        t0 = (-self.bound - rays_o) * inv_d
        t1 = (self.bound - rays_o) * inv_d
        near = torch.minimum(t0, t1).amax(dim=-1)
        far = torch.maximum(t0, t1).amin(dim=-1)
        near = near.clamp_min(MIN_NEAR)
        far = torch.maximum(far, near + 1e-4)
        return near[:, None], far[:, None]

    def run(self, rays_o, rays_d, direction_norms, num_steps=128,
            upsample_steps=0, bg_color=None, perturb=False):
        n = rays_o.shape[0]
        device = rays_o.device
        near, far = self._near_far(rays_o, rays_d)
        sample_dist = (far - near) / num_steps

        z = near + (far - near) * torch.linspace(0.0, 1.0, num_steps,
                                                 device=device)[None, :]
        if perturb:
            z = z + (torch.rand_like(z) - 0.5) * sample_dist

        def query(z_vals):
            xyz = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
            xyz = xyz.clamp(-self.bound, self.bound)
            out = self.density(xyz.reshape(-1, 3))
            s = z_vals.shape[1]
            return (xyz, out['sigma'].view(n, s),
                    out['geo_feat'].view(n, s, -1))

        xyz, sigma, geo = query(z)

        if upsample_steps > 0:
            with torch.no_grad():
                deltas = torch.cat(
                    [z[:, 1:] - z[:, :-1],
                     sample_dist.expand(n, 1)], dim=-1)
                tau = sigma * deltas * self.density_scale
                accum = torch.cumsum(tau, dim=-1) - tau
                w = (1.0 - torch.exp(-tau)) * torch.exp(-accum)
                z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
                z_new = sample_pdf(z_mid, w[:, :-1], upsample_steps,
                                   det=not perturb)
            xyz_new, sigma_new, geo_new = query(z_new)
            z = torch.cat([z, z_new], dim=-1)
            z, order = torch.sort(z, dim=-1)
            sigma = torch.gather(torch.cat([sigma, sigma_new], -1), -1,
                                 order)
            geo = torch.gather(
                torch.cat([geo, geo_new], 1), 1,
                order[..., None].expand(-1, -1, geo.shape[-1]))
            xyz = torch.gather(torch.cat([xyz, xyz_new], 1), 1,
                               order[..., None].expand(-1, -1, 3))

        total = z.shape[1]
        deltas = torch.cat([z[:, 1:] - z[:, :-1],
                            sample_dist.expand(n, 1)], dim=-1)
        tau = sigma * deltas * self.density_scale
        accum = torch.cumsum(tau, dim=-1) - tau
        weights = (1.0 - torch.exp(-tau)) * torch.exp(-accum)
        weights_sum = weights.sum(dim=-1)

        geo_flat = geo.reshape(-1, geo.shape[-1])
        dirs = rays_d[:, None, :].expand(n, total, 3).reshape(-1, 3)
        rgb = self.color(xyz.reshape(-1, 3), dirs,
                         geo_feat=geo_flat).view(n, total, 3)
        sem_logits, sem_features = self.semantic(geo_flat,
                                                 sigma.reshape(-1, 1))
        sem_logits = sem_logits.view(n, total, -1)
        sem_features = sem_features.view(n, total, -1)

        w = weights[..., None]
        image = (w * rgb).sum(dim=1)
        if bg_color is None:
            bg_color = 1.0
        image = image + (1.0 - weights_sum[:, None]) * bg_color
        t_exp = (weights * z).sum(dim=-1)
        depth = t_exp / direction_norms[:, 0]
        z_depth = z / direction_norms
        depth_variance = (weights *
                          (z_depth - depth[:, None]) ** 2).sum(dim=-1)

        return {
            'image': image,
            'depth': depth,
            'depth_variance': depth_variance,
            'semantic': (w * sem_logits).sum(dim=1),
            'semantic_features': (w * sem_features).sum(dim=1),
            'coordinates_map': (w * xyz).sum(dim=1),
            'weights_sum': weights_sum,
        }

    def render(self, rays_o, rays_d, direction_norms, staged=False,
               bg_color=None, perturb=False, num_steps=128,
               upsample_steps=0, max_ray_batch=4096, **kwargs):
        """kwargs absorbs the reference's opt namespace splat
        (trainer.py:64-70: rand_pose, color_space, loss weights...)."""
        lead_shape = rays_o.shape[:-1]
        o = rays_o.reshape(-1, 3)
        d = rays_d.reshape(-1, 3)
        dn = direction_norms.reshape(-1, 1)
        if not staged:
            out = self.run(o, d, dn, num_steps=num_steps,
                           upsample_steps=upsample_steps, bg_color=bg_color,
                           perturb=perturb)
        else:
            chunks = []
            with torch.no_grad():
                for start in range(0, o.shape[0], max_ray_batch):
                    sl = slice(start, start + max_ray_batch)
                    chunks.append(
                        self.run(o[sl], d[sl], dn[sl], num_steps=num_steps,
                                 upsample_steps=upsample_steps,
                                 bg_color=bg_color, perturb=perturb))
            out = {
                k: torch.cat([c[k] for c in chunks]) for k in chunks[0]
            }
        return {
            k: v.reshape(*lead_shape, *v.shape[1:]) for k, v in out.items()
        }
