"""Occupancy grid: density-bitfield masking for the volumetric renderer.

TPU-native replacement for torch-ngp's CUDA occupancy-grid machinery
(SURVEY.md N7: density grid update, mark_untrained_grid, sample skipping —
reference call sites autolabel/trainer.py:21-23,176-177). The CUDA path
compacts samples into surviving cells; on TPU the grid instead MASKS the
density of samples in empty/untrained cells (static shapes, one gather),
which kills floaters in unseen space and lets transmittance-based weights
vanish there. EMA-decayed updates follow instant-ngp's schedule.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class OccupancyGridConfig:
    resolution: int = 128
    decay: float = 0.95
    # Density threshold under which a cell is considered empty
    # (instant-ngp's 0.01 * 1024 / sqrt(3) heuristic, order-of-magnitude).
    threshold: float = 0.01


class OccupancyGrid:
    """Grid state is a plain (R, R, R) float32 array of EMA'd densities
    plus a bool 'trained' mask; both live on device."""

    def __init__(self, config: OccupancyGridConfig, bound: float):
        self.config = config
        self.bound = bound
        r = config.resolution
        self.density = jnp.zeros((r, r, r), jnp.float32)
        # Cells never observed by any training camera are permanently
        # masked (mark_untrained_grid); default everything trainable.
        self.trained = jnp.ones((r, r, r), dtype=bool)
        self._update_fn = None

    # -- coordinates -------------------------------------------------------

    def cell_centers(self):
        """(R^3, 3) world-space centers of all cells."""
        r = self.config.resolution
        axis = (jnp.arange(r) + 0.5) / r * (2 * self.bound) - self.bound
        grid = jnp.stack(jnp.meshgrid(axis, axis, axis, indexing='ij'),
                         axis=-1)
        return grid.reshape(-1, 3)

    def cell_indices(self, xyz):
        """World points -> flat-less (i, j, k) int32 cell indices, clipped."""
        r = self.config.resolution
        scaled = (xyz + self.bound) / (2 * self.bound) * r
        return jnp.clip(scaled.astype(jnp.int32), 0, r - 1)

    # -- updates -----------------------------------------------------------

    def update(self, field, params, key=None):
        """EMA update of per-cell density from a jittered field query."""
        if self._update_fn is None:
            def _update(density, params, key):
                centers = self.cell_centers()
                if key is not None:
                    r = self.config.resolution
                    jitter = (jax.random.uniform(key, centers.shape) - 0.5)
                    centers = centers + jitter * (2 * self.bound / r)
                sigma, _ = field.density(params, centers)
                sigma = sigma.reshape(density.shape)
                return jnp.maximum(density * self.config.decay, sigma)

            self._update_fn = jax.jit(_update)
        self.density = self._update_fn(self.density, params, key)

    def mark_untrained_grid(self, poses, intrinsics, image_size):
        """Mask cells outside every training frustum.

        poses: (N, 4, 4) ngp-convention camera-to-world matrices (the
        dataset's .poses); intrinsics: (fx, fy, cx, cy); image_size:
        (w, h) in pixels. Host-side numpy — runs once per dataset change.
        """
        fx, fy, cx, cy = intrinsics
        w, h = image_size
        centers = np.asarray(self.cell_centers())
        visible = np.zeros(len(centers), dtype=bool)
        for T_WC in np.asarray(poses):
            R = T_WC[:3, :3]
            t = T_WC[:3, 3]
            # The pipeline's ray generator shoots (x, y, 1)-style rays
            # rotated by R (dataset.py convention), i.e. the camera looks
            # along +z of this frame with x right / y down.
            p_cam = (centers - t) @ R
            z = p_cam[:, 2]
            with np.errstate(divide='ignore', invalid='ignore'):
                u = p_cam[:, 0] / z * fx + cx
                v = p_cam[:, 1] / z * fy + cy
            in_front = z > 0
            visible |= in_front & (u >= 0) & (u < w) & (v >= 0) & (v < h)
            if visible.all():
                break
        self.trained = jnp.asarray(
            visible.reshape(self.density.shape))

    # -- query -------------------------------------------------------------

    def occupancy_mask(self, xyz):
        """(N, 3) world points -> (N,) float32 1.0 where the cell is
        occupied and trained, else 0.0. Used to gate sigma in the
        renderer."""
        idx = self.cell_indices(xyz)
        occupied = self.density[idx[:, 0], idx[:, 1], idx[:, 2]] \
            > self.config.threshold
        trained = self.trained[idx[:, 0], idx[:, 1], idx[:, 2]]
        return (occupied & trained).astype(jnp.float32)

    def state(self):
        """The (density, trained) arrays — pass into render_rays so the
        lookup traces as ordinary jit inputs."""
        return self.density, self.trained
