"""GridEncoder stand-in (torch-ngp gridencoder API, pure torch)."""
import math

import torch.nn as nn

from tinycudann import _HashGrid


class GridEncoder(nn.Module):

    def __init__(self,
                 input_dim=3,
                 num_levels=16,
                 level_dim=2,
                 per_level_scale=2.0,
                 base_resolution=16,
                 log2_hashmap_size=19,
                 desired_resolution=None,
                 **kwargs):
        super().__init__()
        if desired_resolution is not None:
            per_level_scale = math.exp(
                math.log(desired_resolution / base_resolution) /
                (num_levels - 1))
        self.grid = _HashGrid(input_dim, num_levels, level_dim,
                              log2_hashmap_size, base_resolution,
                              per_level_scale)
        self.output_dim = self.grid.n_output_dims
        self.n_output_dims = self.output_dim

    def forward(self, x, bound=1.0):
        normalized = ((x + bound) / (2.0 * bound)).clamp(0.0, 1.0)
        return self.grid(normalized)
