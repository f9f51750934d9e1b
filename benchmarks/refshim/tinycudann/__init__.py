"""tinycudann stand-in: pure-PyTorch Encoding and Network.

API surface per the reference's call sites (autolabel/models.py:19-48,
84-136, 268-294): tcnn.Encoding(n_input_dims, encoding_config) with an
`n_output_dims` attribute, and tcnn.Network(n_input_dims, n_output_dims,
network_config) — bias-free ReLU MLPs (FullyFusedMLP / CutlassMLP both
reduce to that on CPU).
"""
import math

import torch
import torch.nn as nn


class _Frequency(nn.Module):

    def __init__(self, n_input_dims, n_frequencies):
        super().__init__()
        self.n_output_dims = n_input_dims * n_frequencies * 2
        freqs = (2.0 ** torch.arange(n_frequencies, dtype=torch.float32)) \
            * math.pi
        self.register_buffer('freqs', freqs)

    def forward(self, x):
        angles = x.float()[..., None] * self.freqs  # (..., D, F)
        enc = torch.cat([torch.sin(angles), torch.cos(angles)], dim=-1)
        return enc.reshape(*x.shape[:-1], self.n_output_dims)


class _SphericalHarmonics(nn.Module):
    """Real SH basis up to degree 4; tcnn expects inputs in [0, 1]."""

    def __init__(self, n_input_dims, degree):
        super().__init__()
        assert n_input_dims == 3 and degree == 4
        self.n_output_dims = degree * degree

    def forward(self, d):
        d = d.float() * 2.0 - 1.0
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out = [
            torch.full_like(x, 0.28209479177387814),
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
        return torch.stack(out, dim=-1)


_PRIMES = (1, 2654435761, 805459861)


class _HashGrid(nn.Module):
    """Multiresolution hash grid with trilinear interpolation (instant-ngp
    layout), vectorized torch."""

    def __init__(self, n_input_dims, n_levels, n_features, log2_hashmap_size,
                 base_resolution, per_level_scale):
        super().__init__()
        assert n_input_dims == 3
        self.n_levels = n_levels
        self.n_features = n_features
        self.table_size = 1 << log2_hashmap_size
        self.resolutions = [
            int(math.floor(base_resolution * per_level_scale ** l))
            for l in range(n_levels)
        ]
        self.n_output_dims = n_levels * n_features
        self.table = nn.Parameter(
            torch.empty(n_levels, self.table_size,
                        n_features).uniform_(-1e-4, 1e-4))

    def _corner_index(self, cx, cy, cz, res):
        stride = res + 1
        if stride ** 3 <= self.table_size:
            return cx + stride * (cy + stride * cz)
        hashed = (cx * _PRIMES[0]) ^ (cy * _PRIMES[1]) ^ (cz * _PRIMES[2])
        return hashed % self.table_size

    def forward(self, x):
        """x: (N, 3) in [0, 1] -> (N, L*F)."""
        x = x.float()
        outs = []
        for l, res in enumerate(self.resolutions):
            pos = x * res
            cell = torch.floor(pos)
            frac = pos - cell
            cell = cell.long()
            acc = None
            for ox in (0, 1):
                for oy in (0, 1):
                    for oz in (0, 1):
                        idx = self._corner_index(cell[:, 0] + ox,
                                                 cell[:, 1] + oy,
                                                 cell[:, 2] + oz, res)
                        wx = frac[:, 0] if ox else 1.0 - frac[:, 0]
                        wy = frac[:, 1] if oy else 1.0 - frac[:, 1]
                        wz = frac[:, 2] if oz else 1.0 - frac[:, 2]
                        w = (wx * wy * wz)[:, None]
                        val = self.table[l][idx] * w
                        acc = val if acc is None else acc + val
            outs.append(acc)
        return torch.cat(outs, dim=-1)


def Encoding(n_input_dims, encoding_config):
    otype = encoding_config['otype']
    if otype == 'Frequency':
        return _Frequency(n_input_dims, encoding_config['n_frequencies'])
    if otype == 'SphericalHarmonics':
        return _SphericalHarmonics(n_input_dims, encoding_config['degree'])
    if otype == 'Grid':
        assert encoding_config.get('type', 'Hash') == 'Hash'
        return _HashGrid(n_input_dims,
                         n_levels=encoding_config['n_levels'],
                         n_features=encoding_config['n_features_per_level'],
                         log2_hashmap_size=encoding_config[
                             'log2_hashmap_size'],
                         base_resolution=encoding_config['base_resolution'],
                         per_level_scale=encoding_config['per_level_scale'])
    raise NotImplementedError(f'Encoding otype {otype}')


class Network(nn.Module):
    """Bias-free ReLU MLP: n_hidden_layers hidden layers of n_neurons."""

    def __init__(self, n_input_dims, n_output_dims, network_config):
        super().__init__()
        hidden = network_config['n_neurons']
        n_hidden = network_config['n_hidden_layers']
        activation = network_config.get('activation', 'ReLU')
        out_activation = network_config.get('output_activation', 'None')
        dims = [n_input_dims] + [hidden] * n_hidden + [n_output_dims]
        layers = []
        for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
            layers.append(nn.Linear(d_in, d_out, bias=False))
            is_last = i == len(dims) - 2
            act = out_activation if is_last else activation
            if act == 'ReLU':
                layers.append(nn.ReLU())
            elif act != 'None':
                raise NotImplementedError(f'activation {act}')
        self.net = nn.Sequential(*layers)
        self.n_output_dims = n_output_dims

    def forward(self, x):
        return self.net(x.float())
