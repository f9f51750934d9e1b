"""The neural field: hash/frequency-encoded density, color, semantic and
feature heads as one functional pytree model.

TPU-native equivalent of ALNetwork (autolabel/models.py:62-265). Instead of
an nn.Module owning CUDA submodules, the field is a frozen config plus pure
functions over a params pytree — jit/grad/pjit compose over it directly.

Head layout (parity with reference, model_utils.py:61-74 defaults):
  encoder:   'freq' | 'hg' | 'hg+freq' positional encoding
  sigma_net: enc_dim -> 128 x2 -> 1 + geo_feat_dim     (trunc_exp density)
  color_net: sh16 + geo -> 128 x2 -> 3                 (sigmoid rgb)
  semantic_features: geo -> S x2 -> S                  (distillation target)
  semantic_out: relu(feat) + geo -> 64 x1 -> n_classes (softmax in renderer)
"""
import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from autolabel_tpu.ops.activation import trunc_exp
from autolabel_tpu.ops.encoders import (HashGridConfig, frequency_encode,
                                        hashgrid_encode, hashgrid_init,
                                        sh_encode)
from autolabel_tpu.ops.mlp import mlp_apply, mlp_init

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    encoding: str = 'hg+freq'
    num_layers: int = 2
    hidden_dim: int = 128
    geo_feat_dim: int = 15
    num_layers_color: int = 2
    hidden_dim_color: int = 128
    hidden_dim_semantic: int = 64
    semantic_classes: int = 2
    bound: float = 1.0
    # Optional override of the hash-grid hyperparameters (tests / memory-
    # constrained configs); None = reference-parity defaults per encoding.
    grid: HashGridConfig = None
    # Hash-grid implementation: 'xla' (gather/scatter, runs everywhere) or
    # 'pallas' (fused VMEM-resident forward kernel, TPU only).
    grid_impl: str = 'xla'
    # Head-stack implementation: 'xla' (ops/mlp.mlp_apply chains, one XLA
    # dot per layer, activations round-trip HBM) or 'pallas' (fused
    # sigma+color+semantic kernel with VMEM-resident weights and a
    # recompute backward; ops/heads_pallas.py — the TPU equivalent of
    # the reference's FullyFusedMLP). An implementation detail, not a
    # model property: both compute the same math (bf16 matmuls, fp32
    # accumulation), so checkpoints are interchangeable.
    heads_impl: str = 'xla'
    # Hash-grid interpolation: 'trilinear' (8 cell corners, reference
    # parity) or 'simplex' (tetrahedral, 4 corners — halves the
    # row-latency-bound gather/scatter cost of the encode fwd+bwd; see
    # ops/encoders.hashgrid_encode). A model property, not a render
    # option: train and eval must read the table the same way.
    grid_interp: str = 'trilinear'
    # Proposal sampler: a tiny frequency-encoded density MLP that places
    # the main field's samples (mip-NeRF-360 style). Cuts hash-grid
    # queries ~4x on TPU where the grid gather dominates the step.
    proposal: bool = False
    proposal_hidden_dim: int = 64
    # Reference ALNetwork.forward (models.py:159) relu's the geometric
    # features before the color/semantic heads; our native fields pass
    # them raw. Set True for checkpoints imported from reference
    # workspaces (torch_import.py) so the heads see the distribution
    # they were trained on.
    geo_relu: bool = False

    @property
    def grid_config(self):
        if self.grid is not None and self.encoding in ('hg', 'hg+freq'):
            return self.grid
        if self.encoding == 'hg':
            # torch-ngp get_encoder('hashgrid', desired_resolution=2**18)
            # (autolabel/models.py:143)
            return HashGridConfig.from_desired_resolution(2 ** 18)
        if self.encoding == 'hg+freq':
            # tcnn Grid/Hash 16 levels x 2, T=2^19, base 16, scale 2.0
            # (autolabel/models.py:38-48)
            return HashGridConfig()
        return None

    @property
    def encoder_dim(self):
        if self.encoding == 'freq':
            return 3 * 10 * 2
        if self.encoding == 'hg':
            return self.grid_config.out_dim
        if self.encoding == 'hg+freq':
            return 3 * 2 * 2 + self.grid_config.out_dim
        raise NotImplementedError(f"Unknown input encoding {self.encoding}")


class Field:
    """Config + pure apply functions. Params live in a separate pytree."""

    def __init__(self, config: FieldConfig):
        self.config = config

    def init(self, key) -> Params:
        c = self.config
        keys = jax.random.split(key, 5)
        params = {
            'sigma_net':
                mlp_init(keys[0], c.encoder_dim, c.hidden_dim,
                         1 + c.geo_feat_dim, c.num_layers),
            'color_net':
                mlp_init(keys[1], 16 + c.geo_feat_dim, c.hidden_dim_color, 3,
                         c.num_layers_color),
            'semantic_features':
                mlp_init(keys[2], c.geo_feat_dim, c.hidden_dim_semantic,
                         c.hidden_dim_semantic, 2),
            'semantic_out':
                mlp_init(keys[3], c.hidden_dim_semantic + c.geo_feat_dim, 64,
                         c.semantic_classes, 1),
        }
        grid_config = c.grid_config
        if grid_config is not None:
            params['encoder'] = {'grid': hashgrid_init(keys[4], grid_config)}
        else:
            params['encoder'] = {}
        if c.proposal:
            key_p = jax.random.fold_in(key, 99)
            # freq(n=6) on normalized coords -> 3*6*2 = 36 input dims.
            params['proposal'] = mlp_init(key_p, 36, c.proposal_hidden_dim,
                                          1, 2)
        return params

    # -- encodings ---------------------------------------------------------

    def _grid_encode(self, table, normalized, key=None, n_samples=1,
                     exact_levels=0, residual=False, sampled_backward=0,
                     level_window=None, backward_points=1.0):
        c = self.config
        if (c.grid_impl == 'pallas' and key is None
                and c.grid_interp == 'trilinear'):
            from autolabel_tpu.ops.hashgrid_pallas import (
                hashgrid_encode_hybrid)
            out = hashgrid_encode_hybrid(table, normalized, c.grid_config)
        else:
            out = hashgrid_encode(table, normalized, c.grid_config, key=key,
                                  n_samples=n_samples,
                                  exact_levels=exact_levels,
                                  interp=c.grid_interp,
                                  residual=residual,
                                  sampled_backward=sampled_backward,
                                  backward_points=backward_points)
        if level_window is not None:
            # BARF-style coarse-to-fine window (renderer.RenderOptions
            # .level_window): scale each level's feature block; a zero
            # freezes that level's table (zero gradient) entirely.
            w = jnp.repeat(jnp.asarray(level_window, out.dtype),
                           c.grid_config.n_features)
            out = out * w
        return out

    def encode(self, params: Params, x, key=None, n_samples=1,
               exact_levels=0, residual=False, sampled_backward=0,
               level_window=None, backward_points=1.0):
        """Positional encoding of (N, 3) points in [-bound, bound].

        key: optional PRNG key for stochastic-corner hash-grid gathers
        (training-time; see ops/encoders.hashgrid_encode). key=None gives
        the exact trilinear interpolation — all eval paths.
        """
        c = self.config
        bound = c.bound
        normalized = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)
        if c.encoding == 'freq':
            return frequency_encode(normalized, 10)
        if c.encoding == 'hg':
            return self._grid_encode(params['encoder']['grid'], normalized,
                                     key, n_samples, exact_levels, residual,
                                     sampled_backward, level_window,
                                     backward_points)
        if c.encoding == 'hg+freq':
            # Frequency part runs on the raw coordinates, grid on the
            # normalized ones (parity: autolabel/models.py:51-59).
            freq = frequency_encode(x, 2)
            grid = self._grid_encode(params['encoder']['grid'], normalized,
                                     key, n_samples, exact_levels, residual,
                                     sampled_backward, level_window,
                                     backward_points)
            return jnp.concatenate([freq, grid], axis=-1)
        raise NotImplementedError(f"Unknown input encoding {c.encoding}")

    # -- heads --------------------------------------------------------------

    def _encode_segments(self, params: Params, x, key=None, n_samples=1,
                         exact_levels=0, residual=False, sampled_backward=0,
                         level_window=None, backward_points=1.0):
        """Positional encoding as a LIST of segments (same values and
        column order as encode(), but never concatenated — mlp_apply
        consumes segments as split matmuls, skipping the padded
        concat activation; see ops/mlp.mlp_apply)."""
        c = self.config
        bound = c.bound
        normalized = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)
        if c.encoding == 'freq':
            return [frequency_encode(normalized, 10)]
        if c.encoding == 'hg':
            return [self._grid_encode(params['encoder']['grid'], normalized,
                                      key, n_samples, exact_levels, residual,
                                      sampled_backward, level_window,
                                      backward_points)]
        if c.encoding == 'hg+freq':
            return [
                frequency_encode(x, 2),
                self._grid_encode(params['encoder']['grid'], normalized,
                                  key, n_samples, exact_levels, residual,
                                  sampled_backward, level_window,
                                  backward_points)
            ]
        raise NotImplementedError(f"Unknown input encoding {c.encoding}")

    def density(self, params: Params, x, key=None, n_samples=1,
                exact_levels=0, residual=False, sampled_backward=0,
                level_window=None, backward_points=1.0):
        """(N, 3) points -> (sigma (N,), geo_feat (N, G))."""
        h = mlp_apply(params['sigma_net'],
                      self._encode_segments(
                          params, x, key=key, n_samples=n_samples,
                          exact_levels=exact_levels, residual=residual,
                          sampled_backward=sampled_backward,
                          level_window=level_window,
                          backward_points=backward_points))
        sigma = trunc_exp(h[..., 0])
        return sigma, h[..., 1:]

    def fused_heads_available(self, params):
        """True when the fused Pallas head stack covers this config
        (reference head topology; ops/heads_pallas.supported)."""
        from autolabel_tpu.ops.heads_pallas import supported
        c = self.config
        if c.heads_impl != 'pallas' or c.encoding not in ('hg', 'hg+freq'):
            return False
        if c.geo_relu:  # imported reference heads: xla path only
            return False
        return supported(params, 12 if c.encoding == 'hg+freq' else 0)

    def all_heads(self, params: Params, x, d, key=None, n_samples=1,
                  exact_levels=0, residual=False, sampled_backward=0,
                  level_window=None, backward_points=1.0):
        """Every head in one fused kernel: (N, 3) points + (N, 3) view
        dirs -> (sigma (N,), rgb (N, 3), logits (N, C), features (N, S)).

        Same math as density + color + semantic (the fused kernel is an
        implementation of the same stack; ops/heads_pallas.py); callers
        gate on fused_heads_available."""
        from autolabel_tpu.ops.heads_pallas import (fused_heads,
                                                    pack_head_weights)
        c = self.config
        bound = c.bound
        normalized = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)
        A = self._grid_encode(params['encoder']['grid'], normalized, key,
                              n_samples, exact_levels, residual,
                              sampled_backward, level_window,
                              backward_points)
        freq_dim = 12 if c.encoding == 'hg+freq' else 0
        B = jnp.zeros((x.shape[0], 128), jnp.float32)
        if freq_dim:
            B = B.at[:, :freq_dim].set(frequency_encode(x, 2))
        B = B.at[:, 16:32].set(sh_encode(d))
        packed = pack_head_weights(params, freq_dim)
        out1, feats, logits = fused_heads(packed, A, B)
        n_classes = params['semantic_out'][1].shape[1]
        feat_dim = params['semantic_features'][2].shape[1]
        return (out1[:, 0], out1[:, 1:4], logits[:, :n_classes],
                feats[:, :feat_dim])

    def color(self, params: Params, d, geo_feat):
        """Unit view dirs (N, 3) + geo features -> rgb (N, 3) in [0, 1]."""
        geo_feat = geo_feat.astype(jnp.float32)
        if self.config.geo_relu:
            geo_feat = jnp.maximum(geo_feat, 0.0)
        return jax.nn.sigmoid(mlp_apply(
            params['color_net'], [sh_encode(d), geo_feat]))

    def proposal_sigma(self, params: Params, x):
        """Cheap proposal density: (N, 3) -> (N,). Pure MXU (freq + MLP),
        no hash-grid gather."""
        c = self.config
        normalized = jnp.clip((x + c.bound) / (2.0 * c.bound), 0.0, 1.0)
        if c.heads_impl == 'pallas' and len(params['proposal']) == 3:
            from autolabel_tpu.ops.heads_pallas import (fused_mlp3,
                                                        pack_mlp3)
            freq = frequency_encode(normalized, 6)
            X = jnp.zeros((x.shape[0], 128), jnp.float32)
            X = X.at[:, :freq.shape[-1]].set(freq)
            h = fused_mlp3(pack_mlp3(params['proposal']), X)
            return trunc_exp(h[:, 0])
        h = mlp_apply(params['proposal'], frequency_encode(normalized, 6))
        return trunc_exp(h[..., 0])

    def semantic(self, params: Params, geo_feat):
        """Geo features -> (class logits (N, C), features (N, S)).

        Parity: ALNetwork.semantic (models.py:248-256) — the feature head
        output doubles as the distillation target, the logits head sees
        relu(features) concatenated with geo features.
        """
        geo_feat = geo_feat.astype(jnp.float32)
        if self.config.geo_relu:
            geo_feat = jnp.maximum(geo_feat, 0.0)
        sem_features = mlp_apply(params['semantic_features'], geo_feat)
        logits = mlp_apply(params['semantic_out'],
                           [jnp.maximum(sem_features, 0.0), geo_feat])
        return logits, sem_features

    # -- param groups --------------------------------------------------------

    @staticmethod
    def param_labels(params: Params):
        """'encoding' / 'net' / 'pose' labels for optimizer groups
        (weight decay is applied to the nets only; parity:
        scripts/train.py:50-63; 'pose' = camera-refinement deltas,
        also decay-free)."""
        special = {'encoder': 'encoding', 'pose': 'pose'}
        return {
            key: jax.tree.map(lambda _: special.get(key, 'net'), value)
            for key, value in params.items()
        }
