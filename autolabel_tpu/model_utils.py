"""Model configuration, hashing and workspace resolution.

The model-hash directory name is load-bearing: evaluation and export tools
glob <scene>/nerf/* and decode the training configuration from it. Strings
are kept identical to the reference (autolabel/model_utils.py:21-58) so
workspaces interoperate.
"""
import argparse
import os
import pickle

from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.train import checkpoints


def model_flag_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--lr', type=float, default=5e-3)
    parser.add_argument('--geometric-features', '-g', type=int, default=15)
    parser.add_argument('--encoding',
                        default='hg+freq',
                        choices=['freq', 'hg', 'hg+freq'],
                        type=str,
                        help="Network positional encoding to use.")
    parser.add_argument('--features',
                        type=str,
                        default=None,
                        choices=[None, 'fcn50', 'dino', 'lseg', 'demo'],
                        help="Use semantic feature supervision.")
    parser.add_argument('--rgb-weight', default=1.0, type=float)
    parser.add_argument('--semantic-weight', default=1.0, type=float)
    parser.add_argument('--feature-weight', default=0.5, type=float)
    parser.add_argument('--depth-weight', default=0.1, type=float)
    parser.add_argument('--feature-dim', default=64, type=int)
    parser.add_argument('--grid-preset',
                        default='tpu',
                        choices=['reference', 'tpu'],
                        help="Hash-grid shape: 'tpu' = v5e-tuned wide-row "
                        "layout (default, ~10x faster at equal parameter "
                        "count), 'reference' = the reference's 16x2x2^19.")
    parser.add_argument('--proposal',
                        action='store_true',
                        help="Proposal-network sampling: a tiny density "
                        "MLP places the main field's samples, cutting "
                        "hash-grid queries ~4x (mip-NeRF-360 style).")
    parser.add_argument('--proposal-steps', type=int, default=64,
                        help="Uniform proposal samples per ray.")
    parser.add_argument('--heads-impl',
                        default='xla',
                        choices=['xla', 'pallas'],
                        help="Head-stack implementation: 'pallas' fuses "
                        "the sigma/color/semantic MLPs into one "
                        "VMEM-resident kernel (TPU; the FullyFusedMLP "
                        "equivalent, ops/heads_pallas.py). Same math — "
                        "checkpoints are interchangeable, so this is "
                        "not part of the model hash.")
    parser.add_argument('--grid-interp',
                        default='simplex',
                        choices=['trilinear', 'simplex'],
                        help="Hash-grid interpolation: 'simplex' "
                        "(tetrahedral, 4 corners — halves the gather/"
                        "scatter cost of the encode, the step's cost "
                        "center; default, flagship) or 'trilinear' (8 "
                        "cell corners, reference parity).")
    return parser


def effective_grid_interp(flags):
    """The interpolant a flags object actually trains with.

    Simplex interpolation is implemented for the wide-row (TPU_GRID)
    layout only; the narrow reference-preset grid always interpolates
    trilinearly, whatever --grid-interp says. Normalized here so the
    model hash and the built Field can never disagree.
    """
    interp = getattr(flags, 'grid_interp', 'trilinear')
    if getattr(flags, 'grid_preset', 'reference') != 'tpu':
        return 'trilinear'
    return interp


def model_hash(flags):
    features = flags.features if flags.features is not None else 'plain'
    string = f"g{flags.geometric_features}_{flags.encoding}_{features}"
    string += (f"_rgb{flags.rgb_weight}_d{flags.depth_weight}"
               f"_s{flags.semantic_weight}")
    string += f"_f{flags.feature_weight}"
    # TPU-shaped hash grid changes the parameter shapes, so it gets its
    # own workspace; the reference preset keeps the reference hash string.
    if getattr(flags, 'grid_preset', 'reference') == 'tpu':
        string += "_tpugrid"
    if getattr(flags, 'proposal', False):
        string += "_prop"
    # The interpolant is part of the model semantics (the table is
    # trained against it), so simplex models get their own workspace.
    if effective_grid_interp(flags) == 'simplex':
        string += "_simplex"
    return string


def model_dir(scene_path, flags):
    mhash = model_hash(flags)
    if getattr(flags, 'workspace', None) is None:
        return os.path.join(scene_path, 'nerf', mhash)
    scene_name = os.path.basename(os.path.normpath(flags.scene))
    return os.path.join(flags.workspace, scene_name, mhash)


def compute_bound(min_bounds, max_bounds):
    """The reference's normalization-volume rule (model_utils.py:62-63):
    bound = (extents - center).max(). Replicated deliberately — it defines
    the world volume checkpoints were trained against."""
    extents = max_bounds - min_bounds
    return float((extents - (min_bounds + max_bounds) * 0.5).max())


def create_model(min_bounds, max_bounds, n_classes, flags):
    """Build the Field for a scene. Returns the Field (params are created
    separately via field.init(key) — the functional split torch hides).

    flags.grid_preset selects the hash-grid shape: 'reference' keeps the
    reference's 16 x 2^19 x 2 layout; 'tpu' (TPU_GRID) uses the v5e-tuned
    4 x 2^15 x 128 layout at the same parameter count (~10x faster
    encode; see ops/encoders.py).
    """
    grid = None
    if getattr(flags, 'grid_preset', 'reference') == 'tpu':
        from autolabel_tpu.ops.encoders import TPU_GRID
        grid = TPU_GRID
    config = FieldConfig(encoding=flags.encoding,
                         num_layers=2,
                         num_layers_color=2,
                         hidden_dim=128,
                         hidden_dim_color=128,
                         geo_feat_dim=flags.geometric_features,
                         hidden_dim_semantic=flags.feature_dim,
                         semantic_classes=n_classes,
                         bound=compute_bound(min_bounds, max_bounds),
                         grid=grid,
                         proposal=getattr(flags, 'proposal', False),
                         grid_interp=effective_grid_interp(flags),
                         heads_impl=getattr(flags, 'heads_impl', 'xla'))
    return Field(config)


def load_checkpoint(checkpoint_dir, config=None):
    """Load (params, ema_params) from a checkpoint dir; prefers best.pth.

    Parity: autolabel/model_utils.py:9-18. Reference torch checkpoints
    are imported onto the field pytree when `config` is supplied
    (torch_import.convert_torch_payload) — note the imported weights
    expect FieldConfig(geo_relu=True); use load_into_field to get the
    matching field handled automatically.
    """
    payload = checkpoints.load_checkpoint(checkpoint_dir)
    if payload is None:
        raise FileNotFoundError(f"No checkpoints in {checkpoint_dir}")
    from autolabel_tpu import torch_import
    if torch_import.looks_like_torch_state(payload):
        if config is None:
            raise ValueError(
                f'{checkpoint_dir} holds a reference torch checkpoint; '
                'pass the FieldConfig (or use load_into_field) to '
                'import it')
        payload = torch_import.convert_torch_payload(payload, config)
    return payload['model'], payload.get('ema', payload['model'])


def load_into_field(field, checkpoint_dir):
    """(field, params, ema) with reference torch checkpoints imported
    and the parity adaptations applied to the returned field: the
    geo_relu head flag plus the source grid conventions (the reference's
    own grid shape under the matching HashGridConfig variant — 'tcnn'
    for hg+freq, 'torch_ngp' for hg — regardless of any TPU grid
    preset, since the imported tables ARE the reference's)."""
    import dataclasses
    payload = checkpoints.load_checkpoint(checkpoint_dir)
    if payload is None:
        raise FileNotFoundError(f"No checkpoints in {checkpoint_dir}")
    from autolabel_tpu import torch_import
    if torch_import.looks_like_torch_state(payload):
        config = field.config
        grid = dataclasses.replace(config, grid=None).grid_config
        if grid is not None:
            variant = ('tcnn' if config.encoding == 'hg+freq'
                       else 'torch_ngp')
            grid = dataclasses.replace(grid, variant=variant)
        field = Field(dataclasses.replace(config, geo_relu=True,
                                          heads_impl='xla',
                                          grid_impl='xla', grid=grid))
        payload = torch_import.convert_torch_payload(payload, field.config)
    return field, payload['model'], payload.get('ema', payload['model'])


def read_params(workspace):
    with open(os.path.join(workspace, 'params.pkl'), 'rb') as f:
        return pickle.load(f)


def write_params(workspace, flags):
    os.makedirs(workspace, exist_ok=True)
    with open(os.path.join(workspace, 'params.pkl'), 'wb') as f:
        pickle.dump(flags, f)
