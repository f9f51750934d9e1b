"""Model hash strings, workspace resolution, bound rule."""
import numpy as np
import pytest

from autolabel_tpu import model_utils


class _Flags:
    geometric_features = 15
    encoding = 'hg+freq'
    features = None
    rgb_weight = 1.0
    depth_weight = 0.1
    semantic_weight = 1.0
    feature_weight = 0.5
    feature_dim = 64
    workspace = None
    scene = '/tmp/scene'


def test_reference_hash_parity():
    flags = _Flags()
    flags.grid_preset = 'reference'
    # Exact reference string (model_utils.py:43-50).
    assert model_utils.model_hash(flags) == \
        'g15_hg+freq_plain_rgb1.0_d0.1_s1.0_f0.5'
    flags.features = 'dino'
    assert model_utils.model_hash(flags) == \
        'g15_hg+freq_dino_rgb1.0_d0.1_s1.0_f0.5'


def test_tpu_preset_hash_suffixes():
    flags = _Flags()
    flags.grid_preset = 'tpu'
    assert model_utils.model_hash(flags).endswith('_tpugrid')
    flags.proposal = True
    assert model_utils.model_hash(flags).endswith('_tpugrid_prop')


def test_model_dir():
    flags = _Flags()
    assert model_utils.model_dir('/data/scene1', flags) == \
        '/data/scene1/nerf/g15_hg+freq_plain_rgb1.0_d0.1_s1.0_f0.5'
    flags.workspace = '/ws'
    assert model_utils.model_dir('/data/scene1', flags) == \
        '/ws/scene/g15_hg+freq_plain_rgb1.0_d0.1_s1.0_f0.5'


def test_bound_rule():
    # The reference's odd normalization rule (model_utils.py:62-63),
    # replicated deliberately: (extents - center).max().
    b = model_utils.compute_bound(np.array([-1.0, -2.0, -1.0]),
                                  np.array([3.0, 2.0, 1.0]))
    # extents = (4, 4, 2); center = (1, 0, 0); max(extents - center) = 4
    assert b == 4.0


def test_flag_parser_defaults():
    parser = model_utils.model_flag_parser()
    flags = parser.parse_args([])
    assert flags.lr == 5e-3
    assert flags.encoding == 'hg+freq'
    assert flags.feature_dim == 64
    assert flags.grid_preset == 'tpu'
    assert not flags.proposal
