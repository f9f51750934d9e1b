"""Reference torch-checkpoint interop: the torch-free zip reader against
real torch.save archives, tcnn buffer unpacking, the SH direction-quirk
fold, grid resampling, and an end-to-end evaluate-path load of a
hand-built reference-format workspace checkpoint."""
import os
import pickle

import numpy as np
import pytest

from autolabel_tpu import model_utils, torch_import
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.utils.torch_zip import load_torch_file


# -- torch_zip reader ----------------------------------------------------------


def _state_fixture(torch):
    base = torch.randn(12)
    return {
        'f32': torch.randn(4, 5),
        'f16': torch.randn(3, 2).half(),
        'bf16': torch.randn(2, 3).bfloat16(),
        'i64': torch.arange(7),
        'bool': torch.tensor([True, False, True]),
        'scalar': torch.tensor(2.5),
        'noncontig': torch.randn(6, 8).t(),
        'view': base[3:9],
        'base': base,
        'nested': {'a': torch.randn(2), 'n': 42, 's': 'ngp'},
    }


@pytest.mark.parametrize('zipped', [True, False])
def test_torch_zip_reader_matches_torch_save(tmp_path, zipped):
    torch = pytest.importorskip('torch')
    state = _state_fixture(torch)
    path = tmp_path / 'ckpt.pth'
    torch.save(state, path, _use_new_zipfile_serialization=zipped)
    out = load_torch_file(str(path))
    for key in ('f32', 'f16', 'i64', 'bool', 'noncontig', 'view', 'base'):
        np.testing.assert_array_equal(out[key], state[key].numpy())
    np.testing.assert_array_equal(out['bf16'].astype(np.float32),
                                  state['bf16'].float().numpy())
    assert float(out['scalar']) == 2.5
    np.testing.assert_array_equal(out['nested']['a'],
                                  state['nested']['a'].numpy())
    assert out['nested']['n'] == 42 and out['nested']['s'] == 'ngp'


def test_torch_zip_reader_rejects_arbitrary_globals(tmp_path):
    torch = pytest.importorskip('torch')
    path = tmp_path / 'evil.pth'
    torch.save({'m': torch.nn.Linear(2, 2)}, path)
    with pytest.raises(pickle.UnpicklingError):
        load_torch_file(str(path))


# -- tcnn layout primitives -----------------------------------------------------


def _pack_tcnn_mlp(weights, in_dim, hidden, out_dim):
    """Inverse of unpack: (in, out) matrices -> padded row-major flat."""
    pads = [(hidden, torch_import._next16(in_dim))]
    pads += [(hidden, hidden)] * (len(weights) - 2)
    pads += [(torch_import._next16(out_dim), hidden)]
    chunks = []
    rng = np.random.default_rng(0)
    for w, (rows, cols) in zip(weights, pads):
        mat = rng.normal(size=(rows, cols)).astype(np.float32)  # pad junk
        mat[:w.shape[1], :w.shape[0]] = w.T
        chunks.append(mat.reshape(-1))
    return np.concatenate(chunks)


def test_unpack_tcnn_mlp_roundtrip():
    rng = np.random.default_rng(1)
    dims = [(44, 32, 16, 2), (31, 32, 3, 2), (15, 16, 16, 2), (79, 64, 5, 1)]
    for in_dim, hidden, out_dim, n_hidden in dims:
        shapes = [in_dim] + [hidden] * n_hidden + [out_dim]
        weights = [rng.normal(size=(a, b)).astype(np.float32)
                   for a, b in zip(shapes[:-1], shapes[1:])]
        flat = _pack_tcnn_mlp(weights, in_dim, hidden, out_dim)
        out = torch_import.unpack_tcnn_mlp(flat, in_dim, hidden, out_dim,
                                           n_hidden)
        assert len(out) == len(weights)
        for a, b in zip(out, weights):
            np.testing.assert_allclose(a, b, atol=1e-6)
    with pytest.raises(ValueError, match='expected'):
        torch_import.unpack_tcnn_mlp(np.zeros(10), 44, 32, 16, 2)


def test_sh_quirk_fold_exact_on_sphere():
    M = torch_import.sh_quirk_fold()
    rng = np.random.default_rng(2)
    d = rng.normal(size=(200, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    A = torch_import._sh_basis(d.astype(np.float32))
    B = torch_import._sh_basis((2 * d - 1).astype(np.float32))
    np.testing.assert_allclose(A @ M, B, atol=1e-4)


def test_freq_row_perm_matches_tcnn_interleaving():
    """Our frequency_encode columns, permuted, equal the tcnn interleaved
    layout [sin f0, cos f0, sin f1, cos f1] per input dim."""
    from autolabel_tpu.ops.encoders import frequency_encode
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 3)).astype(np.float32)
    ours = np.asarray(frequency_encode(x, 2))
    tcnn = np.empty_like(ours)
    for i in range(3):
        for f in range(2):
            tcnn[:, i * 4 + 2 * f] = np.sin(x[:, i] * 2 ** f * np.pi)
            tcnn[:, i * 4 + 2 * f + 1] = np.cos(x[:, i] * 2 ** f * np.pi)
    perm = torch_import._freq_row_perm(3, 2)
    np.testing.assert_allclose(ours, tcnn[:, perm], atol=1e-5)


# -- grid table transfer ---------------------------------------------------------

_GRID_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))


def _oracle_source_grid(points, embeddings, offsets, base, plc, mode):
    """Numpy trilinear interpolation per the SOURCE conventions (tcnn
    grid.h / torch-ngp gridencoder): pos = x*(base*plc^l - 1) + 0.5,
    dense stride = resolution (tcnn) or resolution + 1 (torch-ngp),
    coherent prime hash mod the level's entry count."""
    outs = []
    for l in range(len(offsets) - 1):
        scale = base * plc ** l - 1.0
        resolution = int(np.ceil(scale)) + 1
        stride = resolution if mode == 'tcnn' else resolution + 1
        table = embeddings[offsets[l]:offsets[l + 1]]
        size = len(table)
        # fp32 like the jitted encode, so cell assignment can't flip at
        # boundaries between oracle and implementation.
        pos = (points.astype(np.float32) * np.float32(scale)
               + np.float32(0.5))
        cell = np.floor(pos).astype(np.int64)
        frac = (pos - cell).astype(np.float32)
        acc = np.zeros((len(points), table.shape[1]), np.float32)
        for cx, cy, cz in [(i, j, k) for i in (0, 1) for j in (0, 1)
                           for k in (0, 1)]:
            c = cell + np.asarray([cx, cy, cz])
            if stride ** 3 > size:
                cu = c.astype(np.uint32)
                idx = (cu[:, 0] * _GRID_PRIMES[0]
                       ^ cu[:, 1] * _GRID_PRIMES[1]
                       ^ cu[:, 2] * _GRID_PRIMES[2]) % np.uint32(size)
                idx = idx.astype(np.int64)
            else:
                idx = (c[:, 0] + stride * (c[:, 1] + stride * c[:, 2])) \
                    % size
            w = ((frac[:, 0] if cx else 1 - frac[:, 0])
                 * (frac[:, 1] if cy else 1 - frac[:, 1])
                 * (frac[:, 2] if cz else 1 - frac[:, 2]))
            acc += w[:, None] * table[idx]
        outs.append(acc)
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize('variant', ['tcnn', 'torch_ngp'])
def test_grid_import_is_numerically_identical_to_source(variant):
    """Packed source tables under the matching HashGridConfig variant
    reproduce the source interpolant EXACTLY at arbitrary points —
    collisions and all."""
    grid = HashGridConfig(n_levels=4, n_features=2, log2_hashmap_size=10,
                          base_resolution=4, per_level_scale=2.0,
                          variant=variant)
    rng = np.random.default_rng(4)
    offsets = np.concatenate([[0], np.cumsum(grid.level_sizes)])
    embeddings = rng.normal(size=(int(offsets[-1]), 2)).astype(np.float32)
    table = torch_import.pack_grid_table(embeddings, offsets, grid)

    field = Field(FieldConfig(encoding='hg', grid=grid, bound=1.0))
    params = {'encoder': {'grid': table}}
    x = (rng.random((512, 3)) * 1.96 - 0.98).astype(np.float32)
    # The oracle sees exactly the fp32 positions the field derives.
    pts01 = (x.astype(np.float32) + np.float32(1.0)) / np.float32(2.0)
    enc = np.asarray(field.encode(params, x))
    src = _oracle_source_grid(pts01, embeddings, offsets, 4, 2.0, variant)
    np.testing.assert_allclose(enc, src, atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match='offsets'):
        torch_import.pack_grid_table(embeddings, offsets + 1, grid)


# -- end-to-end reference checkpoint --------------------------------------------


def _reference_freq_checkpoint(torch, n_classes=3, geo=15):
    """Random ALNetwork('freq') state dict in the reference's exact
    saving format (torch-ngp Trainer payload)."""
    rng = np.random.default_rng(5)

    def buf(*shape):
        return torch.as_tensor(
            (rng.normal(size=shape) * 0.25).astype(np.float32))

    def tcnn_flat(in_dim, hidden, out_dim, n_hidden):
        shapes = [in_dim] + [hidden] * n_hidden + [out_dim]
        ws = [(rng.normal(size=(a, b)) * (1.0 / np.sqrt(a))).astype(
            np.float32) for a, b in zip(shapes[:-1], shapes[1:])]
        return torch.as_tensor(_pack_tcnn_mlp(ws, in_dim, hidden, out_dim))

    state = {
        'sigma_net.params': tcnn_flat(60, 128, 1 + geo, 2),
        'color_net.params': tcnn_flat(16 + geo, 128, 3, 2),
        'semantic_features.params': tcnn_flat(geo, 64, 64, 2),
        'semantic_out.params': tcnn_flat(64 + geo, 64, n_classes, 1),
        'aabb_train': buf(6),
        'aabb_infer': buf(6),
    }
    return {'model': state, 'epoch': 150, 'global_step': 150000,
            'stats': {'loss': 0.01}}


def _oracle_freq_forward(state, x, d, bound, geo_dim=15):
    """Numpy ALNetwork('freq').forward per the documented reference
    semantics: interleaved tcnn frequency encoding on normalized coords,
    zero-padded tcnn matmuls, trunc_exp, relu'd geo features, tcnn SH on
    2d-1 (models.py:150-173)."""
    def tcnn_mlp(flat, h_in, in_dim, hidden, out_dim, n_hidden):
        shapes = [(hidden, torch_import._next16(in_dim))]
        shapes += [(hidden, hidden)] * (n_hidden - 1)
        shapes += [(torch_import._next16(out_dim), hidden)]
        padded = np.zeros((len(h_in), torch_import._next16(in_dim)),
                          np.float32)
        padded[:, :in_dim] = h_in
        h = padded
        offset = 0
        flat = np.asarray(flat, np.float32)
        for i, (rows, cols) in enumerate(shapes):
            mat = flat[offset:offset + rows * cols].reshape(rows, cols)
            offset += rows * cols
            h = h @ mat.T
            if i + 1 < len(shapes):
                h = np.maximum(h, 0.0)
        return h[:, :out_dim]

    normalized = (x + bound) / (2.0 * bound)
    enc = np.empty((len(x), 60), np.float32)
    for i in range(3):
        for f in range(10):
            enc[:, i * 20 + 2 * f] = np.sin(
                normalized[:, i] * 2 ** f * np.pi)
            enc[:, i * 20 + 2 * f + 1] = np.cos(
                normalized[:, i] * 2 ** f * np.pi)
    h = tcnn_mlp(state['sigma_net.params'], enc, 60, 128, 1 + geo_dim, 2)
    sigma = np.exp(np.clip(h[:, 0], -15.0, 15.0))
    geo = np.maximum(h[:, 1:], 0.0)
    sh = torch_import._sh_basis((2.0 * d - 1.0).astype(np.float32))
    rgb = 1 / (1 + np.exp(-tcnn_mlp(state['color_net.params'],
                                    np.concatenate([sh, geo], -1),
                                    16 + geo_dim, 128, 3, 2)))
    feats = tcnn_mlp(state['semantic_features.params'], geo, geo_dim, 64,
                     64, 2)
    logits = tcnn_mlp(state['semantic_out.params'],
                      np.concatenate([np.maximum(feats, 0.0), geo], -1),
                      64 + geo_dim, 64, 3, 1)
    return sigma, geo, rgb, feats, logits


@pytest.mark.slow
def test_imported_freq_model_matches_reference_forward(tmp_path):
    torch = pytest.importorskip('torch')
    payload = _reference_freq_checkpoint(torch)
    ckpt_dir = tmp_path / 'checkpoints'
    os.makedirs(ckpt_dir)
    torch.save(payload, ckpt_dir / 'ngp_ep0150.pth')

    config = FieldConfig(encoding='freq', semantic_classes=3, bound=2.0)
    field, params, ema = model_utils.load_into_field(
        Field(config), str(ckpt_dir))
    assert field.config.geo_relu  # reference head-parity flag applied

    rng = np.random.default_rng(6)
    x = (rng.random((64, 3)) * 4 - 2).astype(np.float32)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)

    np_state = {k: v.numpy() for k, v in payload['model'].items()}
    sigma_ref, geo_ref, rgb_ref, feats_ref, logits_ref = \
        _oracle_freq_forward(np_state, x, d, bound=2.0)

    sigma, geo = field.density(params, x)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref,
                               atol=1e-4, rtol=1e-3)
    rgb = np.asarray(field.color(params, d, geo))
    np.testing.assert_allclose(rgb, rgb_ref, atol=1e-4)
    logits, feats = field.semantic(params, geo)
    np.testing.assert_allclose(np.asarray(feats), feats_ref,
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_inference_model_loads_reference_workspace(tmp_path):
    """The evaluate.py path: a reference-format torch checkpoint in a
    nerf/ workspace loads and renders instead of being skipped."""
    torch = pytest.importorskip('torch')
    model_dir = tmp_path / 'nerf' / 'g15_freq_plain'
    ckpt_dir = model_dir / 'checkpoints'
    os.makedirs(ckpt_dir)
    torch.save(_reference_freq_checkpoint(torch),
               ckpt_dir / 'ngp_ep0150.pth')

    from autolabel_tpu.inference import InferenceModel
    config = FieldConfig(encoding='freq', semantic_classes=3, bound=1.0)
    model = InferenceModel.from_checkpoint(Field(config), str(model_dir),
                                           num_steps=16, max_ray_batch=256)
    assert model.field.config.geo_relu
    out = model.density(np.zeros((8, 3), np.float32))
    assert out['sigma'].shape == (8,) and np.isfinite(out['sigma']).all()
    logits, feats = model.semantic(out['geo_feat'])
    assert logits.shape == (8, 3) and np.isfinite(logits).all()
