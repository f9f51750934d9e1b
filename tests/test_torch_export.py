"""Reference-format checkpoint WRITER: the torch-free torch-zip writer
against real torch.load, and the full field export -> torch_import
round trip (VERDICT r4 #8 — the inverse of utils/torch_zip.py's reader,
for the reference consumer autolabel/model_utils.py:9-18)."""
import collections

import numpy as np
import pytest

from autolabel_tpu import torch_export, torch_import
from autolabel_tpu.models.field import Field, FieldConfig
from autolabel_tpu.ops.encoders import HashGridConfig
from autolabel_tpu.utils.torch_zip import load_torch_file, save_torch_file


def _payload_fixture():
    rng = np.random.default_rng(0)
    state = collections.OrderedDict()
    state['w'] = rng.normal(size=(4, 5)).astype(np.float32)
    state['h'] = rng.normal(size=(3, 2)).astype(np.float16)
    state['i'] = np.arange(7, dtype=np.int64)
    state['i32'] = np.arange(4, dtype=np.int32)
    state['b'] = np.array([True, False, True])
    state['u8'] = np.arange(9, dtype=np.uint8)
    state['empty'] = np.zeros(0, np.float32)
    state['scalar'] = np.float32(2.5)
    return {'model': state, 'epoch': 7, 'global_step': 7000,
            'lr': 5e-3, 'name': 'ngp', 'flag': True, 'none': None,
            'list': [1, 2.5, 'x'], 'tuple': (3, 'y'),
            'big': 2 ** 40, 'neg': -12}


def test_writer_roundtrips_through_own_reader(tmp_path):
    payload = _payload_fixture()
    path = tmp_path / 'ckpt.pth'
    save_torch_file(payload, str(path))
    out = load_torch_file(str(path))
    for key, val in payload['model'].items():
        np.testing.assert_array_equal(out['model'][key], val)
        assert np.asarray(out['model'][key]).dtype == np.asarray(val).dtype
    assert out['epoch'] == 7 and out['global_step'] == 7000
    assert out['lr'] == 5e-3 and out['name'] == 'ngp'
    assert out['flag'] is True and out['none'] is None
    assert out['list'] == [1, 2.5, 'x'] and out['tuple'] == (3, 'y')
    assert out['big'] == 2 ** 40 and out['neg'] == -12


def test_torch_loads_our_archive(tmp_path):
    """The torch-pickle framing fixture: real torch.load — including the
    weights_only unpickler the reference era defaults to — reads our
    torch-free archive as native tensors."""
    torch = pytest.importorskip('torch')
    payload = _payload_fixture()
    path = tmp_path / 'ckpt.pth'
    save_torch_file(payload, str(path))
    for weights_only in (True, False):
        out = torch.load(str(path), map_location='cpu',
                         weights_only=weights_only)
        for key, val in payload['model'].items():
            tensor = out['model'][key]
            assert isinstance(tensor, torch.Tensor)
            np.testing.assert_array_equal(tensor.numpy(), val)
        assert isinstance(out['model'], collections.OrderedDict)
        assert out['epoch'] == 7 and out['tuple'] == (3, 'y')


def test_torch_loads_bfloat16(tmp_path):
    torch = pytest.importorskip('torch')
    import ml_dtypes
    arr = np.asarray(np.random.default_rng(1).normal(size=(4, 3)),
                     dtype=ml_dtypes.bfloat16)
    path = tmp_path / 'bf16.pth'
    save_torch_file({'x': arr}, str(path))
    out = torch.load(str(path), weights_only=True)
    assert out['x'].dtype == torch.bfloat16
    np.testing.assert_array_equal(out['x'].float().numpy(),
                                  arr.astype(np.float32))


def test_pack_unpack_tcnn_roundtrip():
    rng = np.random.default_rng(2)
    for in_dim, hidden, out_dim, n_hidden in [(44, 32, 16, 2),
                                              (15, 64, 3, 2),
                                              (79, 64, 5, 1)]:
        dims = [in_dim] + [hidden] * n_hidden + [out_dim]
        weights = [rng.normal(size=(a, b)).astype(np.float32)
                   for a, b in zip(dims[:-1], dims[1:])]
        flat = torch_export.pack_tcnn_mlp(weights, in_dim, hidden,
                                          out_dim, n_hidden)
        back = torch_import.unpack_tcnn_mlp(flat, in_dim, hidden,
                                            out_dim, n_hidden)
        for a, b in zip(back, weights):
            np.testing.assert_array_equal(a, b)


def _reference_preset_field(encoding):
    if encoding == 'hg+freq':
        grid = HashGridConfig(n_levels=4, log2_hashmap_size=8,
                              variant='tcnn')
    else:
        grid = HashGridConfig.from_desired_resolution(
            2 ** 10, n_levels=4, log2_hashmap_size=8, variant='torch_ngp')
    config = FieldConfig(encoding=encoding, semantic_classes=3,
                         bound=1.5, grid=grid, geo_relu=True)
    return Field(config)


@pytest.mark.parametrize('encoding', ['hg+freq', 'hg', 'freq'])
def test_field_export_import_roundtrip(tmp_path, encoding):
    """export -> .pth -> torch_import: bit-identical params everywhere
    except the color net's 16 SH-folded rows (fp32 storage of the folded
    basis re-rounds them at ~cond(M) ulps)."""
    import jax
    field = _reference_preset_field(encoding)
    params = field.init(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    ema = jax.tree.map(lambda x: x + 0.01, params)

    ckpt_dir = tmp_path / 'checkpoints'
    ckpt_dir.mkdir()
    torch_export.export_torch_checkpoint(
        str(ckpt_dir / 'ngp_ep0100.pth'), params, field.config, ema=ema,
        global_step=100000, epoch=100)

    payload = load_torch_file(str(ckpt_dir / 'ngp_ep0100.pth'))
    assert torch_import.looks_like_torch_state(payload)
    back = torch_import.convert_torch_payload(payload, field.config)
    assert back['global_step'] == 100000

    def check(ours, theirs):
        for name in ('sigma_net', 'semantic_features', 'semantic_out'):
            for a, b in zip(ours[name], theirs[name]):
                np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(ours['color_net'][0][:16],
                                   theirs['color_net'][0][:16],
                                   rtol=1e-4, atol=1e-7)
        for a, b in zip(ours['color_net'][1:], theirs['color_net'][1:]):
            np.testing.assert_array_equal(a, b)
        if 'grid' in ours.get('encoder', {}):
            np.testing.assert_array_equal(ours['encoder']['grid'],
                                          theirs['encoder']['grid'])

    check(back['model'], params)
    check(back['ema'], ema)


def test_exported_field_renders_identically(tmp_path):
    """Product-level guarantee: a reference ALNetwork loading our export
    computes the same field — verified through our own import path
    (numerically identical to the reference forward per
    tests/test_torch_import.py's oracle tests)."""
    import jax
    from autolabel_tpu import model_utils
    field = _reference_preset_field('hg+freq')
    params = field.init(jax.random.PRNGKey(1))
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)

    ckpt_dir = tmp_path / 'checkpoints'
    ckpt_dir.mkdir()
    torch_export.export_torch_checkpoint(
        str(ckpt_dir / 'best.pth'), params, field.config)
    params2, _ = model_utils.load_checkpoint(str(ckpt_dir),
                                             config=field.config)
    field2 = field

    rng = np.random.default_rng(3)
    x = (rng.random((128, 3)) * 3 - 1.5).astype(np.float32)
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    sigma_a, geo_a = field.density(params, x)
    sigma_b, geo_b = field2.density(params2, x)
    np.testing.assert_allclose(np.asarray(sigma_a), np.asarray(sigma_b),
                               rtol=1e-5, atol=1e-6)
    rgb_a = np.asarray(field.color(params, d, geo_a))
    rgb_b = np.asarray(field2.color(params2, d, geo_b))
    np.testing.assert_allclose(rgb_a, rgb_b, rtol=1e-4, atol=2e-5)


def test_export_refuses_non_geo_relu_fields():
    import jax
    config = FieldConfig(encoding='freq', semantic_classes=2)
    params = Field(config).init(jax.random.PRNGKey(2))
    with pytest.raises(ValueError, match='geo_relu'):
        torch_export.convert_to_torch_state(params, config)
    # force=True exports anyway (documented escape hatch).
    out = torch_export.convert_to_torch_state(params, config, force=True)
    assert 'sigma_net.params' in out['model']


def test_export_refuses_native_grid_variant():
    import jax
    config = FieldConfig(encoding='hg+freq', semantic_classes=2,
                         geo_relu=True,
                         grid=HashGridConfig(n_levels=2,
                                             log2_hashmap_size=6))
    params = Field(config).init(jax.random.PRNGKey(3))
    with pytest.raises(ValueError, match='tcnn'):
        torch_export.convert_to_torch_state(params, config)
