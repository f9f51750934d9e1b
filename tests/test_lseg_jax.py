"""JAX LSeg image tower vs independent torch implementations with SHARED
random weights: the ViT backbone's hooked activations against
transformers.ViTModel hidden states, the DPT decoder against
transformers' DPTNeck (the HF port of isl-org DPT — the same
reassemble/fusion semantics lang-seg builds on), and the lang-seg
checkpoint loader + full pixel pipeline on a tiny random checkpoint. So
when real lang-seg weights are supplied (AUTOLABEL_LSEG_WEIGHTS) the
path is already proven correct end to end."""
import numpy as np
import pytest

from autolabel_tpu.features import lseg_jax, vit_jax

# Training/compile-heavy: excluded from the smoke tier (pytest -m 'not slow').
pytestmark = pytest.mark.slow



TINY = lseg_jax.LSegConfig(
    vit=vit_jax.ViTConfig(patch_size=16, width=32, depth=4, heads=2),
    hooks=(0, 1, 2, 3),
    neck_dims=(8, 16, 32, 32),
    features=16,
    out_dim=24)


def test_default_hooks_match_lang_seg_schedule():
    assert lseg_jax.default_hooks(24) == (5, 11, 17, 23)
    assert lseg_jax.default_hooks(12) == (2, 5, 8, 11)
    assert lseg_jax.default_hooks(4) == (0, 1, 2, 3)


def test_backbone_hooks_match_transformers_vit():
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    hf_config = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=128, image_size=64, patch_size=16,
        layer_norm_eps=1e-6, hidden_act='gelu')
    model = transformers.ViTModel(hf_config, add_pooling_layer=False)
    model.eval()
    params = vit_jax.load_hf_state_dict(model.state_dict(), TINY.vit)

    x = np.random.default_rng(0).random((2, 3, 64, 64)).astype(np.float32)
    with torch.inference_mode():
        ref = model(torch.as_tensor(x), output_hidden_states=True)

    hooked, hp, wp = lseg_jax.backbone_hooks(params, x, TINY)
    assert (hp, wp) == (4, 4)
    # transformers hidden_states[i + 1] is block i's output (pre final
    # LN) — exactly what the DPT forward hooks tap in lang-seg.
    for hook, tokens in zip(TINY.hooks, hooked):
        expected = ref.hidden_states[hook + 1].numpy()
        np.testing.assert_allclose(np.asarray(tokens), expected,
                                   atol=1e-4, rtol=1e-3)


def _hf_dpt_config(transformers):
    return transformers.DPTConfig(
        hidden_size=TINY.vit.width, num_hidden_layers=TINY.vit.depth,
        num_attention_heads=TINY.vit.heads, intermediate_size=128,
        image_size=64, patch_size=16,
        neck_hidden_sizes=list(TINY.neck_dims),
        fusion_hidden_size=TINY.features,
        reassemble_factors=[4, 2, 1, 0.5],
        readout_type='project', is_hybrid=False)


def test_neck_matches_transformers_dpt():
    torch = pytest.importorskip('torch')
    transformers = pytest.importorskip('transformers')
    from transformers.models.dpt.modeling_dpt import DPTNeck
    neck = DPTNeck(_hf_dpt_config(transformers))
    neck.eval()

    rng = np.random.default_rng(1)
    hp = wp = 4
    tokens = [rng.normal(size=(2, hp * wp + 1, TINY.vit.width))
              .astype(np.float32) * 0.5 for _ in range(4)]
    with torch.inference_mode():
        ref = neck([torch.as_tensor(t) for t in tokens],
                   patch_height=hp, patch_width=wp)

    params = lseg_jax.load_hf_dpt_neck_state_dict(
        {k: v for k, v in neck.state_dict().items()}, {}, TINY)
    out = lseg_jax.neck(params, [np.asarray(t) for t in tokens], hp, wp,
                        TINY)
    # DPTNeck returns fused states deepest-first; the last one is the
    # half-resolution path our head consumes.
    expected = ref[-1].permute(0, 2, 3, 1).numpy()
    assert np.asarray(out).shape == expected.shape
    np.testing.assert_allclose(np.asarray(out), expected,
                               atol=1e-4, rtol=1e-3)


def _random_lseg_state(rng, config=TINY):
    """Minimal lang-seg-shaped checkpoint (lightning naming, random,
    tiny widths)."""
    vit = config.vit
    w = vit.width
    state = {}

    def t(*shape, scale=0.2):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    pre = 'net.pretrained.model.'
    state[pre + 'patch_embed.proj.weight'] = t(w, 3, 16, 16)
    state[pre + 'patch_embed.proj.bias'] = t(w)
    state[pre + 'cls_token'] = t(1, 1, w)
    state[pre + 'pos_embed'] = t(1, 17, w)
    state[pre + 'norm.weight'] = np.ones(w, np.float32)
    state[pre + 'norm.bias'] = np.zeros(w, np.float32)
    for i in range(vit.depth):
        b = f'{pre}blocks.{i}.'
        state[b + 'norm1.weight'] = np.ones(w, np.float32)
        state[b + 'norm1.bias'] = np.zeros(w, np.float32)
        state[b + 'norm2.weight'] = np.ones(w, np.float32)
        state[b + 'norm2.bias'] = np.zeros(w, np.float32)
        state[b + 'attn.qkv.weight'] = t(3 * w, w)
        state[b + 'attn.qkv.bias'] = t(3 * w)
        state[b + 'attn.proj.weight'] = t(w, w)
        state[b + 'attn.proj.bias'] = t(w)
        state[b + 'mlp.fc1.weight'] = t(4 * w, w)
        state[b + 'mlp.fc1.bias'] = t(4 * w)
        state[b + 'mlp.fc2.weight'] = t(w, 4 * w)
        state[b + 'mlp.fc2.bias'] = t(w)
    for k, (dim, factor) in enumerate(zip(config.neck_dims,
                                          config.factors), start=1):
        a = f'net.pretrained.act_postprocess{k}.'
        state[a + '0.project.0.weight'] = t(w, 2 * w)
        state[a + '0.project.0.bias'] = t(w)
        state[a + '3.weight'] = t(dim, w, 1, 1)
        state[a + '3.bias'] = t(dim)
        if factor > 1:
            state[a + '4.weight'] = t(dim, dim, int(factor), int(factor))
            state[a + '4.bias'] = t(dim)
        elif factor < 1:
            state[a + '4.weight'] = t(dim, dim, 3, 3)
            state[a + '4.bias'] = t(dim)
        state[f'net.scratch.layer{k}_rn.weight'] = t(config.features, dim,
                                                     3, 3)
    for k in range(1, 5):
        r = f'net.scratch.refinenet{k}.'
        f = config.features
        for unit in ('resConfUnit1', 'resConfUnit2'):
            state[r + unit + '.conv1.weight'] = t(f, f, 3, 3)
            state[r + unit + '.conv1.bias'] = t(f)
            state[r + unit + '.conv2.weight'] = t(f, f, 3, 3)
            state[r + unit + '.conv2.bias'] = t(f)
        state[r + 'out_conv.weight'] = t(f, f, 1, 1)
        state[r + 'out_conv.bias'] = t(f)
    state['net.scratch.head1.weight'] = t(config.out_dim, config.features,
                                          1, 1)
    state['net.scratch.head1.bias'] = t(config.out_dim)
    state['net.logit_scale'] = np.asarray(4.6, np.float32)
    return state


def test_lseg_loader_infers_config_and_runs():
    rng = np.random.default_rng(2)
    params, config = lseg_jax.load_lseg_state_dict(_random_lseg_state(rng))
    assert config.vit.width == TINY.vit.width
    assert config.vit.depth == TINY.vit.depth
    assert config.hooks == TINY.hooks
    assert config.neck_dims == TINY.neck_dims
    assert config.out_dim == TINY.out_dim

    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    out = np.asarray(lseg_jax.compute_features(params, x, config))
    assert out.shape == (1, 64, 64, TINY.out_dim)
    assert np.isfinite(out).all()
    # Features are unit-normalized at the decoder's native resolution;
    # the final bilinear upsample keeps norms in (0, 1].
    norms = np.linalg.norm(out, axis=-1)
    assert (norms > 0.1).all() and (norms < 1.0 + 1e-4).all()


def test_lseg_handles_non_multiple_of_32_sizes():
    """240x320-style inputs (15-patch grids) flow through the
    mismatch-tolerant fusion resizes and round-trip to the input size."""
    rng = np.random.default_rng(3)
    params, config = lseg_jax.load_lseg_state_dict(_random_lseg_state(rng))
    x = rng.random((1, 3, 48, 80)).astype(np.float32)
    out = np.asarray(lseg_jax.compute_features(params, x, config))
    assert out.shape == (1, 48, 80, TINY.out_dim)
    assert np.isfinite(out).all()


def test_lseg_fe_uses_jax_tower_from_env(tmp_path, monkeypatch):
    """LSegFE with AUTOLABEL_LSEG_WEIGHTS and no lang-seg runs REAL pixel
    features through the JAX tower (no --allow-fallback needed)."""
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(4)
    state = {k: torch.as_tensor(v)
             for k, v in _random_lseg_state(rng).items()}
    ckpt = tmp_path / 'demo_e200.ckpt'
    torch.save({'state_dict': state, 'epoch': 200}, ckpt)
    monkeypatch.setenv('AUTOLABEL_LSEG_WEIGHTS', str(ckpt))

    from autolabel_tpu.features.lseg import LSegFE
    fe = LSegFE(allow_fallback=False)
    assert fe._jax_image is not None
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    out = fe(x)
    assert out.shape == (1, 32, 32, TINY.out_dim)
    assert np.isfinite(out).all()
    assert fe.shape((64, 64)) == (32, 32)


def test_compute_feature_maps_cli_runs_jax_lseg(sphere_scene, tmp_path,
                                                monkeypatch):
    """`compute_feature_maps --features lseg` runs through the JAX tower
    when AUTOLABEL_LSEG_WEIGHTS is supplied — no --allow-fallback."""
    import os
    import sys

    import h5py
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(5)
    state = {k: torch.as_tensor(v)
             for k, v in _random_lseg_state(rng).items()}
    ckpt = tmp_path / 'demo_e200.ckpt'
    torch.save({'state_dict': state}, ckpt)
    monkeypatch.setenv('AUTOLABEL_LSEG_WEIGHTS', str(ckpt))

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts')
    monkeypatch.syspath_prepend(scripts)
    import compute_feature_maps
    monkeypatch.setattr(sys, 'argv', [
        'compute_feature_maps.py', sphere_scene, '--features', 'lseg',
        '--dim', str(TINY.out_dim)])
    compute_feature_maps.main()

    with h5py.File(os.path.join(sphere_scene, 'features.hdf'), 'r') as f:
        ds = f['features/lseg']
        assert ds.shape[0] == 12 and ds.shape[3] == TINY.out_dim
        assert np.isfinite(ds[:]).all()
        # Real unit-norm CLIP-space features, not random stand-ins.
        norms = np.linalg.norm(ds[:].astype(np.float32), axis=-1)
        assert (norms > 0.1).all()
