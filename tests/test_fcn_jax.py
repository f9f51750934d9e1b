"""JAX FCN-ResNet50 vs transformers' ResNetModel with SHARED random
weights — proves the bottleneck/stem/BN-folding forward is correct so a
real torchvision fcn_resnet50 checkpoint (AUTOLABEL_FCN50_WEIGHTS)
yields real teacher features. Dilated stages and the FCN head reuse the
same conv code with different statics and are covered structurally."""
import numpy as np
import pytest

from autolabel_tpu.features import fcn_jax


def _small_hf_resnet():
    transformers = pytest.importorskip('transformers')
    config = transformers.ResNetConfig(
        embedding_size=8,
        hidden_sizes=[16, 32],
        depths=[1, 2],
        layer_type='bottleneck',
        num_channels=3)
    model = transformers.ResNetModel(config)
    model.eval()
    return model


def test_backbone_matches_transformers_resnet():
    torch = pytest.importorskip('torch')
    model = _small_hf_resnet()
    params = fcn_jax.load_hf_resnet_state_dict(model.state_dict(),
                                               depths=(1, 2))

    x = np.random.default_rng(0).random((2, 3, 32, 32)).astype(np.float32)
    with torch.inference_mode():
        ref = model(torch.as_tensor(x)).last_hidden_state.numpy()

    # HF classification layout: stage 0 stride 1, later stages stride 2,
    # no dilation.
    out = fcn_jax.backbone_forward(params,
                                   np.transpose(x, (0, 2, 3, 1)),
                                   strides=(1, 2),
                                   dilations=(1, 1))
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def _random_torchvision_state(rng, depths=(1, 1, 1, 1), width=8):
    """Minimal fcn_resnet50-shaped state dict (random, tiny widths)."""
    state = {}

    def conv_bn(prefix_conv, prefix_bn, cout, cin, k):
        state[f'{prefix_conv}.weight'] = rng.normal(
            size=(cout, cin, k, k)).astype(np.float32) * 0.1
        state[f'{prefix_bn}.weight'] = rng.random(cout).astype(np.float32)
        state[f'{prefix_bn}.bias'] = rng.normal(size=cout).astype(
            np.float32) * 0.1
        state[f'{prefix_bn}.running_mean'] = rng.normal(size=cout).astype(
            np.float32) * 0.1
        state[f'{prefix_bn}.running_var'] = rng.random(cout).astype(
            np.float32) + 0.5

    conv_bn('backbone.conv1', 'backbone.bn1', width, 3, 7)
    cin = width
    for stage, depth in enumerate(depths):
        cout = width * 2 ** stage * 4
        mid = cout // 4
        for i in range(depth):
            pre = f'backbone.layer{stage + 1}.{i}'
            conv_bn(f'{pre}.conv1', f'{pre}.bn1', mid, cin if i == 0
                    else cout, 1)
            conv_bn(f'{pre}.conv2', f'{pre}.bn2', mid, mid, 3)
            conv_bn(f'{pre}.conv3', f'{pre}.bn3', cout, mid, 1)
            if i == 0:
                conv_bn(f'{pre}.downsample.0', f'{pre}.downsample.1',
                        cout, cin, 1)
        cin = cout
    conv_bn('classifier.0', 'classifier.1', 16, cin, 3)
    return state


def test_fcn_head_output_stride_8():
    """Full seg-layout forward: dilated stages keep stride 8, head ReLU
    output is non-negative with the head's channel count."""
    rng = np.random.default_rng(1)
    params = fcn_jax.load_torchvision_state_dict(
        _random_torchvision_state(rng), depths=(1, 1, 1, 1))
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    out = np.asarray(fcn_jax.fcn_features(params, x))
    assert out.shape == (1, 8, 8, 16)
    assert (out >= 0).all() and np.isfinite(out).all()


def test_fcn50_wrapper_uses_jax_port(tmp_path, monkeypatch):
    """FCN50 with AUTOLABEL_FCN50_WEIGHTS and no torchvision runs the
    JAX port without --allow-fallback."""
    torch = pytest.importorskip('torch')
    try:
        import torchvision  # noqa: F401
        pytest.skip('torchvision installed; the torch path takes over')
    except ImportError:
        pass
    rng = np.random.default_rng(2)
    state = {k: torch.as_tensor(v)
             for k, v in _random_torchvision_state(rng).items()}
    ckpt = tmp_path / 'fcn.pth'
    torch.save(state, ckpt)
    monkeypatch.setenv('AUTOLABEL_FCN50_WEIGHTS', str(ckpt))

    from autolabel_tpu.features.fcn50 import FCN50
    fe = FCN50(allow_fallback=False)
    assert fe._jax is not None
    out = fe(rng.random((1, 3, 32, 32)).astype(np.float32))
    assert out.shape == (1, 4, 4, 16)
    assert out.dtype == np.float16
