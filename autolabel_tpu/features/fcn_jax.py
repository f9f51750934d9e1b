"""JAX FCN-ResNet50 — the dense-feature teacher as a TPU-native forward.

The reference extracts 512-channel stride-8 feature maps from
torchvision's fcn_resnet50 at the 'classifier.2' node (ReLU after the
head's 3x3 conv; /root/reference/autolabel/features/fcn50.py:12-29).
torchvision is not installed in this environment, so — following the
features/vit_jax.py pattern — this module provides:

  - the full eval-mode forward in JAX: ResNet-50 v1.5 backbone with the
    segmentation dilation scheme (stages 3/4 keep stride 1 with
    dilations 2/4 -> output stride 8), plus the FCN head conv + ReLU;
  - batch norms folded into their convolutions at load time (eval-mode
    BN is an affine map — folding leaves one conv per layer for the MXU);
  - loaders for BOTH namings: torchvision's fcn_resnet50 state dict
    (load_torchvision_state_dict — what AUTOLABEL_FCN50_WEIGHTS points
    at) and HuggingFace transformers' ResNetModel naming
    (load_hf_resnet_state_dict — the validation vehicle);
  - numerical validation against transformers' ResNetModel with SHARED
    random weights (tests/test_fcn_jax.py) covering the non-dilated
    backbone; the dilated stages reuse the same block code with
    different (stride, dilation) statics.

Weights layout: convs are HWIO ('w' (kh, kw, cin, cout), 'b' (cout,)),
inputs NCHW at the API boundary (parity with the torch extractors),
NHWC internally (TPU-native layout).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# ResNet-50: bottleneck counts per stage and the segmentation dilation
# scheme (torchvision fcn_resnet50: replace_stride_with_dilation =
# [False, True, True]).
RESNET50_DEPTHS = (3, 4, 6, 3)
SEG_STRIDES = (1, 2, 1, 1)
SEG_DILATIONS = (1, 1, 2, 4)
CLS_STRIDES = (1, 2, 2, 2)
CLS_DILATIONS = (1, 1, 1, 1)
_BN_EPS = 1e-5


def _t(a):
    return np.asarray(a, np.float32)


def _fold_bn(conv_w, gamma, beta, mean, var, eps=_BN_EPS):
    """Fold an eval-mode BatchNorm into the preceding (bias-free) conv.

    conv_w: torch layout (cout, cin, kh, kw). Returns HWIO 'w' + 'b'.
    """
    conv_w = _t(conv_w)
    scale = _t(gamma) / np.sqrt(_t(var) + eps)
    w = conv_w * scale[:, None, None, None]
    b = _t(beta) - _t(mean) * scale
    return {'w': jnp.asarray(w.transpose(2, 3, 1, 0)),
            'b': jnp.asarray(b)}


def _conv_bn(state, conv_key, bn_key):
    return _fold_bn(state[f'{conv_key}.weight'],
                    state[f'{bn_key}.weight'],
                    state[f'{bn_key}.bias'],
                    state[f'{bn_key}.running_mean'],
                    state[f'{bn_key}.running_var'])


def load_torchvision_state_dict(state_dict, depths=None):
    """fcn_resnet50 naming: backbone.conv1/bn1, backbone.layerL.B.convN/
    bnN (+ .downsample.0/.1), classifier.0/.1 (+ ignored aux/final
    classifier convs). depths=None infers block counts per stage."""
    state = {k: v for k, v in state_dict.items()}
    if depths is None:
        depths = []
        for stage in range(4):
            depth = 0
            while (f'backbone.layer{stage + 1}.{depth}.conv1.weight'
                   in state):
                depth += 1
            depths.append(depth)
    params = {
        'stem': _conv_bn(state, 'backbone.conv1', 'backbone.bn1'),
        'stages': [],
    }
    for stage, depth in enumerate(depths):
        blocks = []
        for i in range(depth):
            pre = f'backbone.layer{stage + 1}.{i}.'
            block = {
                'conv1': _conv_bn(state, pre + 'conv1', pre + 'bn1'),
                'conv2': _conv_bn(state, pre + 'conv2', pre + 'bn2'),
                'conv3': _conv_bn(state, pre + 'conv3', pre + 'bn3'),
            }
            if pre + 'downsample.0.weight' in state:
                block['shortcut'] = _conv_bn(state, pre + 'downsample.0',
                                             pre + 'downsample.1')
            blocks.append(block)
        params['stages'].append(blocks)
    if 'classifier.0.weight' in state:
        params['head'] = _conv_bn(state, 'classifier.0', 'classifier.1')
    return params


def load_hf_resnet_state_dict(state_dict, depths):
    """transformers ResNetModel naming (validation vehicle); backbone
    only — no FCN head."""
    state = {k: v for k, v in state_dict.items()}
    params = {
        'stem': _conv_bn(state, 'embedder.embedder.convolution',
                         'embedder.embedder.normalization'),
        'stages': [],
    }
    for stage, depth in enumerate(depths):
        blocks = []
        for i in range(depth):
            pre = f'encoder.stages.{stage}.layers.{i}.'
            block = {}
            for j, name in enumerate(('conv1', 'conv2', 'conv3')):
                block[name] = _conv_bn(
                    state, pre + f'layer.{j}.convolution',
                    pre + f'layer.{j}.normalization')
            if pre + 'shortcut.convolution.weight' in state:
                block['shortcut'] = _conv_bn(
                    state, pre + 'shortcut.convolution',
                    pre + 'shortcut.normalization')
            blocks.append(block)
        params['stages'].append(blocks)
    return params


# -- forward ------------------------------------------------------------------


def _conv(x, p, stride=1, dilation=1):
    """NHWC conv with SAME-style explicit padding (torch pad = k//2 *
    dilation for the kernels used here)."""
    kh, kw = p['w'].shape[:2]
    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation
    out = jax.lax.conv_general_dilated(
        x, p['w'],
        window_strides=(stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + p['b']


def _bottleneck(x, block, stride, dilation, first_dilation):
    """ResNet v1.5 bottleneck: 1x1 -> 3x3 (stride/dilation) -> 1x1 with
    projection shortcut when present. first_dilation: torchvision keeps
    the PREVIOUS stage dilation on the stage's first block's 3x3."""
    h = jax.nn.relu(_conv(x, block['conv1']))
    h = jax.nn.relu(_conv(h, block['conv2'], stride=stride,
                          dilation=first_dilation))
    h = _conv(h, block['conv3'])
    if 'shortcut' in block:
        x = _conv(x, block['shortcut'], stride=stride)
    return jax.nn.relu(h + x)


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def backbone_forward(params, x, strides=SEG_STRIDES,
                     dilations=SEG_DILATIONS):
    """x: (B, H, W, 3) normalized NHWC -> final-stage features NHWC."""
    h = jax.nn.relu(_conv(x, params['stem'], stride=2))
    h = _max_pool_3x3_s2(h)
    prev_dilation = 1
    for blocks, stride, dilation in zip(params['stages'], strides,
                                        dilations):
        for i, block in enumerate(blocks):
            if i == 0:
                h = _bottleneck(h, block, stride, dilation, prev_dilation)
            else:
                h = _bottleneck(h, block, 1, dilation, dilation)
        prev_dilation = dilation
    return h


def fcn_features(params, images):
    """images: (B, 3, H, W) float in [0, 1], ImageNet-normalized by the
    caller? NO — raw [0, 1]; normalization happens here (parity with the
    torch wrapper). Returns (B, H/8, W/8, 512) float32 — torchvision's
    'classifier.2' node (head conv + BN + ReLU)."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = jnp.transpose(jnp.asarray(images, jnp.float32), (0, 2, 3, 1))
    x = (x - mean) / std
    h = backbone_forward(params, x)
    return jax.nn.relu(_conv(h, params['head']))


@dataclasses.dataclass
class FCNJax:
    """Callable wrapper matching the FCN50 extractor contract."""
    params: dict

    def __post_init__(self):
        self._fn = jax.jit(fcn_features)

    def __call__(self, x):
        """(B, 3, H, W) [0,1] -> (B, H/8, W/8, 512) float16."""
        return np.asarray(self._fn(self.params, np.asarray(x)),
                          np.float16)
