"""JAX LSeg image tower — ViT-L/16 backbone + DPT decoder + 512-d
CLIP-aligned pixel projection as a TPU-native forward pass.

The reference's LSeg teacher (autolabel/features/lseg.py:54-66) produces
half-resolution 512-d pixel features aligned with the CLIP ViT-B/32 text
space via the lang-seg stack: a timm ViT-L/16(384) backbone hooked after
blocks (5, 11, 17, 23), a DPT decoder (project-readout reassemble to
channel sizes (256, 512, 1024, 1024) at strides (4, 8, 16, 32), RefineNet
feature fusion to 256 channels at half input resolution), and a final 1x1
head to 512 channels whose per-pixel embeddings are unit-normalized and
matched against CLIP text embeddings (lang-seg lseg_net.py semantics; the
text tower lives in features/clip_text_jax.py).

This environment cannot install lang-seg/clip, so like vit_jax/fcn_jax
this module provides the full forward in JAX plus weight loaders for the
published checkpoint namings, numerically validated against independent
torch implementations with SHARED random weights
(tests/test_lseg_jax.py — backbone vs transformers.ViTModel hidden
states, decoder vs transformers.models.dpt.DPTNeck). When real lang-seg
weights are supplied (AUTOLABEL_LSEG_WEIGHTS=<demo_e200.ckpt or state
dict>) the path is already proven correct end to end.

All spatial ops are static-shape and XLA-friendly: the bilinear resizes
are expressed as two dense contraction matrices (MXU work, no gathers),
convolutions go through lax.conv_general_dilated in NHWC, and the whole
tower jits as one program per input shape.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from autolabel_tpu.features.vit_jax import (ViTConfig, _attention, _dense,
                                            _interpolate_pos_embed,
                                            _layer_norm)


@dataclasses.dataclass(frozen=True)
class LSegConfig:
    vit: ViTConfig = ViTConfig(patch_size=16, width=1024, depth=24,
                               heads=16)
    hooks: tuple = (5, 11, 17, 23)
    neck_dims: tuple = (256, 512, 1024, 1024)
    # Reassemble output strides relative to the patch grid: x4 and x2
    # transposed convs, identity, and a stride-2 conv (DPT-large).
    factors: tuple = (4, 2, 1, 0.5)
    features: int = 256
    out_dim: int = 512


LSEG_VITL16 = LSegConfig()


def default_hooks(depth):
    """lang-seg hook schedule: (5, 11, 17, 23) for ViT-L/24,
    (2, 5, 8, 11) for ViT-B/12 — the last block of each depth quarter."""
    return tuple((i + 1) * depth // 4 - 1 for i in range(4))


# -- primitives ---------------------------------------------------------------


def _conv2d(x, w, stride=1, bias=None, padding=1):
    """x (B, H, W, Cin), w (kh, kw, Cin, Cout) HWIO."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        y = y + bias
    return y


def _conv_transpose_exact(x, p, factor):
    """ConvTranspose2d with kernel == stride (non-overlapping): every
    input pixel expands into an independent factor x factor block, so the
    whole op is one dense contraction + reshape (pure MXU work).
    p['w']: (Cin, Cout, f, f) in the torch layout."""
    b, h, w, _ = x.shape
    cout = p['w'].shape[1]
    y = jnp.einsum('bhwc,codf->bhdwfo', x, p['w'])
    y = y.reshape(b, h * factor, w * factor, cout)
    return y + p['b']


def _resize_matrix(n_out, n_in, align_corners):
    """(n_out, n_in) bilinear interpolation matrix (torch semantics)."""
    if align_corners and n_out > 1:
        src = jnp.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
    else:
        src = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = jnp.clip(src, 0, n_in - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.minimum(lo + 1, n_in - 1)
    w_hi = (src - lo).astype(jnp.float32)
    return (jax.nn.one_hot(lo, n_in) * (1.0 - w_hi)[:, None]
            + jax.nn.one_hot(hi, n_in) * w_hi[:, None])


def bilinear_resize(x, size, align_corners):
    """x (B, H, W, C) -> (B, size[0], size[1], C). Expressed as two
    matrix contractions so XLA maps it onto the MXU instead of gathers."""
    if x.shape[1:3] == tuple(size):
        return x
    mh = _resize_matrix(size[0], x.shape[1], align_corners)
    mw = _resize_matrix(size[1], x.shape[2], align_corners)
    x = jnp.einsum('oh,bhwc->bowc', mh, x)
    return jnp.einsum('pw,bhwc->bhpc', mw, x)


# -- backbone -----------------------------------------------------------------


def backbone_hooks(params, images, config=LSEG_VITL16, ln_eps=1e-6):
    """images (B, 3, H, W), already normalized, H and W multiples of
    patch_size -> list of hooked token arrays (B, 1 + hp*wp, width) (the
    raw block outputs, pre final-LN — timm forward-hook semantics DPT
    taps; lang-seg lseg_vit.py hooks=[5, 11, 17, 23])."""
    vit = config.vit
    b, _, h, w = images.shape
    p = vit.patch_size
    hp, wp = h // p, w // p
    x = images.reshape(b, 3, hp, p, wp, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, hp * wp, 3 * p * p)
    x = _dense(x, params['patch_embed'])
    cls = jnp.broadcast_to(params['cls_token'], (b, 1, vit.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolate_pos_embed(params['pos_embed'], hp, wp)

    hooked = []
    for i, block in enumerate(params['blocks']):
        x = x + _attention(_layer_norm(x, block['ln1'], ln_eps), block, vit)
        h_mlp = _dense(_layer_norm(x, block['ln2'], ln_eps), block['fc1'])
        x = x + _dense(jax.nn.gelu(h_mlp, approximate=False), block['fc2'])
        if i in config.hooks:
            hooked.append(x)
    return hooked, hp, wp


# -- DPT decoder --------------------------------------------------------------


def _residual_unit(x, p):
    """Pre-activation residual conv unit (DPT ResidualConvUnit_custom,
    bn=False so the convs carry biases)."""
    h = _conv2d(jax.nn.relu(x), p['conv1']['w'], bias=p['conv1']['b'])
    h = _conv2d(jax.nn.relu(h), p['conv2']['w'], bias=p['conv2']['b'])
    return x + h


def _fusion_layer(hidden, lateral, p):
    """DPT FeatureFusionBlock: merge the deeper path with the lateral
    reassembled feature, refine, upsample x2 (align_corners=True), 1x1
    project."""
    if lateral is not None:
        if lateral.shape != hidden.shape:
            lateral = bilinear_resize(lateral, hidden.shape[1:3],
                                      align_corners=False)
        hidden = hidden + _residual_unit(lateral, p['res1'])
    hidden = _residual_unit(hidden, p['res2'])
    hidden = bilinear_resize(
        hidden, (2 * hidden.shape[1], 2 * hidden.shape[2]),
        align_corners=True)
    return _dense(hidden, p['proj'])


def neck(params, hooked, hp, wp, config=LSEG_VITL16):
    """Project-readout reassemble + RefineNet fusion -> (B, 2*hp, 2*wp,
    features): the DPT decoder at half input resolution."""
    b = hooked[0].shape[0]
    feats = []
    for i, tokens in enumerate(hooked):
        cls, patches = tokens[:, :1], tokens[:, 1:]
        readout = jnp.broadcast_to(cls, patches.shape)
        h = jnp.concatenate([patches, readout], axis=-1)
        h = jax.nn.gelu(_dense(h, params['readout'][i]), approximate=False)
        h = h.reshape(b, hp, wp, -1)
        h = _dense(h, params['project'][i])
        factor = config.factors[i]
        if factor > 1:
            h = _conv_transpose_exact(h, params['resize'][i], int(factor))
        elif factor < 1:
            h = _conv2d(h, params['resize'][i]['w'], stride=2,
                        bias=params['resize'][i]['b'])
        h = _conv2d(h, params['layer_rn'][i])
        feats.append(h)

    fused = None
    for j, lateral in enumerate(reversed(feats)):
        fused = _fusion_layer(lateral if fused is None else fused,
                              None if fused is None else lateral,
                              params['fusion'][j])
    return fused


def compute_features(params, images, config=LSEG_VITL16, ln_eps=1e-6):
    """images (B, 3, H, W), normalized -> unit-norm CLIP-space pixel
    features (B, H, W, out_dim). Normalization happens at the decoder's
    native half resolution (where lang-seg's lseg_net.py normalizes
    before the text matmul); the final align_corners=True upsample then
    restores the input size, so arbitrary (non-/32) sizes round-trip.
    Non-patch-multiple sizes are edge-padded before the backbone and
    cropped after — the role lang-seg's MultiEval crop padding plays."""
    h, w = images.shape[2:]
    p = config.vit.patch_size
    pad_h, pad_w = -h % p, -w % p
    if pad_h or pad_w:
        images = jnp.pad(jnp.asarray(images),
                         ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                         mode='edge')
    hooked, hp, wp = backbone_hooks(params, images, config, ln_eps)
    path1 = neck(params, hooked, hp, wp, config)
    x = _dense(path1, params['head1'])
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    x = bilinear_resize(x, images.shape[2:], align_corners=True)
    return x[:, :h, :w]


# -- weight import ------------------------------------------------------------


def _t(a):
    return jnp.asarray(np.asarray(a), jnp.float32)


def _hwio(conv):
    return _t(conv).transpose(2, 3, 1, 0)


def _dense_p(w, b):
    return {'w': _t(w).T, 'b': _t(b)}


def _conv1x1_p(w, b):
    return {'w': _t(w)[:, :, 0, 0].T, 'b': _t(b)}


def _infer_config(state, vit_pre):
    depth = 0
    while any(k.startswith(f'{vit_pre}blocks.{depth}.') for k in state):
        depth += 1
    conv = np.asarray(state[f'{vit_pre}patch_embed.proj.weight'])
    width, _, patch, _ = conv.shape
    heads = max(width // 64, 1)
    neck_dims = tuple(
        np.asarray(state[f'act_postprocess{k}.3.weight']).shape[0]
        for k in range(1, 5))
    features = np.asarray(
        state['scratch.layer1_rn.weight']).shape[0]
    out_dim = np.asarray(state['scratch.head1.weight']).shape[0]
    return LSegConfig(
        vit=ViTConfig(patch_size=patch, width=width, depth=depth,
                      heads=heads),
        hooks=default_hooks(depth), neck_dims=neck_dims,
        features=features, out_dim=out_dim)


def load_lseg_state_dict(state_dict, config=None):
    """lang-seg checkpoint naming (LSegModule lightning ckpt or its
    net.* state dict): pretrained.model.* is the timm ViT backbone,
    pretrained.act_postprocessK.* the reassemble stacks (0.project.0 the
    readout linear, 3 the 1x1 projection, 4 the resize conv),
    scratch.layerK_rn / scratch.refinenetK / scratch.head1 the fusion
    decoder. config=None infers everything except hooks (lang-seg
    schedule assumed) from the shapes."""
    state = dict(state_dict)
    if 'state_dict' in state and not any('.' in k for k in state):
        state = dict(state['state_dict'])
    for pre in ('module.', 'net.', 'pretrained.'):
        if any(k.startswith(pre) for k in state):
            state = {k[len(pre):] if k.startswith(pre) else k: v
                     for k, v in state.items()}
    vit_pre = 'model.' if any(k.startswith('model.') for k in state) \
        else ''
    if config is None:
        config = _infer_config(state, vit_pre)

    from autolabel_tpu.features.vit_jax import load_timm_state_dict
    vit_keys = ('patch_embed', 'cls_token', 'pos_embed', 'blocks', 'norm')
    vit_state = {k[len(vit_pre):]: v for k, v in state.items()
                 if k.startswith(vit_pre)
                 and k[len(vit_pre):].split('.')[0] in vit_keys}
    params = load_timm_state_dict(vit_state, config.vit)

    params.update(readout=[], project=[], resize=[], layer_rn=[],
                  fusion=[])
    for k in range(1, 5):
        pre = f'act_postprocess{k}.'
        params['readout'].append(
            _dense_p(state[pre + '0.project.0.weight'],
                     state[pre + '0.project.0.bias']))
        params['project'].append(
            _conv1x1_p(state[pre + '3.weight'], state[pre + '3.bias']))
        factor = config.factors[k - 1]
        if factor > 1:
            params['resize'].append({
                'w': _t(state[pre + '4.weight']),  # (Cin, Cout, f, f)
                'b': _t(state[pre + '4.bias'])})
        elif factor < 1:
            params['resize'].append({
                'w': _hwio(state[pre + '4.weight']),
                'b': _t(state[pre + '4.bias'])})
        else:
            params['resize'].append(None)
        params['layer_rn'].append(_hwio(state[f'scratch.layer{k}_rn.weight']))

    # Fusion params in application order: refinenet4 (deepest) first.
    for k in (4, 3, 2, 1):
        pre = f'scratch.refinenet{k}.'
        params['fusion'].append({
            'res1': {
                'conv1': {'w': _hwio(state[pre + 'resConfUnit1.conv1.weight']),
                          'b': _t(state[pre + 'resConfUnit1.conv1.bias'])},
                'conv2': {'w': _hwio(state[pre + 'resConfUnit1.conv2.weight']),
                          'b': _t(state[pre + 'resConfUnit1.conv2.bias'])},
            },
            'res2': {
                'conv1': {'w': _hwio(state[pre + 'resConfUnit2.conv1.weight']),
                          'b': _t(state[pre + 'resConfUnit2.conv1.bias'])},
                'conv2': {'w': _hwio(state[pre + 'resConfUnit2.conv2.weight']),
                          'b': _t(state[pre + 'resConfUnit2.conv2.bias'])},
            },
            'proj': _conv1x1_p(state[pre + 'out_conv.weight'],
                               state[pre + 'out_conv.bias']),
        })
    params['head1'] = _conv1x1_p(state['scratch.head1.weight'],
                                 state['scratch.head1.bias'])
    return params, config


def load_hf_dpt_neck_state_dict(state_dict, params, config):
    """Overlay a transformers DPTNeck state dict (validation vehicle)
    onto an existing params tree (backbone untouched). HF fusion layer N
    is applied to the N-th-deepest feature — same order as ours."""
    s = state_dict
    params = dict(params, readout=[], project=[], resize=[], layer_rn=[],
                  fusion=[])
    for i in range(4):
        params['readout'].append(
            _dense_p(s[f'reassemble_stage.readout_projects.{i}.0.weight'],
                     s[f'reassemble_stage.readout_projects.{i}.0.bias']))
        params['project'].append(
            _conv1x1_p(s[f'reassemble_stage.layers.{i}.projection.weight'],
                       s[f'reassemble_stage.layers.{i}.projection.bias']))
        factor = config.factors[i]
        if factor > 1:
            params['resize'].append({
                'w': _t(s[f'reassemble_stage.layers.{i}.resize.weight']),
                'b': _t(s[f'reassemble_stage.layers.{i}.resize.bias'])})
        elif factor < 1:
            params['resize'].append({
                'w': _hwio(s[f'reassemble_stage.layers.{i}.resize.weight']),
                'b': _t(s[f'reassemble_stage.layers.{i}.resize.bias'])})
        else:
            params['resize'].append(None)
        params['layer_rn'].append(_hwio(s[f'convs.{i}.weight']))
    for i in range(4):
        pre = f'fusion_stage.layers.{i}.'
        params['fusion'].append({
            'res1': {
                'conv1': {
                    'w': _hwio(s[pre + 'residual_layer1.convolution1.weight']),
                    'b': _t(s[pre + 'residual_layer1.convolution1.bias'])},
                'conv2': {
                    'w': _hwio(s[pre + 'residual_layer1.convolution2.weight']),
                    'b': _t(s[pre + 'residual_layer1.convolution2.bias'])},
            },
            'res2': {
                'conv1': {
                    'w': _hwio(s[pre + 'residual_layer2.convolution1.weight']),
                    'b': _t(s[pre + 'residual_layer2.convolution1.bias'])},
                'conv2': {
                    'w': _hwio(s[pre + 'residual_layer2.convolution2.weight']),
                    'b': _t(s[pre + 'residual_layer2.convolution2.bias'])},
            },
            'proj': _conv1x1_p(s[pre + 'projection.weight'],
                               s[pre + 'projection.bias']),
        })
    return params


# -- extractor ----------------------------------------------------------------


class LSegImageEncoder:
    """Pixel-feature extractor with the reference teacher's contract:
    (B, 3, H, W) floats in [0, 1] -> (B, H//2, W//2, out_dim) unit-norm
    CLIP-space features (autolabel/features/lseg.py:37-38,54-66 — the
    image is normalized to [-1, 1] (lang-seg val_transform mean/std 0.5),
    nearest-downsampled to half size, and the tower runs at that size)."""

    def __init__(self, params, config=LSEG_VITL16):
        self.params = params
        self.config = config
        self.out_dim = config.out_dim
        self._forward = jax.jit(
            lambda p, x: compute_features(p, x, config))

    def shape(self, input_shape):
        return (input_shape[0] // 2, input_shape[1] // 2)

    def __call__(self, x):
        x = jnp.asarray(np.asarray(x), jnp.float32) * 2.0 - 1.0
        h, w = x.shape[2] // 2, x.shape[3] // 2
        # Reference downsample is F.interpolate default = nearest.
        x = x[:, :, ::2, ::2] if (x.shape[2] % 2 == 0
                                  and x.shape[3] % 2 == 0) else \
            jax.image.resize(x, (*x.shape[:2], h, w), method='nearest')
        return np.asarray(self._forward(self.params, x))


def load(path):
    """LSegImageEncoder from a lang-seg checkpoint on disk (a lightning
    demo_e200.ckpt / state dict, torch zip or .npz)."""
    if path.endswith('.npz'):
        state = dict(np.load(path))
    else:
        import torch
        payload = torch.load(path, map_location='cpu', weights_only=False)
        state = payload.get('state_dict', payload) \
            if isinstance(payload, dict) else payload
        state = {k: v.numpy() if hasattr(v, 'numpy') else v
                 for k, v in state.items()}
    params, config = load_lseg_state_dict(state)
    return LSegImageEncoder(params, config)


def from_env():
    """LSegImageEncoder from AUTOLABEL_LSEG_WEIGHTS, else None."""
    path = os.environ.get('AUTOLABEL_LSEG_WEIGHTS')
    if not path or not os.path.exists(path):
        return None
    return load(path)
