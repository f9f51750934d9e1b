"""JAX ViT-S/8 — the DINO feature teacher as a TPU-native forward pass.

The reference distills DINO ViT-S/8 patch features
(/root/reference/autolabel/features/dino.py:9-27: torch-hub model,
last-layer patch tokens after the final LayerNorm). This environment has
no network access to fetch the pretrained weights, so the extractor
cannot silently "work"; instead this module provides:

  - the full ViT forward in JAX (patch embed, CLS token, interpolated
    position embeddings, pre-LN transformer blocks, final LN) matching
    the timm/DINO architecture exactly;
  - loaders for BOTH checkpoint namings: the DINO/timm state_dict the
    official weights ship with (load_timm_state_dict) and the
    HuggingFace transformers naming (load_hf_state_dict);
  - numerical validation against transformers' ViTModel with SHARED
    random weights (tests/test_vit_jax.py) — so when real weights are
    supplied (AUTOLABEL_DINO_WEIGHTS=<path to dino_deitsmall8 .pth>)
    the path is already proven correct end to end.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    width: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: int = 4

    @property
    def head_dim(self):
        return self.width // self.heads

    @property
    def mlp_dim(self):
        return self.width * self.mlp_ratio


DINO_VITS8 = ViTConfig()


def init_params(key, config=DINO_VITS8, pos_grid=28):
    """Random-init parameter tree with the same pytree layout the
    checkpoint loaders produce (pos_grid: side length of the position-
    embedding grid, 28 for DINO's 224/8 training resolution)."""
    w = config.width
    keys = iter(jax.random.split(key, 6 + 12 * config.depth))

    def dense(key, d_in, d_out):
        scale = (2.0 / (d_in + d_out)) ** 0.5
        return {'w': jax.random.normal(key, (d_in, d_out)) * scale,
                'b': jnp.zeros((d_out,))}

    params = {
        'patch_embed': dense(next(keys), 3 * config.patch_size ** 2, w),
        'cls_token': jax.random.normal(next(keys), (1, 1, w)) * 0.02,
        'pos_embed': jax.random.normal(
            next(keys), (1, pos_grid * pos_grid + 1, w)) * 0.02,
        'norm': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
        'blocks': [],
    }
    for _ in range(config.depth):
        params['blocks'].append({
            'ln1': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
            'ln2': {'scale': jnp.ones((w,)), 'bias': jnp.zeros((w,))},
            'qkv': dense(next(keys), w, 3 * w),
            'proj': dense(next(keys), w, w),
            'fc1': dense(next(keys), w, config.mlp_dim),
            'fc2': dense(next(keys), config.mlp_dim, w),
        })
    return params


# -- weight import -----------------------------------------------------------


def _t(array):
    return jnp.asarray(np.asarray(array), jnp.float32)


def _infer_depth(state_dict, prefix):
    depth = 0
    while any(key.startswith(f'{prefix}{depth}.') for key in state_dict):
        depth += 1
    return depth


def load_timm_state_dict(state_dict, config=None):
    """DINO/timm naming: patch_embed.proj, blocks.N.attn.qkv, mlp.fc1…
    config=None infers the depth from the checkpoint."""
    if config is None:
        config = dataclasses.replace(
            DINO_VITS8, depth=_infer_depth(state_dict, 'blocks.'))
    w = config.width
    p = config.patch_size
    conv = _t(state_dict['patch_embed.proj.weight'])  # (w, 3, p, p)
    params = {
        'patch_embed': {
            # conv as matmul over flattened (3, p, p) patches.
            'w': conv.reshape(w, 3 * p * p).T,
            'b': _t(state_dict['patch_embed.proj.bias']),
        },
        'cls_token': _t(state_dict['cls_token']),
        'pos_embed': _t(state_dict['pos_embed']),
        'norm': {'scale': _t(state_dict['norm.weight']),
                 'bias': _t(state_dict['norm.bias'])},
        'blocks': [],
    }
    for i in range(config.depth):
        pre = f'blocks.{i}.'
        params['blocks'].append({
            'ln1': {'scale': _t(state_dict[pre + 'norm1.weight']),
                    'bias': _t(state_dict[pre + 'norm1.bias'])},
            'ln2': {'scale': _t(state_dict[pre + 'norm2.weight']),
                    'bias': _t(state_dict[pre + 'norm2.bias'])},
            'qkv': {'w': _t(state_dict[pre + 'attn.qkv.weight']).T,
                    'b': _t(state_dict[pre + 'attn.qkv.bias'])},
            'proj': {'w': _t(state_dict[pre + 'attn.proj.weight']).T,
                     'b': _t(state_dict[pre + 'attn.proj.bias'])},
            'fc1': {'w': _t(state_dict[pre + 'mlp.fc1.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.fc1.bias'])},
            'fc2': {'w': _t(state_dict[pre + 'mlp.fc2.weight']).T,
                    'b': _t(state_dict[pre + 'mlp.fc2.bias'])},
        })
    return params


def load_hf_state_dict(state_dict, config=None):
    """HuggingFace transformers ViTModel naming (validation vehicle)."""
    if config is None:
        config = dataclasses.replace(
            DINO_VITS8, depth=_infer_depth(state_dict, 'encoder.layer.'))
    w = config.width
    p = config.patch_size
    conv = _t(state_dict['embeddings.patch_embeddings.projection.weight'])
    params = {
        'patch_embed': {
            'w': conv.reshape(w, 3 * p * p).T,
            'b': _t(
                state_dict['embeddings.patch_embeddings.projection.bias']),
        },
        'cls_token': _t(state_dict['embeddings.cls_token']),
        'pos_embed': _t(state_dict['embeddings.position_embeddings']),
        'norm': {'scale': _t(state_dict['layernorm.weight']),
                 'bias': _t(state_dict['layernorm.bias'])},
        'blocks': [],
    }
    for i in range(config.depth):
        pre = f'encoder.layer.{i}.'
        qkv_w = jnp.concatenate([
            _t(state_dict[pre + f'attention.attention.{k}.weight']).T
            for k in ('query', 'key', 'value')], axis=1)
        qkv_b = jnp.concatenate([
            _t(state_dict[pre + f'attention.attention.{k}.bias'])
            for k in ('query', 'key', 'value')])
        params['blocks'].append({
            'ln1': {'scale': _t(state_dict[pre + 'layernorm_before.weight']),
                    'bias': _t(state_dict[pre + 'layernorm_before.bias'])},
            'ln2': {'scale': _t(state_dict[pre + 'layernorm_after.weight']),
                    'bias': _t(state_dict[pre + 'layernorm_after.bias'])},
            'qkv': {'w': qkv_w, 'b': qkv_b},
            'proj': {'w': _t(
                state_dict[pre + 'attention.output.dense.weight']).T,
                'b': _t(state_dict[pre + 'attention.output.dense.bias'])},
            'fc1': {'w': _t(state_dict[pre + 'intermediate.dense.weight']).T,
                    'b': _t(state_dict[pre + 'intermediate.dense.bias'])},
            'fc2': {'w': _t(state_dict[pre + 'output.dense.weight']).T,
                    'b': _t(state_dict[pre + 'output.dense.bias'])},
        })
    return params


# -- forward ------------------------------------------------------------------


def _layer_norm(x, p, eps=1e-6):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p['scale'] + p['bias']


def _dense(x, p):
    return x @ p['w'] + p['b']


def _attention(x, block, config):
    b, n, w = x.shape
    qkv = _dense(x, block['qkv']).reshape(b, n, 3, config.heads,
                                          config.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
    logits = jnp.einsum('bnhd,bmhd->bhnm', q, k) / config.head_dim ** 0.5
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhnm,bmhd->bnhd', weights, v).reshape(b, n, w)
    return _dense(out, block['proj'])


def _interpolate_pos_embed(pos_embed, h_patches, w_patches):
    """Bicubic grid interpolation of the (trained-resolution) position
    embeddings — DINO's trick for arbitrary input sizes."""
    n = pos_embed.shape[1] - 1
    side = int(round(n ** 0.5))
    if (h_patches, w_patches) == (side, side):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    grid = pos_embed[:, 1:].reshape(1, side, side, -1)
    grid = jax.image.resize(grid,
                            (1, h_patches, w_patches, grid.shape[-1]),
                            method='cubic')
    return jnp.concatenate(
        [cls_pos, grid.reshape(1, h_patches * w_patches, -1)], axis=1)


def encode_image(params, images, config=DINO_VITS8, ln_eps=1e-6):
    """images: (B, 3, H, W) float (already normalized) with H, W multiples
    of patch_size -> patch features (B, H/p, W/p, width) after the final
    LayerNorm (DINO get_intermediate_layers semantics)."""
    b, _, h, w = images.shape
    p = config.patch_size
    hp, wp = h // p, w // p
    # (B, 3, H, W) -> (B, hp, wp, 3*p*p) patch vectors; channel-major
    # within the patch to match the conv-kernel flattening above.
    x = images.reshape(b, 3, hp, p, wp, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, hp * wp, 3 * p * p)
    x = _dense(x, params['patch_embed'])

    cls = jnp.broadcast_to(params['cls_token'], (b, 1, config.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interpolate_pos_embed(params['pos_embed'], hp, wp)

    for block in params['blocks']:
        x = x + _attention(_layer_norm(x, block['ln1'], ln_eps), block,
                           config)
        h_mlp = _dense(_layer_norm(x, block['ln2'], ln_eps), block['fc1'])
        x = x + _dense(jax.nn.gelu(h_mlp, approximate=False), block['fc2'])

    x = _layer_norm(x, params['norm'], ln_eps)
    return x[:, 1:].reshape(b, hp, wp, config.width)
