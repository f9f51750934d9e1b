"""Schema-exact fixtures for the four published teacher checkpoints.

VERDICT r4 #6: real pretrained weights can never execute in this
zero-egress image, so these tests generate synthetic state dicts with
the *published key names and shapes* — DINO `dino_deitsmall8_pretrain.pth`
(facebookresearch/dino hub: reference autolabel/features/dino.py:9-27),
torchvision `fcn_resnet50_coco` (reference features/fcn50.py:9-29),
OpenAI CLIP ViT-B/32 (reference features/lseg.py:40-52), and lang-seg
`demo_e200.ckpt` (reference features/lseg.py:9-66) — and round-trip each
through its env-var loader into a JAX forward. Any key-mapping or shape
bug in the loaders fails here before real weights ever arrive; the only
thing left untested is the tensor values themselves.

All fixtures are random weights at the FULL published sizes (ViT-L/16 is
~300M params), so the module is slow-tier.
"""
import gzip

import numpy as np
import pytest

torch = pytest.importorskip('torch')

pytestmark = pytest.mark.slow


def _t(rng, *shape, scale=0.02):
    return torch.as_tensor(
        (rng.standard_normal(shape) * scale).astype(np.float32))


def _ones(*shape):
    return torch.ones(*shape)


def _zeros(*shape):
    return torch.zeros(*shape)


# -- 1. DINO ViT-S/8 (dino_deitsmall8_pretrain.pth) ---------------------------


def _timm_vit_state(rng, width, depth, mlp, patch, tokens, prefix=''):
    """timm VisionTransformer state-dict keys (DINO/lang-seg backbones)."""
    sd = {
        prefix + 'cls_token': _t(rng, 1, 1, width),
        prefix + 'pos_embed': _t(rng, 1, tokens, width),
        prefix + 'patch_embed.proj.weight': _t(rng, width, 3, patch, patch),
        prefix + 'patch_embed.proj.bias': _zeros(width),
        prefix + 'norm.weight': _ones(width),
        prefix + 'norm.bias': _zeros(width),
    }
    for i in range(depth):
        b = f'{prefix}blocks.{i}.'
        sd[b + 'norm1.weight'] = _ones(width)
        sd[b + 'norm1.bias'] = _zeros(width)
        sd[b + 'attn.qkv.weight'] = _t(rng, 3 * width, width)
        sd[b + 'attn.qkv.bias'] = _zeros(3 * width)
        sd[b + 'attn.proj.weight'] = _t(rng, width, width)
        sd[b + 'attn.proj.bias'] = _zeros(width)
        sd[b + 'norm2.weight'] = _ones(width)
        sd[b + 'norm2.bias'] = _zeros(width)
        sd[b + 'mlp.fc1.weight'] = _t(rng, mlp, width)
        sd[b + 'mlp.fc1.bias'] = _zeros(mlp)
        sd[b + 'mlp.fc2.weight'] = _t(rng, width, mlp)
        sd[b + 'mlp.fc2.bias'] = _zeros(width)
    return sd


def _dino_vits8_state(rng):
    """dino_deitsmall8_pretrain.pth: plain timm ViT-S/8 state dict,
    trained at 224px -> pos_embed (1, 28*28+1, 384)."""
    return _timm_vit_state(rng, width=384, depth=12, mlp=1536, patch=8,
                           tokens=28 * 28 + 1)


def test_dino_deitsmall8_schema(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    path = tmp_path / 'dino_deitsmall8_pretrain.pth'
    torch.save(_dino_vits8_state(rng), str(path))
    monkeypatch.setenv('AUTOLABEL_DINO_WEIGHTS', str(path))

    from autolabel_tpu.features.dino import Dino
    fe = Dino(allow_fallback=False)
    assert fe._jax_params is not None
    x = rng.random((1, 3, 64, 96)).astype(np.float32)
    out = np.asarray(fe(x))
    assert out.shape == (1, 8, 12, 384)
    assert np.isfinite(out).all()
    assert fe.shape((64, 96)) == (8, 12)


def test_dino_full_checkpoint_schema(tmp_path, monkeypatch):
    """dino_deitsmall8_pretrain_full_checkpoint.pth variant: student/
    teacher dicts with module.backbone. prefixes + DINOHead keys."""
    rng = np.random.default_rng(1)
    backbone = {f'module.backbone.{k}': v
                for k, v in _dino_vits8_state(rng).items()}
    # DINOHead (module.head.*): extra keys the loader must ignore.
    backbone['module.head.mlp.0.weight'] = _t(rng, 2048, 384)
    backbone['module.head.mlp.0.bias'] = _zeros(2048)
    backbone['module.head.last_layer.weight_g'] = _ones(65536, 1)
    backbone['module.head.last_layer.weight_v'] = _t(rng, 65536, 256)
    ckpt = {'student': backbone,
            'teacher': {k: v for k, v in backbone.items()},
            'epoch': 800, 'args': None}
    path = tmp_path / 'dino_deitsmall8_pretrain_full_checkpoint.pth'
    torch.save(ckpt, str(path))
    monkeypatch.setenv('AUTOLABEL_DINO_WEIGHTS', str(path))

    from autolabel_tpu.features.dino import Dino
    fe = Dino(allow_fallback=False)
    out = np.asarray(fe(rng.random((1, 3, 32, 32)).astype(np.float32)))
    assert out.shape == (1, 4, 4, 384)
    assert np.isfinite(out).all()


# -- 2. torchvision fcn_resnet50_coco ------------------------------------------


def _bn_state(sd, key, ch):
    sd[key + '.weight'] = _ones(ch)
    sd[key + '.bias'] = _zeros(ch)
    sd[key + '.running_mean'] = _zeros(ch)
    sd[key + '.running_var'] = _ones(ch)
    sd[key + '.num_batches_tracked'] = torch.tensor(533297)


def _fcn_resnet50_state(rng):
    """fcn_resnet50_coco-2587d710.pth: torchvision naming, ResNet-50
    bottleneck backbone (depths 3/4/6/3) + FCNHead + aux_classifier."""
    sd = {'backbone.conv1.weight': _t(rng, 64, 3, 7, 7)}
    _bn_state(sd, 'backbone.bn1', 64)
    inplanes = 64
    for stage, (planes, depth) in enumerate(
            zip((64, 128, 256, 512), (3, 4, 6, 3))):
        for i in range(depth):
            pre = f'backbone.layer{stage + 1}.{i}'
            cin = inplanes if i == 0 else planes * 4
            sd[pre + '.conv1.weight'] = _t(rng, planes, cin, 1, 1)
            _bn_state(sd, pre + '.bn1', planes)
            sd[pre + '.conv2.weight'] = _t(rng, planes, planes, 3, 3)
            _bn_state(sd, pre + '.bn2', planes)
            sd[pre + '.conv3.weight'] = _t(rng, planes * 4, planes, 1, 1)
            _bn_state(sd, pre + '.bn3', planes * 4)
            if i == 0:
                sd[pre + '.downsample.0.weight'] = _t(rng, planes * 4,
                                                      cin, 1, 1)
                _bn_state(sd, pre + '.downsample.1', planes * 4)
        inplanes = planes * 4
    # FCNHead: Conv3x3(2048->512, no bias) + BN + [ReLU, Dropout] +
    # Conv1x1(512->21).
    sd['classifier.0.weight'] = _t(rng, 512, 2048, 3, 3)
    _bn_state(sd, 'classifier.1', 512)
    sd['classifier.4.weight'] = _t(rng, 21, 512, 1, 1)
    sd['classifier.4.bias'] = _zeros(21)
    sd['aux_classifier.0.weight'] = _t(rng, 256, 1024, 3, 3)
    _bn_state(sd, 'aux_classifier.1', 256)
    sd['aux_classifier.4.weight'] = _t(rng, 21, 256, 1, 1)
    sd['aux_classifier.4.bias'] = _zeros(21)
    return sd


def test_fcn_resnet50_coco_schema(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    path = tmp_path / 'fcn_resnet50_coco-1167a1af.pth'
    torch.save(_fcn_resnet50_state(rng), str(path))
    monkeypatch.setenv('AUTOLABEL_FCN50_WEIGHTS', str(path))

    from autolabel_tpu.features.fcn50 import FCN50
    fe = FCN50(allow_fallback=False)
    assert fe._jax is not None
    # The JAX port folded every published stage at the published depths.
    assert [len(s) for s in fe._jax.params['stages']] == [3, 4, 6, 3]
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    out = np.asarray(fe(x))
    assert out.shape == (1, 8, 8, 512)
    assert np.isfinite(out).all()


# -- 3. OpenAI CLIP ViT-B/32 ----------------------------------------------------


def _clip_text_state(rng, prefix=''):
    """Text-tower half of the ViT-B/32 state dict (width 512, depth 12,
    vocab 49408, context 77, embed 512)."""
    sd = {
        prefix + 'positional_embedding': _t(rng, 77, 512),
        prefix + 'text_projection': _t(rng, 512, 512),
        prefix + 'logit_scale': torch.tensor(4.6052),
        prefix + 'token_embedding.weight': _t(rng, 49408, 512),
        prefix + 'ln_final.weight': _ones(512),
        prefix + 'ln_final.bias': _zeros(512),
    }
    for i in range(12):
        b = f'{prefix}transformer.resblocks.{i}.'
        sd[b + 'attn.in_proj_weight'] = _t(rng, 1536, 512)
        sd[b + 'attn.in_proj_bias'] = _zeros(1536)
        sd[b + 'attn.out_proj.weight'] = _t(rng, 512, 512)
        sd[b + 'attn.out_proj.bias'] = _zeros(512)
        sd[b + 'ln_1.weight'] = _ones(512)
        sd[b + 'ln_1.bias'] = _zeros(512)
        sd[b + 'ln_2.weight'] = _ones(512)
        sd[b + 'ln_2.bias'] = _zeros(512)
        sd[b + 'mlp.c_fc.weight'] = _t(rng, 2048, 512)
        sd[b + 'mlp.c_fc.bias'] = _zeros(2048)
        sd[b + 'mlp.c_proj.weight'] = _t(rng, 512, 2048)
        sd[b + 'mlp.c_proj.bias'] = _zeros(512)
    return sd


def _clip_visual_state(rng, prefix='visual.'):
    """Visual tower of ViT-B/32 (width 768, depth 12, 7x7+1 tokens) —
    present in the published file, ignored by the text loader."""
    sd = {
        prefix + 'class_embedding': _t(rng, 768),
        prefix + 'positional_embedding': _t(rng, 50, 768),
        prefix + 'proj': _t(rng, 768, 512),
        prefix + 'conv1.weight': _t(rng, 768, 3, 32, 32),
        prefix + 'ln_pre.weight': _ones(768),
        prefix + 'ln_pre.bias': _zeros(768),
        prefix + 'ln_post.weight': _ones(768),
        prefix + 'ln_post.bias': _zeros(768),
    }
    for i in range(12):
        b = f'{prefix}transformer.resblocks.{i}.'
        sd[b + 'attn.in_proj_weight'] = _t(rng, 2304, 768)
        sd[b + 'attn.in_proj_bias'] = _zeros(2304)
        sd[b + 'attn.out_proj.weight'] = _t(rng, 768, 768)
        sd[b + 'attn.out_proj.bias'] = _zeros(768)
        sd[b + 'ln_1.weight'] = _ones(768)
        sd[b + 'ln_1.bias'] = _zeros(768)
        sd[b + 'ln_2.weight'] = _ones(768)
        sd[b + 'ln_2.bias'] = _zeros(768)
        sd[b + 'mlp.c_fc.weight'] = _t(rng, 3072, 768)
        sd[b + 'mlp.c_fc.bias'] = _zeros(3072)
        sd[b + 'mlp.c_proj.weight'] = _t(rng, 768, 3072)
        sd[b + 'mlp.c_proj.bias'] = _zeros(768)
    return sd


def _clip_vit_b32_state(rng):
    sd = _clip_text_state(rng)
    sd.update(_clip_visual_state(rng))
    # Metadata tensors present in the published JIT state dict.
    sd['input_resolution'] = torch.tensor(224)
    sd['context_length'] = torch.tensor(77)
    sd['vocab_size'] = torch.tensor(49408)
    return sd


def _merges_file(tmp_path):
    lines = ['bpe test vocab v0', 't h', 'th e</w>', 'c a', 'ca t</w>']
    path = tmp_path / 'bpe_simple_vocab_16e6.txt.gz'
    with gzip.open(path, 'wt', encoding='utf-8') as f:
        f.write('\n'.join(lines) + '\n')
    return str(path)


def test_clip_vit_b32_schema(tmp_path, monkeypatch):
    from autolabel_tpu.features import clip_text_jax
    rng = np.random.default_rng(3)
    sd = _clip_vit_b32_state(rng)
    params, config = clip_text_jax.load_openai_state_dict(
        {k: v.numpy() for k, v in sd.items()
         if not k.startswith('visual.') and v.ndim > 0})
    assert (config.vocab_size, config.width, config.depth,
            config.heads, config.context_length, config.embed_dim) \
        == (49408, 512, 12, 8, 77, 512)

    path = tmp_path / 'ViT-B-32.pt'
    torch.save(sd, str(path))
    monkeypatch.setenv('AUTOLABEL_CLIP_WEIGHTS', str(path))
    monkeypatch.setenv('AUTOLABEL_CLIP_BPE', _merges_file(tmp_path))
    enc = clip_text_jax.from_env()
    assert enc is not None and enc.config.vocab_size == 49408
    emb = enc.encode_text(['the cat', 'a red cat'])
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                               atol=1e-5)
    assert np.abs(emb[0] - emb[1]).max() > 1e-4


def _nest_flat_state(sd):
    """Build a nested torch.nn.Module tree whose state_dict() is exactly
    the flat dict `sd` — the shape of the published TorchScript archive."""

    class Node(torch.nn.Module):
        pass

    root = Node()
    for key, value in sd.items():
        parts = key.split('.')
        mod = root
        for p in parts[:-1]:
            if not hasattr(mod, p):
                mod.add_module(p, Node())
            mod = getattr(mod, p)
        if value.ndim == 0 or not value.dtype.is_floating_point:
            mod.register_buffer(parts[-1], value)
        else:
            setattr(mod, parts[-1],
                    torch.nn.Parameter(value, requires_grad=False))
    return root


def test_clip_vit_b32_jit_archive(tmp_path, monkeypatch):
    """The published ViT-B-32.pt is a TorchScript archive, not a plain
    state dict; CLIPTextEncoder must unpack it via torch.jit.load."""
    from autolabel_tpu.features import clip_text_jax
    rng = np.random.default_rng(4)
    module = _nest_flat_state(_clip_vit_b32_state(rng))
    path = tmp_path / 'ViT-B-32.pt'
    torch.jit.script(module).save(str(path))

    enc = clip_text_jax.CLIPTextEncoder(str(path), _merges_file(tmp_path))
    assert enc.config.vocab_size == 49408 and enc.config.depth == 12
    emb = enc.encode_text(['the cat'])
    assert emb.shape == (1, 512) and np.isfinite(emb).all()


# -- 4. lang-seg demo_e200.ckpt -------------------------------------------------


def _demo_e200_state(rng):
    """demo_e200.ckpt state_dict: net.pretrained.model.* = timm
    vit_large_patch16_384 (width 1024, depth 24, 577 tokens),
    net.pretrained.act_postprocess1-4.* + net.scratch.* = the DPT neck
    (dims 256/512/1024/1024, features 256, out 512), net.clip_pretrained.*
    = a full CLIP ViT-B/32 (ignored by the image loader)."""
    sd = _timm_vit_state(rng, width=1024, depth=24, mlp=4096, patch=16,
                         tokens=24 * 24 + 1, prefix='net.pretrained.model.')
    # timm classifier head, present in the ckpt, unused by lang-seg.
    sd['net.pretrained.model.head.weight'] = _t(rng, 1000, 1024)
    sd['net.pretrained.model.head.bias'] = _zeros(1000)

    neck_dims = (256, 512, 1024, 1024)
    for k, dim in enumerate(neck_dims, start=1):
        a = f'net.pretrained.act_postprocess{k}.'
        sd[a + '0.project.0.weight'] = _t(rng, 1024, 2048)
        sd[a + '0.project.0.bias'] = _zeros(1024)
        sd[a + '3.weight'] = _t(rng, dim, 1024, 1, 1)
        sd[a + '3.bias'] = _zeros(dim)
        if k == 1:   # ConvTranspose2d(256, 256, 4, stride=4)
            sd[a + '4.weight'] = _t(rng, dim, dim, 4, 4)
            sd[a + '4.bias'] = _zeros(dim)
        elif k == 2:  # ConvTranspose2d(512, 512, 2, stride=2)
            sd[a + '4.weight'] = _t(rng, dim, dim, 2, 2)
            sd[a + '4.bias'] = _zeros(dim)
        elif k == 4:  # Conv2d(1024, 1024, 3, stride=2, padding=1)
            sd[a + '4.weight'] = _t(rng, dim, dim, 3, 3)
            sd[a + '4.bias'] = _zeros(dim)
        sd[f'net.scratch.layer{k}_rn.weight'] = _t(rng, 256, dim, 3, 3)
    for k in range(1, 5):
        r = f'net.scratch.refinenet{k}.'
        for unit in ('resConfUnit1', 'resConfUnit2'):
            sd[r + unit + '.conv1.weight'] = _t(rng, 256, 256, 3, 3)
            sd[r + unit + '.conv1.bias'] = _zeros(256)
            sd[r + unit + '.conv2.weight'] = _t(rng, 256, 256, 3, 3)
            sd[r + unit + '.conv2.bias'] = _zeros(256)
        sd[r + 'out_conv.weight'] = _t(rng, 256, 256, 1, 1)
        sd[r + 'out_conv.bias'] = _zeros(256)
    sd['net.scratch.head1.weight'] = _t(rng, 512, 256, 1, 1)
    sd['net.scratch.head1.bias'] = _zeros(512)
    sd['net.logit_scale'] = torch.tensor(4.6052)
    sd.update(_clip_text_state(rng, prefix='net.clip_pretrained.'))
    sd.update(_clip_visual_state(rng, prefix='net.clip_pretrained.visual.'))
    return sd


def test_lseg_demo_e200_schema(tmp_path, monkeypatch):
    rng = np.random.default_rng(5)
    ckpt = {
        'state_dict': _demo_e200_state(rng),
        'epoch': 200, 'global_step': 0,
        'pytorch-lightning_version': '1.3.5',
        'optimizer_states': [], 'lr_schedulers': [],
    }
    path = tmp_path / 'demo_e200.ckpt'
    torch.save(ckpt, str(path))
    monkeypatch.setenv('AUTOLABEL_LSEG_WEIGHTS', str(path))

    from autolabel_tpu.features import lseg_jax
    enc = lseg_jax.from_env()
    assert enc is not None
    cfg = enc.config
    assert (cfg.vit.width, cfg.vit.depth, cfg.vit.patch_size,
            cfg.vit.heads) == (1024, 24, 16, 16)
    assert cfg.hooks == (5, 11, 17, 23)
    assert cfg.neck_dims == (256, 512, 1024, 1024)
    assert cfg.features == 256 and cfg.out_dim == 512

    from autolabel_tpu.features.lseg import LSegFE
    fe = LSegFE(allow_fallback=False)
    assert fe._jax_image is not None
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    out = np.asarray(fe(x))
    assert out.shape == (1, 32, 32, 512)
    assert np.isfinite(out).all()
    norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    assert (norms > 0.05).all() and (norms < 1.0 + 1e-3).all()
